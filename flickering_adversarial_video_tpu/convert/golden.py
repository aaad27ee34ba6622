"""Recorded-logits golden fixtures for real victim weights.

The framework's core parity claim — fooling rates matching the reference
within 1% — needs the *real* DeepMind I3D / torchvision checkpoints
(kinetics_i3d_utils.py:41-62 restore path; model.py:418-432 torchvision
load), which this environment cannot download.  This module makes the first
egress-capable run permanently useful: `--dump-golden` records the logits of
a canonical deterministic clip into a small .npz, and the test suite
(tests/test_real_weight_golden.py) recomputes and compares them on every run
thereafter — so any numerical drift in the model or converter against real
weights is caught forever after one conversion.

The canonical clip is generated with numpy's PCG64 stream (stable across
numpy versions by specification, unlike jax.random across JAX versions) and
quantized through the same uint8 path the data pipeline uses
(pre_process_rgb_flow.py:231-235 x/128-1; dataset.py NormalizeVideo), so the
fixture also covers the normalization worlds.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

GOLDEN_SEED = 20260816
# Golden geometry: smaller T than the canonical clips (90 / 16) keeps the
# CPU recompute in the test suite cheap; every layer still executes.
GOLDEN_GEOMETRY = {"tanh": (32, 224), "meanstd": (16, 112)}


def canonical_clip(norm_world: str, frames: int, size: int) -> np.ndarray:
    """Deterministic normalized f32 clip [1, T, S, S, 3] for a norm world."""
    rng = np.random.default_rng(GOLDEN_SEED)
    u8 = rng.integers(0, 256, (1, frames, size, size, 3), dtype=np.uint8)
    if norm_world == "tanh":
        return u8.astype(np.float32) / 128.0 - 1.0
    from ..models.registry import KINETICS_MEAN, KINETICS_STD

    x = u8.astype(np.float32) / 255.0
    mean = np.asarray(KINETICS_MEAN, np.float32)
    std = np.asarray(KINETICS_STD, np.float32)
    return (x - mean) / std


def _top5(logits_1d: np.ndarray) -> np.ndarray:
    """Top-5 indices by descending logit, ties broken by ascending class id.

    A stable sort on the negated values makes the order deterministic under
    exactly-equal logits, so the recorded and recomputed top-5 cannot swap
    between XLA versions when two classes tie (plain argsort[::-1] reverses
    the tie order)."""
    return np.argsort(-logits_1d, kind="stable")[:5].astype(np.int32)


def compute_logits(
    model_name: str, variables: Dict[str, Any], num_classes: Optional[int] = None
) -> np.ndarray:
    """Forward the canonical clip through the f32 model -> logits [1, K]."""
    import jax
    import jax.numpy as jnp

    from ..models.registry import create_model

    model, spec = create_model(model_name, num_classes=num_classes, compute_dtype=jnp.float32)
    frames, size = GOLDEN_GEOMETRY[spec.norm_world]
    clip = canonical_clip(spec.norm_world, frames, size)
    if model_name == "i3d":
        logits = jax.jit(lambda v, x: model.apply(v, x)[0])(variables, clip)
    else:
        logits = jax.jit(model.apply)(variables, clip)
    return np.asarray(logits, np.float32)


def dump_golden(
    model_name: str,
    variables: Dict[str, Any],
    out_path: str,
    weights_file: str,
    num_classes: Optional[int] = None,
) -> Dict[str, Any]:
    """Record the canonical-clip logits for `variables` into `out_path`."""
    from ..models.registry import MODEL_REGISTRY

    spec = MODEL_REGISTRY[model_name]
    frames, size = GOLDEN_GEOMETRY[spec.norm_world]
    logits = compute_logits(model_name, variables, num_classes=num_classes)
    top5 = _top5(logits[0])
    payload = dict(
        model=model_name,
        num_classes=np.int32(logits.shape[-1]),
        frames=np.int32(frames),
        size=np.int32(size),
        seed=np.int64(GOLDEN_SEED),
        norm_world=spec.norm_world,
        logits=logits,
        top5=top5,
        weights_file=os.path.basename(weights_file),
    )
    np.savez_compressed(out_path, **payload)
    return payload


def verify_golden(
    npz_path: str, weights_path: Optional[str] = None, atol: float = 5e-3
) -> Dict[str, Any]:
    """Recompute the golden logits and compare.

    weights_path defaults to the recorded weights_file next to the npz.
    Returns a report dict; raises AssertionError on mismatch (top-5 class
    order must match exactly; logits within atol — f32 conv reassociation
    drift across XLA versions stays ~1e-4).
    """
    from .cli import load_variables

    z = np.load(npz_path, allow_pickle=False)
    model_name = str(z["model"])
    if weights_path is None:
        weights_path = os.path.join(os.path.dirname(npz_path), str(z["weights_file"]))
    if not os.path.exists(weights_path):
        raise FileNotFoundError(weights_path)
    variables = load_variables(weights_path)
    logits = compute_logits(model_name, variables, num_classes=int(z["num_classes"]))
    ref = z["logits"]
    top5 = _top5(logits[0])
    max_abs = float(np.max(np.abs(logits - ref)))
    report = {
        "model": model_name,
        "max_abs_diff": max_abs,
        "top5_recorded": z["top5"].tolist(),
        "top5_recomputed": top5.tolist(),
    }
    assert top5.tolist() == z["top5"].tolist(), report
    assert max_abs < atol, report
    return report
