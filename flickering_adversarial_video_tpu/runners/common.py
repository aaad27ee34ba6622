"""Shared runner plumbing: victim construction + engine wiring from config."""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..attack import FlickerSpec, SparseSpec, TorchStyleFlickerSpec
from ..engine import AttackConfig, AttackEngine
from ..models import create_model
from ..models.i3d import init_i3d_params
from ..parallel import make_mesh
from ..utils.labels import load_label_map

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}


def apply_platform_env() -> None:
    """Honor FLICKER_PLATFORM=cpu|tpu|axon for CLI entry points.

    Plain JAX_PLATFORMS is unreliable in TPU-pinned environments (a
    sitecustomize can re-pin the platform after env inspection — see
    tests/conftest.py); jax.config.update before backend init is the
    authoritative switch.  Used by the rehearsal mode of
    scripts/real_weight_parity.sh to force the whole chain onto CPU."""
    plat = os.environ.get("FLICKER_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception as e:  # backend already initialized: warn, don't die
            print(f"[warn] FLICKER_PLATFORM={plat} not applied: {e}")


def enable_compilation_cache(repo_root: Optional[str] = None) -> None:
    apply_platform_env()
    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    jax.config.update("jax_compilation_cache_dir", os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_victim(
    model_name: str,
    ckpt_path: Optional[str],
    compute_dtype,
    frames: int,
    size: int,
    num_classes: Optional[int] = None,
    eval_type: str = "rgb",
):
    """(apply_fn, variables).  For I3D, `ckpt_path` is a DeepMind TF
    checkpoint (converted on load, convert/tf_i3d.py); for the torch models a
    torchvision state_dict .pt/.pth (convert/torch_video_resnet.py).  Missing
    checkpoints fall back to random init with a loud warning — the attack
    machinery is weight-agnostic.

    eval_type='rgb600' selects the Kinetics-600 I3D world: prefix-less
    checkpoint variable names (kinetics_i3d_utils.py:47-56) and a 600-way
    head (NUM_CLASSES=600 when load_i3d_model is built for rgb600)."""
    if num_classes is None:
        num_classes = 600 if eval_type == "rgb600" else None
    model, spec = create_model(
        model_name, num_classes=num_classes, compute_dtype=compute_dtype
    )
    num_classes = num_classes or spec.num_classes

    variables = None
    if ckpt_path:
        if str(ckpt_path).endswith(".msgpack") and os.path.exists(ckpt_path):
            from ..convert.cli import load_variables

            variables = load_variables(ckpt_path)
        elif model_name == "i3d":
            index = ckpt_path + ".index"
            if os.path.exists(index) or os.path.exists(ckpt_path):
                from ..convert import convert_i3d_checkpoint

                variables = convert_i3d_checkpoint(ckpt_path, eval_type=eval_type)
        else:
            if os.path.exists(ckpt_path):
                import torch

                from ..convert import convert_video_resnet_state_dict

                sd = torch.load(ckpt_path, map_location="cpu")
                if hasattr(sd, "state_dict"):
                    sd = sd.state_dict()
                variables = convert_video_resnet_state_dict(
                    {k: np.asarray(v) for k, v in sd.items()}, model_name
                )
    if variables is None:
        print(
            f"[warn] no checkpoint for {model_name} at {ckpt_path!r}; "
            "using random init (attack mechanics only, no meaningful victims)"
        )
        if model_name == "i3d":
            variables = init_i3d_params(
                jax.random.key(0), num_classes=num_classes, frames=frames, size=size
            )
        else:
            variables = model.init(
                jax.random.key(0), jnp.zeros((1, frames, size, size, 3))
            )

    if model_name == "i3d":
        apply_fn = lambda v, x: model.apply(v, x)[0]
    else:
        apply_fn = model.apply
    return apply_fn, variables


def infer_num_classes(variables, model_name: str, default: Optional[int] = None) -> int:
    """Head width actually present in `variables` (checkpoint truth), falling
    back to the registry default.  Flax Dense keeps the checkpoint kernel
    shape regardless of the configured `features`, so the kernel's last dim
    is the authoritative class count (ig65m r2plus1d_34 ships 359/487-way
    heads, utils_cv/action_recognition/model.py:402-421)."""
    from ..models.registry import MODEL_REGISTRY

    try:
        params = variables["params"]
        if model_name == "i3d":
            # models/i3d.py head module path (the bias is [num_classes])
            kernel = params["Logits/Conv3d_0c_1x1"]["conv_3d"]["kernel"]
        else:
            kernel = params["fc"]["kernel"]
        return int(kernel.shape[-1])
    except (KeyError, TypeError, AttributeError, IndexError):
        return default or MODEL_REGISTRY[model_name].num_classes


def make_victim_packed_fn(model_name, variables, num_classes, compute_dtype):
    """The packed-input forward for a victim, or None.

    Single gate for the engine's packed fast path (ops/packed_apply.py):
    keyed on the variables actually holding the expected tree so
    monkeypatched/fake victims in tests degrade to the generic path, and so
    every caller (build_engine, the torch runners, bench) wires the same
    num_classes/dtype as the generic forward."""
    if not isinstance(variables, dict):
        return None
    params = variables.get("params", {})
    if model_name == "i3d" and "Conv3d_1a_7x7" in params:
        from ..models.i3d import make_packed_apply_fn

        return make_packed_apply_fn(num_classes, compute_dtype)
    if (
        model_name in ("r3d_18", "mc3_18", "r2plus1d_18", "r2plus1d_34")
        and "stem" in params
    ):
        from ..models.video_resnet import make_packed_apply_fn as make_vr_packed

        return make_vr_packed(model_name, num_classes, compute_dtype)
    return None


def build_engine(
    attack_cfg,
    model_cfg,
    *,
    frames: Optional[int] = None,
    size: Optional[int] = None,
    use_mesh: bool = True,
    attack_kind: str = "flickering",
    track_probs: bool = True,
    batch_size: Optional[int] = None,
) -> Tuple[AttackEngine, Any]:
    """AttackEngine + label list from run_config.yml sections."""
    model_name = attack_cfg.get("MODEL_NAME", "i3d")
    from ..models.registry import MODEL_REGISTRY

    reg = MODEL_REGISTRY[model_name]
    frames = frames or reg.default_frames
    size = size or reg.default_size
    compute_dtype = _DTYPES[attack_cfg.get("COMPUTE_DTYPE", "bfloat16")]
    eval_type = model_cfg.get("EVAL_TYPE", "rgb")
    num_classes = model_cfg.get("NUM_CLASSES")
    if num_classes is None and eval_type == "rgb600":
        num_classes = 600

    apply_fn, variables = build_victim(
        model_name,
        model_cfg.get("CKPT_PATH"),
        compute_dtype,
        frames,
        size,
        num_classes=num_classes,
        eval_type=eval_type,
    )

    labels = load_label_map(
        model_cfg.get("LABEL_MAP_PATH"),
        num_classes=num_classes or reg.num_classes,
    )
    targeted = bool(attack_cfg.get("TARGETED_ATTACK", False))
    target_class = None
    if targeted:
        target_class = labels.index(attack_cfg.get("TARGETED_CLASS"))

    if reg.norm_world == "tanh":
        if attack_kind == "sparse":
            spec = SparseSpec(frames=frames, height=size, width=size)
        else:
            spec = FlickerSpec(frames=frames)
        reg_weighting = "tf"
    else:
        h = w = 1 if attack_kind != "sparse" else size
        spec = TorchStyleFlickerSpec(
            frames=frames,
            height=1 if attack_kind != "sparse" else size,
            width=1 if attack_kind != "sparse" else size,
            max_norm=float(attack_cfg.get("L_INF_NORM", 1.0)),
        )
        reg_weighting = "torch"

    frame_window = attack_cfg.get("ATTACK_FRAME_WINDOW")
    if frame_window is not None:
        frame_window = (int(frame_window[0]), int(frame_window[1]))
        # do NOT silently drop the window for torch-world victims — let the
        # engine's informative ValueError surface the misconfiguration

    cfg = AttackConfig(
        improve_loss=bool(attack_cfg.get("IMPROVE_ADV_LOSS", True)),
        margin=float(attack_cfg.get("PROB_MARGIN", 0.05)),
        targeted=targeted,
        use_logits=bool(attack_cfg.get("USE_LOGITS", False)),
        attack_kind=attack_kind,
        norm_world=reg.norm_world,
        reg_weighting=reg_weighting,
        learning_rate=float(attack_cfg.get("LEARNING_RATE", 1e-3)),
        target_class=target_class,
        enable_cyclic=bool(
            attack_cfg.get("CYCLIC_ATTACK", False)
            or attack_cfg.get("CYCLIC_PERTURBATION_ATTACK", False)
        ),
        use_pallas_fused=bool(attack_cfg.get("USE_PALLAS_FUSED", False)),
        frame_window=frame_window,
    )
    # mesh over the largest device count that divides the batch (the batch
    # axis is the only sharded axis; an indivisible batch degrades gracefully
    # to fewer devices, batch 1 to single-device)
    n_avail = len(jax.devices())
    bs = batch_size or int(attack_cfg.get("BATCH_SIZE", 1))
    n_dev = 1
    if use_mesh:
        for d in range(min(n_avail, bs), 0, -1):
            if bs % d == 0:
                n_dev = d
                break
    mesh = make_mesh(n_devices=n_dev) if n_dev > 1 else None

    # Packed-preprocess fast path (ops/packed_apply.py): an I3D forward that
    # takes space-to-depth packed input over the SAME variables.  Gated on
    # the variables actually holding an I3D tree so monkeypatched/fake
    # victims in tests degrade to the generic path.
    apply_packed_fn = make_victim_packed_fn(
        model_name, variables, num_classes or reg.num_classes, compute_dtype
    )

    # Fused preprocess+stem heads, host-prepacked tanh-world path only; same
    # gating as the packed fn plus the BN stats the head consumes.  Two
    # variants:
    #   * FLICKER_FUSED_HEAD=1 — the b-major head
    #     (ops/packed_apply.flicker_stem_head).  Measured NEUTRAL on the
    #     T=64 B=8 headline (11.82 vs 11.84 steps/s, round 3 — the gradient
    #     relayout the fusion removes reappears at the contraction's input),
    #     so opt-in; kept exact-parity tested for future XLA versions.
    #   * default (FLICKER_TMAJOR_HEAD != "0") — the T-major head
    #     (ops/stem_tmajor.flicker_stem_tmajor): preprocess + stem in the
    #     batch-in-lanes view, clip mask saved in the view, d(delta) reduced
    #     without materializing f32 d(adv).  The ENGINE gates eligibility at
    #     trace time (single-device + 128-aligned B*T' lanes) and falls back
    #     to the plain prepacked path otherwise, so building the head is
    #     always safe.
    stem_head = None
    head_ok = (
        model_name == "i3d"
        and apply_packed_fn is not None
        and isinstance(variables, dict)
        and "batch_stats" in variables
        and "Conv3d_1a_7x7" in variables.get("batch_stats", {})
    )
    if head_ok and os.environ.get("FLICKER_FUSED_HEAD", "") == "1":
        from ..models.i3d import build_stem_head

        stem_head = build_stem_head(
            variables, num_classes or reg.num_classes, compute_dtype
        )
    elif head_ok and os.environ.get("FLICKER_TMAJOR_HEAD", "") != "0":
        from ..models.i3d import build_stem_head

        stem_head = build_stem_head(
            variables, num_classes or reg.num_classes, compute_dtype, tmajor=True
        )

    engine = AttackEngine(
        apply_fn,
        variables,
        spec,
        cfg,
        mesh=mesh,
        track_probs=track_probs,
        apply_packed_fn=apply_packed_fn,
        stem_head=stem_head,
    )
    return engine, labels


def make_shard_batches(
    attack_cfg,
    engine,
    tfrecord_batches_fn,
    *,
    frames: int,
    size: Optional[int],
    batch_size: int,
):
    """(batches_fn, prepack): shared tfrecord-pipeline factory for the
    universal/class-gen runners.

    Host-prepacked input defaults on (PREPACK_INPUT) whenever the engine's
    packed path exists and the geometry is even — the native reader then
    emits the space-to-depth layout during its record copy
    (ops/packed_apply.py; PERF.md round 2).

    `tfrecord_batches_fn` is passed in (the runner's module-level symbol) so
    tests can monkeypatch it per runner."""
    size_eff = size or 224
    prepack = (
        bool(attack_cfg.get("PREPACK_INPUT", True))
        # host prepack emits the tanh-world 2x2x2 layout; the torch world's
        # packed path is spatial-only and packs ON DEVICE — feeding it
        # host-packed batches would crash the engine
        and engine.config.norm_world == "tanh"
        and engine._packed_supported()
        and frames % 2 == 0
        and size_eff % 2 == 0
    )
    if prepack and bool(attack_cfg.get("VIEW_PREPACK_INPUT", True)):
        # one better than the packed layout: the host also performs the
        # batch-in-lanes transpose (data/packing.pack_batch_view_np, SIMD
        # C++ tfr_batch_view) so the device-side T-major program starts in
        # its own layout — zero layout crossings on device.  Only when the
        # engine will definitely take the view (it has no b-major fallback).
        if engine.view_input_eligible(batch_size, frames):
            prepack = "view"
    if prepack:
        kind = "view [H',W',8C,T'B]" if prepack == "view" else "space-to-depth"
        print(f"input pipeline: host-prepacked {kind} uint8")

    def batches(shards):
        return tfrecord_batches_fn(
            shards, batch_size, frames=frames, height=size_eff,
            width=size_eff, prepack=prepack,
        )

    return batches, prepack
