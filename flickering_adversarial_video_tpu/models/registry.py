"""Victim-model registry.

Maps the reference's model-selection strings — 'i3d' for the TF stack, the
torchvision names 'r3d_18' / 'mc3_18' / 'r2plus1d_18' for the torch stack
(utils_cv/action_recognition/model.py:47-56,402-441) — to Flax module
factories plus their input-normalization world.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax.numpy as jnp

from .i3d import InceptionI3D
from .video_resnet import VideoResNet

# Kinetics statistics of the torch world (dataset.py:28-29).
KINETICS_MEAN = (0.43216, 0.394666, 0.37645)
KINETICS_STD = (0.22803, 0.22145, 0.216989)


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """name -> factory + canonical input geometry + normalization world."""

    factory: Callable[..., Any]
    # 'tanh' = [-1, 1] via x/128-1 (I3D); 'meanstd' = (x-mean)/std (torch).
    norm_world: str
    default_frames: int
    default_size: int
    num_classes: int = 400


def _i3d_factory(num_classes=400, compute_dtype=jnp.float32):
    return InceptionI3D(num_classes=num_classes, compute_dtype=compute_dtype)


def _vr_factory(variant):
    def make(num_classes=400, compute_dtype=jnp.float32):
        return VideoResNet(variant, num_classes, compute_dtype)

    return make


MODEL_REGISTRY: Dict[str, ModelSpec] = {
    # I3D: 90-frame 224x224 clips (kinetics_i3d_utils.py:9-12)
    "i3d": ModelSpec(_i3d_factory, "tanh", 90, 224),
    # torch models: 16-frame 112x112 clips (r2plus1d_main_universal_attack.py:112-141);
    # r2plus1d_34 (torch.hub ig65m/kinetics, model.py:46-52) uses 32 frames
    "r3d_18": ModelSpec(_vr_factory("r3d_18"), "meanstd", 16, 112),
    "mc3_18": ModelSpec(_vr_factory("mc3_18"), "meanstd", 16, 112),
    "r2plus1d_18": ModelSpec(_vr_factory("r2plus1d_18"), "meanstd", 16, 112),
    "r2plus1d_34": ModelSpec(_vr_factory("r2plus1d_34"), "meanstd", 32, 112),
}


def create_model(
    name: str, num_classes: int | None = None, compute_dtype=jnp.float32
) -> Tuple[Any, ModelSpec]:
    spec = MODEL_REGISTRY[name]
    model = spec.factory(
        num_classes=num_classes or spec.num_classes, compute_dtype=compute_dtype
    )
    return model, spec
