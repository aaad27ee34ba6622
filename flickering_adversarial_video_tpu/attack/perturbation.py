"""Perturbation algebra — pure functions over the learnable delta.

Re-implements, TPU-first, the semantics of the reference's two perturbation
worlds (parity targets cited by reference file:line):

* TF / I3D world (utils/kinetics_i3d_utils.py:100-142): inputs live in [-1, 1],
  delta is a variable of shape [T, 1, 1, 3] (flickering) or [T, H, W, 3]
  (L1,2 sparse), value-clipped to +-0.4 (flickering only), masked by a frame
  window, optionally cyclically rolled (input on its time axis, delta on its
  own), added with a scalar `adv_flag` gate, and the sum clipped back to
  [-1, 1].

* Torch / video-ResNet world (utils_cv/action_recognition/model.py:58-129):
  inputs are mean/std-normalized pixels; delta is defined in [0, 1] pixel
  space, clamped to +-max_norm (the escalating "dynamic_max_norm"), divided by
  the per-channel std, optionally rolled on time, added, and clamped to the
  scalar [min_value, max_value] range derived from the dataset mean/std.

Everything here is a pure jittable function: state (delta) in, state out, PRNG
keys explicit.  The "placeholder_with_default" runtime flags of the reference
(adv_flag, cyclic_flag, cyclic_pert_flag) become scalar traced arguments, so a
single compiled step serves all flag settings.

Layout: video tensors are NDHWC ([B, T, H, W, C]) throughout — channels-last
keeps the C dimension on TPU lanes and lets XLA tile conv3d onto the MXU.
delta is [T, 1, 1, C] so `clean + delta` broadcasts over B, H, W for free.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FlickerSpec:
    """Flickering delta in the [-1, 1] input world (kinetics_i3d_utils.py:100-105).

    delta shape: [frames, 1, 1, channels]; value-clip at +-clip_eps.
    """

    frames: int
    channels: int = 3
    clip_eps: float = 0.4
    input_min: float = -1.0
    input_max: float = 1.0
    init_scale: float = 0.0  # reference initializes to zeros

    @property
    def shape(self) -> Tuple[int, ...]:
        return (self.frames, 1, 1, self.channels)


@dataclasses.dataclass(frozen=True)
class SparseSpec:
    """Full [T, H, W, C] delta for the L1,2 sparse attack
    (kinetics_i3d_utils.py:333-338: init 1e-8, no value clip)."""

    frames: int
    height: int = 224
    width: int = 224
    channels: int = 3
    input_min: float = -1.0
    input_max: float = 1.0
    init_scale: float = 1e-8

    @property
    def shape(self) -> Tuple[int, ...]:
        return (self.frames, self.height, self.width, self.channels)

    clip_eps: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class TorchStyleFlickerSpec:
    """Flickering delta in the mean/std-normalized world (model.py:58-101).

    delta shape [T, 1, 1, C] (the reference keeps [C, T, 1, 1]; same content,
    NDHWC layout here), defined in [0, 1] pixel units, clamped to +-max_norm.
    `sparse=True` gives the [T, H, W, C] variant used for the L1,2 attack.
    """

    frames: int
    channels: int = 3
    height: int = 1
    width: int = 1
    max_norm: float = 1.0
    # Kinetics defaults (utils_cv/action_recognition/dataset.py:28-29)
    mean: Tuple[float, ...] = (0.43216, 0.394666, 0.37645)
    std: Tuple[float, ...] = (0.22803, 0.22145, 0.216989)
    init_scale: float = 1e-6  # reference: U(-1e-6, 1e-6) (model.py:71)

    @property
    def shape(self) -> Tuple[int, ...]:
        return (self.frames, self.height, self.width, self.channels)

    @property
    def clamp_range(self) -> Tuple[float, float]:
        """Scalar clamp bounds of the adversarial input in normalized space.

        Mirrors model.py:72-75 exactly, including its scalar (not per-channel)
        reduction: max_value = min_c (1-mean_c)/std_c, min_value =
        max_c (0-mean_c)/std_c.
        """
        import numpy as np

        mean = np.asarray(self.mean)
        std = np.asarray(self.std)
        max_value = np.min((1.0 - mean) / std)
        min_value = np.max((0.0 - mean) / std)
        return float(min_value), float(max_value)


def init_delta(spec, key: Optional[jax.Array] = None, dtype=jnp.float32) -> jax.Array:
    """Initial delta for a spec.

    FlickerSpec -> zeros (kinetics_i3d_utils.py:100); SparseSpec -> constant
    1e-8 (:333); TorchStyleFlickerSpec -> U(-init_scale, init_scale)
    (model.py:71, needs a key).
    """
    if isinstance(spec, TorchStyleFlickerSpec):
        if key is None:
            key = jax.random.key(0)  # deterministic default U(-1e-6,1e-6)
        u = jax.random.uniform(key, spec.shape, dtype=dtype, minval=-1.0, maxval=1.0)
        return u * spec.init_scale
    if isinstance(spec, SparseSpec):
        return jnp.full(spec.shape, spec.init_scale, dtype=dtype)
    return jnp.zeros(spec.shape, dtype=dtype)


def clip_delta(spec, delta: jax.Array) -> jax.Array:
    """Value-clip of delta before application.

    TF flickering clips to +-0.4 (kinetics_i3d_utils.py:104-105); the L1,2
    variant does not clip (:336); torch-style clamps to +-max_norm, where
    max_norm is runtime state (dynamic escalation), so it is passed separately
    via `apply_perturbation_torch_style`.
    """
    if getattr(spec, "clip_eps", None) is None:
        return delta
    return jnp.clip(delta, -spec.clip_eps, spec.clip_eps)


def frame_mask(
    num_frames: int,
    start: int = 0,
    end: Optional[int] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """[T, 1, 1, 1] indicator of the attacked frame window.

    Mirrors the one-hot-sum construction of kinetics_i3d_utils.py:107-113
    (inclusive of `end`, values may exceed 1.0 only at endpoint overlap in the
    reference; here a clean 0/1 window over [start, min(end, T-1)]).
    """
    if end is None:
        end = num_frames
    t = jnp.arange(num_frames)
    ind = ((t >= start) & (t <= end)).astype(dtype)
    return ind.reshape(num_frames, 1, 1, 1)


def _roll_time(x: jax.Array, shift: jax.Array, axis: int) -> jax.Array:
    return jnp.roll(x, shift, axis=axis)


def apply_perturbation(
    clean: jax.Array,
    delta: jax.Array,
    spec,
    *,
    adv_flag: jax.Array | float = 1.0,
    cyclic_flag: jax.Array | float = 0.0,
    cyclic_pert_flag: jax.Array | float = 0.0,
    mask: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Build the adversarial input in the [-1, 1] world.

    adv = clip(clean_maybe_rolled + adv_flag * maybe_rolled(mask * clip(delta)),
               input_min, input_max)

    Parity with kinetics_i3d_utils.py:115-142: fresh uniform shifts per call
    (explicit `key` here instead of graph-level tf.random_uniform), scalar
    flags blend rolled/unrolled variants exactly as the reference's
    `cyclic_flag*rolled + (1-cyclic_flag)*plain` arithmetic does, so the flags
    may be traced scalars and need not be Python bools.

    Args:
      clean: [B, T, H, W, C] in [input_min, input_max].
      delta: [T, 1, 1, C] or [T, H, W, C] raw (unclipped) perturbation.
      key: PRNG key; required semantically when a cyclic flag can be nonzero.
    """
    delta = clip_delta(spec, delta).astype(clean.dtype)
    num_frames = clean.shape[1]

    if mask is not None:
        delta = delta * mask.astype(clean.dtype)

    if key is not None:
        k1, k2 = jax.random.split(key)
        shift_in = jax.random.randint(k1, (), 0, num_frames)
        shift_pert = jax.random.randint(k2, (), 0, delta.shape[0])
        clean_rolled = _roll_time(clean, shift_in, axis=1)
        delta_rolled = _roll_time(delta, shift_pert, axis=0)
        cyclic_flag = jnp.asarray(cyclic_flag, clean.dtype)
        cyclic_pert_flag = jnp.asarray(cyclic_pert_flag, clean.dtype)
        clean = cyclic_flag * clean_rolled + (1.0 - cyclic_flag) * clean
        delta = cyclic_pert_flag * delta_rolled + (1.0 - cyclic_pert_flag) * delta

    adv_flag = jnp.asarray(adv_flag, clean.dtype)
    adv = clean + adv_flag * delta[None]  # broadcast over batch
    return jnp.clip(adv, spec.input_min, spec.input_max)


def apply_perturbation_torch_style(
    clean_normalized: jax.Array,
    delta: jax.Array,
    spec: TorchStyleFlickerSpec,
    *,
    adv_flag: jax.Array | float = 1.0,
    max_norm: jax.Array | float | None = None,
    cyclic_pert_flag: jax.Array | float = 0.0,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Build the adversarial input in the mean/std-normalized world.

    Mirrors Perturbation.forward (model.py:80-101): clamp delta to
    +-max_norm in [0,1] pixel units, divide by the per-channel std (the
    reference's F.normalize(mean=0, std=STD)), optional cyclic roll on time,
    add to the normalized clean input, clamp to the scalar
    [min_value, max_value] range.

    `max_norm` defaults to spec.max_norm but is a runtime scalar to support
    the reference's escalating dynamic_max_norm (*=1.3 after 3000 stuck steps,
    model.py:1061-1066) without recompiling.
    """
    if max_norm is None:
        max_norm = spec.max_norm
    max_norm = jnp.asarray(max_norm, clean_normalized.dtype)
    delta = jnp.clip(delta.astype(clean_normalized.dtype), -max_norm, max_norm)
    std = jnp.asarray(spec.std, clean_normalized.dtype).reshape(1, 1, 1, -1)
    delta = delta / std

    if key is not None:
        shift = jax.random.randint(key, (), 0, delta.shape[0])
        rolled = _roll_time(delta, shift, axis=0)
        cyclic_pert_flag = jnp.asarray(cyclic_pert_flag, clean_normalized.dtype)
        delta = cyclic_pert_flag * rolled + (1.0 - cyclic_pert_flag) * delta

    adv_flag = jnp.asarray(adv_flag, clean_normalized.dtype)
    adv = clean_normalized + adv_flag * delta[None]
    lo, hi = spec.clamp_range
    return jnp.clip(adv, lo, hi)
