"""Fused uint8-normalize + flickering-delta apply in *packed* stem space.

Why this exists (xplane evidence, PERF.md round 2): with the space-to-depth
stem (models/i3d.py PackedStemUnit3D), XLA places the pack transpose AFTER
the f32 normalize — a 1.5 GB f32 relayout of the whole video at ~70 GiB/s
(copy.150/151, ~16 ms/step), and the backward unpacks the input gradient
through the mirror transposes (copy.131/132, ~9 ms/step) only to reduce it
to the tiny [T,1,1,3] delta gradient.

This module removes every one of those copies:

  * forward: the space-to-depth transpose runs on the raw UINT8 video (4x
    less traffic than f32), and the normalize (x/128-1, the
    parse_example_uint8 semantics, pre_process_rgb_flow.py:231-235), the
    delta add (kinetics_i3d_utils.py:139-142) and the [-1,1] clip happen
    elementwise in packed layout — XLA fuses them into the stem conv's
    input, so no extra full-size materialization at all.
  * backward: the delta cotangent is computed IN PACKED SPACE — the clip
    mask is recomputed from the packed uint8 residual, the spatial/batch
    reduction happens on the packed layout, and only the final [T/2,2,2,2,3]
    -> [T,1,1,3] fold (a few hundred elements) touches unpacked indexing.
    The [B,T,H,W,3] input-gradient tensor of the naive path never exists.

Exactness: the math is identical to apply_perturbation() on the unpacked
video (clip->mask->add->clip in f32; the gradient is obtained with jax.vjp
over the same jnp ops, so even the clip tie-handling matches) — packing is a
permutation, so results agree up to f32 reduction reassociation.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .space_to_depth import pack_input


def pack_flicker_delta(delta: jax.Array) -> jax.Array:
    """[T, 1, 1, C] -> [T/2, 1, 1, 8C] in (parity_t, parity_h, parity_w, C)
    channel order — matching pack_input(x, axes=(1,2,3)).  The delta has no
    spatial structure, so the h/w parities are pure broadcast."""
    t, _, _, c = delta.shape
    d = delta.reshape(t // 2, 2, 1, 1, c)  # (tt, pt, ., ., c)
    d = jnp.broadcast_to(d[:, :, None, None], (t // 2, 2, 2, 2, 1, 1, c))
    return d.reshape(t // 2, 1, 1, 8 * c)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def apply_flicker_packed(
    video_u8: jax.Array,
    delta_applied: jax.Array,
    adv_flag: jax.Array,
    input_min: float,
    input_max: float,
    out_dtype=jnp.float32,
) -> jax.Array:
    """adv_packed = clip(pack(u8)/128-1 + adv_flag*pack(delta), min, max).

    Args:
      video_u8: [B, T, H, W, C] uint8 with even T/H/W.
      delta_applied: [T, 1, 1, C] f32 — the already value-clipped (and
        frame-masked, if any) delta, i.e. everything upstream of the add in
        apply_perturbation().
      adv_flag: traced f32 scalar gate (placeholder_with_default parity).

    Returns [B, T/2, H/2, W/2, 8C] in out_dtype, ready for a prepacked stem
    (InceptionI3D(prepacked_stem_input=True)).
    """
    packed_u8 = _pack_u8(video_u8)
    return _packed_math(packed_u8, delta_applied, adv_flag, input_min, input_max, out_dtype)


def _pack_u8(video_u8):
    """Space-to-depth on the RAW uint8 bytes.  The optimization barrier pins
    the transpose in u8: without it XLA hoists the downstream u8->f32
    convert (and the fused /128-1) above the transpose and relays out the
    full video in f32 — the exact 16 ms/step copy pair this op exists to
    remove (measured, PERF.md round 2)."""
    return jax.lax.optimization_barrier(pack_input(video_u8, axes=(1, 2, 3)))


def _packed_math(packed_u8, delta_applied, adv_flag, input_min, input_max, out_dtype):
    x = packed_u8.astype(jnp.float32) / 128.0 - 1.0
    dpk = pack_flicker_delta(delta_applied)
    adv = x + jnp.asarray(adv_flag, jnp.float32) * dpk[None]
    return jnp.clip(adv, input_min, input_max).astype(out_dtype)


def _apply_fwd(video_u8, delta_applied, adv_flag, input_min, input_max, out_dtype):
    packed_u8 = _pack_u8(video_u8)
    out = _packed_math(packed_u8, delta_applied, adv_flag, input_min, input_max, out_dtype)
    return out, (packed_u8, delta_applied, adv_flag, video_u8.shape)


def _apply_bwd(input_min, input_max, out_dtype, res, g):
    packed_u8, delta_applied, adv_flag, video_shape = res
    # Differentiate the *packed-space* math — identical jnp ops as the
    # forward, so clip/tie gradient semantics match the unpacked reference
    # path exactly; the full-size cotangent lives only in packed layout and
    # fuses with the stem's transposed conv.
    _, vjp = jax.vjp(
        lambda d, a: _packed_math(packed_u8, d, a, input_min, input_max, out_dtype),
        delta_applied,
        jnp.asarray(adv_flag, jnp.float32),
    )
    d_delta, d_flag = vjp(g)
    d_video = np.zeros(video_shape, dtype=jax.dtypes.float0)  # uint8 input
    return d_video, d_delta, d_flag


apply_flicker_packed.defvjp(_apply_fwd, _apply_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def apply_flicker_prepacked(
    packed_u8: jax.Array,
    delta_applied: jax.Array,
    adv_flag: jax.Array,
    input_min: float,
    input_max: float,
    out_dtype=jnp.float32,
) -> jax.Array:
    """apply_flicker_packed for a HOST-prepacked uint8 video.

    The space-to-depth relayout measured 8.4 ms/step on-device even in uint8
    (sub-tile 6-byte atoms cap the copy at 29-41 GiB/s); the host pipeline
    emits the packed layout instead — free inside the native reader's
    per-record memcpy (native/tfrecord_reader.cc tfr_read_batch_packed) and
    overlapped with device compute by the existing prefetch.  This op is the
    device-side remainder: normalize + delta + clip, elementwise in packed
    space, custom VJP for d(delta).

    packed_u8: [B, T/2, H/2, W/2, 8C] uint8, channel order (pt, ph, pw, c)
    (= data/packing.pack_video_np / ops.space_to_depth.pack_input).
    """
    return _packed_math(packed_u8, delta_applied, adv_flag, input_min, input_max, out_dtype)


def _prepacked_fwd(packed_u8, delta_applied, adv_flag, input_min, input_max, out_dtype):
    out = _packed_math(packed_u8, delta_applied, adv_flag, input_min, input_max, out_dtype)
    return out, (packed_u8, delta_applied, adv_flag)


def _prepacked_bwd(input_min, input_max, out_dtype, res, g):
    packed_u8, delta_applied, adv_flag = res
    _, vjp = jax.vjp(
        lambda d, a: _packed_math(packed_u8, d, a, input_min, input_max, out_dtype),
        delta_applied,
        jnp.asarray(adv_flag, jnp.float32),
    )
    d_delta, d_flag = vjp(g)
    d_video = np.zeros(packed_u8.shape, dtype=jax.dtypes.float0)
    return d_video, d_delta, d_flag


apply_flicker_prepacked.defvjp(_prepacked_fwd, _prepacked_bwd)


def packable(video_shape: Tuple[int, ...]) -> bool:
    """True when [B,T,H,W,C] has the even extents space-to-depth needs."""
    return (
        len(video_shape) == 5
        and all(s % 2 == 0 for s in video_shape[1:4])
    )


# ---------------- fused preprocess + stem head (tanh world) ----------------


import dataclasses
from typing import Any, Callable


@dataclasses.dataclass
class StemHead:
    """Everything the engine needs to run flicker_stem_head: the packed stem
    kernel, the frozen BN stats/offset, and the skip_stem victim forward
    (models/i3d.build_stem_head constructs one from a variables dict)."""

    pk: jax.Array
    mean: jax.Array
    var: jax.Array
    bias: jax.Array
    apply_fn: Callable[[Any, jax.Array], jax.Array]
    out_dtype: Any = jnp.bfloat16  # the victim's compute dtype
    # T-major head (ops/stem_tmajor.flicker_stem_tmajor): apply_fn consumes
    # the [H,W,Cout,T',B] view (skip_stem_view model); the engine falls back
    # to the plain prepacked path when the trace-time geometry is ineligible
    tmajor: bool = False


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def flicker_stem_head(
    packed_u8: jax.Array,
    delta_applied: jax.Array,
    adv_flag: jax.Array,
    pk: jax.Array,
    bn_mean: jax.Array,
    bn_var: jax.Array,
    bn_bias: jax.Array,
    input_min: float,
    input_max: float,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """normalize+delta+clip AND the packed stem conv+BN+relu as ONE
    custom-VJP op: the packed-space input gradient is never materialized.

    Without this, the VJP boundary between apply_flicker_prepacked and the
    stem materializes d(adv_packed) [B,T',H',W',8C] and XLA relayouts it
    W-minor before the mask-reduce (xplane round 3: copy.85 1.7 ms +
    pad_slice/shift-add fusions ~2 ms on the T=64 B=8 step).  Here the
    backward contracts the stem's per-tap partials (catbwd_partials)
    DIRECTLY against temporal shifts of the (recomputed, fusible) clipped
    adv tensor via jax.grad of the contraction — one pass over the partials,
    clip-gradient semantics identical to jnp.clip's own VJP.  d(delta)
    tap-sum association differs from the separate-op path at bf16 rounding
    level only.  pk/BN cotangents are ZERO (frozen victim)."""
    from .space_to_depth import _stem_bn_relu_math

    adv = _packed_math(
        packed_u8, delta_applied, adv_flag, input_min, input_max, out_dtype
    )
    return _stem_bn_relu_math(adv, pk, bn_mean, bn_var, bn_bias, 1e-3)


def _head_fwd(
    packed_u8, delta_applied, adv_flag, pk, bn_mean, bn_var, bn_bias,
    input_min, input_max, out_dtype,
):
    from .space_to_depth import _stem_bn_relu_math

    adv = _packed_math(
        packed_u8, delta_applied, adv_flag, input_min, input_max, out_dtype
    )
    y = _stem_bn_relu_math(adv, pk, bn_mean, bn_var, bn_bias, 1e-3)
    return y, (packed_u8, delta_applied, adv_flag, pk, bn_var, y)


def _head_bwd(input_min, input_max, out_dtype, res, g):
    from .space_to_depth import catbwd_partials

    packed_u8, delta_applied, adv_flag, pk, bn_var, y = res
    cin = pk.shape[-2]
    tt = y.shape[1]
    g = g.astype(pk.dtype)
    vdt = bn_var.astype(pk.dtype)
    g2 = g * (y > 0) * jax.lax.rsqrt(vdt + jnp.asarray(1e-3, pk.dtype))
    part = catbwd_partials(g2, pk)  # [B,T',H',W',4*Cin]

    def contracted(delta, flag):
        adv = _packed_math(packed_u8, delta, flag, input_min, input_max, out_dtype)
        s = jnp.float32(0.0)
        # dx[v] = sum_m part[v+1-m, tap m]  <=>  sum_u part[u, m]*adv[u+m-1]
        for m in range(4):
            blk = jax.lax.slice_in_dim(part, m * cin, (m + 1) * cin, axis=4)
            off = m - 1
            if off < 0:
                a = jax.lax.slice_in_dim(adv, 0, tt - 1, axis=1)
                p = jax.lax.slice_in_dim(blk, 1, tt, axis=1)
            elif off == 0:
                a, p = adv, blk
            else:
                a = jax.lax.slice_in_dim(adv, off, tt, axis=1)
                p = jax.lax.slice_in_dim(blk, 0, tt - off, axis=1)
            s = s + jnp.sum((a * p).astype(jnp.float32))
        return s

    d_delta, d_flag = jax.grad(contracted, argnums=(0, 1))(
        delta_applied, jnp.asarray(adv_flag, jnp.float32)
    )
    return (
        np.zeros(packed_u8.shape, dtype=jax.dtypes.float0),
        d_delta,
        d_flag,
        jnp.zeros_like(pk),
        jnp.zeros_like(bn_var),  # mean (same [Cout] shape/dtype as var)
        jnp.zeros_like(bn_var),
        jnp.zeros_like(bn_var),  # bias
    )


flicker_stem_head.defvjp(_head_fwd, _head_bwd)


# ---------------- torch world (mean/std, spatial-only pack) ----------------
#
# The video-ResNet stems pack H,W only (stride (1,2,2) convs; T untouched),
# so the packed channel order is (parity_h, parity_w, c) and the per-channel
# mean/std/delta patterns tile by 4.  Same rationale as the tanh world: the
# backward otherwise runs a C_out=12 transposed conv in f32 plus an unpack
# (measured 2.2 ms at 6 TF/s in the r2plus1d step, PERF.md round 2); in
# packed space the delta cotangent reduces without ever unpacking.


def packable_spatial(video_shape: Tuple[int, ...], factor: int = 2) -> bool:
    """[B,T,H,W,C] with factor-divisible H/W (spatial-only pack)."""
    return (
        len(video_shape) == 5
        and video_shape[2] % factor == 0
        and video_shape[3] % factor == 0
    )


def torch_pack_factor(video_shape, apply_packed_fn) -> int:
    """The spatial pack factor for the torch world: FLICKER_TORCH_DEEPSTEM=1
    selects 4 (16x channels) when the victim's packed forward supports the
    deep stem (r2plus1d stems — the fn advertises it) and H/W divide by 4.

    Default OFF: the chip A/B (2026-08-20, r2plus1d_18 T=16 B=16) measured
    the deep pack NEUTRAL at best.  It does fix the targeted pathology —
    the d(x_packed) dgrad + d(delta) reduce chain went 2.6 ms @ 5.2 TF/s
    -> 0.7 ms @ 42 TF/s (48 output lanes instead of 12) — but the stem-exit
    depth-to-space (dual forwards + its transpose in the backward, ~2 ms)
    buys it all back: 23.59 (classic) vs 23.55 (deep, block-diag conv_t)
    vs 22.62 (deep, unpack after conv_s).  The 12-lane chain is priced by
    MXU fill; every exact reformulation (batch-grouped weight-grad view,
    mask-split linearity) keeps the same 12x45 output tile, so the classic
    pack stays the default and the deep path is kept as measured, tested
    infrastructure."""
    import os

    deep_ok = getattr(apply_packed_fn, "deep_stem", False)
    if (
        deep_ok
        and os.environ.get("FLICKER_TORCH_DEEPSTEM", "0") == "1"
        and packable_spatial(video_shape, 4)
    ):
        return 4
    return 2


def _pack_u8_spatial(video_u8, factor: int = 2):
    if factor == 2:
        return jax.lax.optimization_barrier(pack_input(video_u8, axes=(2, 3)))
    from .space_to_depth import pack_input_factors

    return jax.lax.optimization_barrier(
        pack_input_factors(video_u8, (1, factor, factor))
    )


def _tile4(v, factor: int = 2):
    """Per-channel vector [C] -> packed-channel vector [f*f*C]
    ((parity_h, parity_w, c) order)."""
    return jnp.tile(jnp.asarray(v, jnp.float32), factor * factor)


def _torch_packed_math(
    packed_u8, delta, adv_flag, max_norm, mean, std, clamp_lo, clamp_hi,
    out_dtype, factor=2,
):
    """Packed-space apply_perturbation_torch_style (model.py:80-101)."""
    c = len(mean)
    x = packed_u8.astype(jnp.float32) / 255.0
    x = (x - _tile4(mean, factor)) / _tile4(std, factor)
    max_norm = jnp.asarray(max_norm, jnp.float32)
    d = jnp.clip(delta, -max_norm, max_norm) / jnp.asarray(std, jnp.float32)
    t = delta.shape[0]
    dpk = jnp.tile(d.reshape(t, 1, 1, c), (1, 1, 1, factor * factor))
    adv = x + jnp.asarray(adv_flag, jnp.float32) * dpk[None]
    return jnp.clip(adv, clamp_lo, clamp_hi).astype(out_dtype)


def torch_packed_clean(
    video_u8: jax.Array,
    mean: Tuple[float, ...],
    std: Tuple[float, ...],
    out_dtype=jnp.float32,
    factor: int = 2,
) -> jax.Array:
    """Packed clean forward input: normalize only, NO clamp — the reference's
    Perturbation.forward returns x untouched when adversarial=False
    (model.py:82-83)."""
    packed_u8 = _pack_u8_spatial(video_u8, factor)
    x = packed_u8.astype(jnp.float32) / 255.0
    x = (x - _tile4(mean, factor)) / _tile4(std, factor)
    return x.astype(out_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def apply_torch_flicker_packed(
    video_u8: jax.Array,
    delta: jax.Array,
    adv_flag: jax.Array,
    max_norm: jax.Array,
    mean: Tuple[float, ...],
    std: Tuple[float, ...],
    clamp_lo: float,
    clamp_hi: float,
    out_dtype=jnp.float32,
    factor: int = 2,
) -> jax.Array:
    """Fused uint8 mean/std-normalize + torch-style flicker apply, spatially
    packed: [B,T,H,W,C] u8 -> [B,T,H/f,W/f,f*f*C] for a prepacked-stem
    video-ResNet (f=2 classic, f=4 deep stem).  delta is the RAW [T,1,1,C]
    perturbation (the max_norm clamp and /std happen inside, as
    Perturbation.forward does)."""
    packed_u8 = _pack_u8_spatial(video_u8, factor)
    return _torch_packed_math(
        packed_u8, delta, adv_flag, max_norm, mean, std, clamp_lo, clamp_hi,
        out_dtype, factor,
    )


def _torch_fwd(
    video_u8, delta, adv_flag, max_norm, mean, std, lo, hi, out_dtype, factor=2
):
    packed_u8 = _pack_u8_spatial(video_u8, factor)
    out = _torch_packed_math(
        packed_u8, delta, adv_flag, max_norm, mean, std, lo, hi, out_dtype, factor
    )
    return out, (packed_u8, delta, adv_flag, max_norm, video_u8.shape)


def _torch_bwd(mean, std, lo, hi, out_dtype, factor, res, g):
    packed_u8, delta, adv_flag, max_norm, video_shape = res
    _, vjp = jax.vjp(
        lambda d, a, m: _torch_packed_math(
            packed_u8, d, a, m, mean, std, lo, hi, out_dtype, factor
        ),
        delta,
        jnp.asarray(adv_flag, jnp.float32),
        jnp.asarray(max_norm, jnp.float32),
    )
    d_delta, d_flag, d_norm = vjp(g)
    d_video = np.zeros(video_shape, dtype=jax.dtypes.float0)
    return d_video, d_delta, d_flag, d_norm


apply_torch_flicker_packed.defvjp(_torch_fwd, _torch_bwd)
