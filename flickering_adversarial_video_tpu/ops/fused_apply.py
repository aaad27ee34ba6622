"""Pallas kernel: fused uint8-decode + normalize + flicker-apply + clip.

The adversarial-input construction of the tanh world —
    adv = clip(u8/128 - 1 + adv_flag * delta[t, c], -1, 1)
(kinetics_i3d_utils.py:139-142 + the parser's cast, pre_process_rgb_flow.py:
234) — is the one bandwidth-bound elementwise chain on the attack's hot path.
This kernel performs it in a single pass over HBM: the uint8 batch streams
through VMEM once (4x less HBM read than a pre-cast f32 batch), the [T, C]
delta table rides along in VMEM, and the f32 adversarial clip is written
once.  A custom VJP computes d(loss)/d(delta) — a masked (clip-interior)
per-(t, c) reduction of the upstream gradient — as a second Pallas kernel,
so the whole apply+backward needs no XLA-materialized broadcast of delta.

Layout: the video [B, T, H, W, C] is viewed as rows (B*T) x cols (H*W*C);
cols are padded to a multiple of 128 lanes by the caller-side reshape
contract H*W*C % 128 == 0 (true for 224x224x3 = 150,528 = 1176*128 and
112x112x3 = 37,632 = 294*128).  Within a row, channel = col % C.

Use `fused_normalize_perturb(video_u8, delta, adv_flag)`; it falls back to
the pure-jnp path on unsupported geometry, so callers never need to guard.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_LANES = 128
_ROW_BLOCK = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _jnp_reference(video_u8, delta, adv_flag):
    x = video_u8.astype(jnp.float32) / 128.0 - 1.0
    return jnp.clip(x + adv_flag * delta[None], -1.0, 1.0)


def _col_block(hwc: int) -> int:
    """Largest col block <= ~48K lanes-aligned that divides hwc*? — we just
    block the full row when small, else split into lane-multiples."""
    target = 384 * _LANES  # 49,152 cols -> (8 x 49,152) f32 = 1.5 MB in VMEM
    if hwc <= target:
        return hwc
    # find a divisor of hwc that is a multiple of 128 and <= target
    best = _LANES
    for mult in range(target // _LANES, 0, -1):
        cand = mult * _LANES
        if hwc % cand == 0:
            best = cand
            break
    return best


def _fwd_kernel(c_channels, t_frames, u8_ref, delta_ref, flag_ref, out_ref):
    rows, cols = u8_ref.shape
    row0 = pl.program_id(0) * rows
    col0 = pl.program_id(1) * cols
    # Mosaic has no direct uint8->f32 cast; hop through int32.
    x = u8_ref[...].astype(jnp.int32).astype(jnp.float32) * (1.0 / 128.0) - 1.0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) + col0
    chan = (col_ids % c_channels).astype(jnp.int32)
    adv = flag_ref[0]
    for i in range(rows):  # static small loop over the row block
        t = (row0 + i) % t_frames
        d = delta_ref[pl.ds(t, 1), :]  # [1, C]
        d_row = jnp.zeros((1, cols), jnp.float32)
        for c in range(c_channels):
            d_row = jnp.where(chan[i : i + 1] == c, d[0, c], d_row)
        out_ref[i : i + 1, :] = jnp.clip(x[i : i + 1, :] + adv * d_row, -1.0, 1.0)


def _bwd_kernel(c_channels, t_frames, u8_ref, delta_ref, flag_ref, g_ref, dd_ref):
    rows, cols = g_ref.shape
    row0 = pl.program_id(0) * rows
    col0 = pl.program_id(1) * cols

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dd_ref[...] = jnp.zeros_like(dd_ref)

    x = u8_ref[...].astype(jnp.int32).astype(jnp.float32) * (1.0 / 128.0) - 1.0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) + col0
    chan = (col_ids % c_channels).astype(jnp.int32)
    adv = flag_ref[0]
    updates = jnp.zeros((t_frames, c_channels), jnp.float32)
    for i in range(rows):
        t = (row0 + i) % t_frames
        d = delta_ref[pl.ds(t, 1), :]
        d_row = jnp.zeros((1, cols), jnp.float32)
        for c in range(c_channels):
            d_row = jnp.where(chan[i : i + 1] == c, d[0, c], d_row)
        pre = x[i : i + 1, :] + adv * d_row
        # clip pass-through mask matching jnp.clip's min/max gradient
        mask = jnp.logical_and(pre < 1.0, pre > -1.0)
        g_masked = jnp.where(mask, g_ref[i : i + 1, :], 0.0) * adv
        one_hot_t = (
            jax.lax.broadcasted_iota(jnp.int32, (t_frames, 1), 0) == t
        ).astype(jnp.float32)
        contrib = jnp.stack(
            [
                jnp.sum(jnp.where(chan[i : i + 1] == c, g_masked, 0.0))
                for c in range(c_channels)
            ]
        ).reshape(1, c_channels)
        updates = updates + one_hot_t * contrib
    dd_ref[...] += updates


def _supported(video_shape: Tuple[int, ...]) -> bool:
    if not _HAS_PALLAS:
        return False
    b, t, h, w, c = video_shape
    hwc = h * w * c
    return hwc % _LANES == 0 and (b * t) % _ROW_BLOCK == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_normalize_perturb(video_u8: jax.Array, delta: jax.Array, adv_flag: jax.Array):
    """clip(u8/128-1 + adv_flag*delta, -1, 1) over [B,T,H,W,C], delta [T,1,1,C]."""
    return _fused_fwd_impl(video_u8, delta, adv_flag)


def _pallas_call_fwd(video_u8, delta_tc, adv_flag):
    b, t, h, w, c = video_u8.shape
    hwc = h * w * c
    rows = b * t
    cb = _col_block(hwc)
    grid = (rows // _ROW_BLOCK, hwc // cb)
    u8_2d = video_u8.reshape(rows, hwc)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, c, t),
        out_shape=jax.ShapeDtypeStruct((rows, hwc), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROW_BLOCK, cb), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_BLOCK, cb), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(u8_2d, delta_tc, jnp.reshape(adv_flag.astype(jnp.float32), (1,)))
    return out.reshape(b, t, h, w, c)


def _fused_fwd_impl(video_u8, delta, adv_flag):
    adv_flag = jnp.asarray(adv_flag, jnp.float32)
    if video_u8.dtype != jnp.uint8 or not _supported(video_u8.shape):
        return _jnp_reference(video_u8, delta, adv_flag)
    t, _, _, c = delta.shape
    return _pallas_call_fwd(video_u8, delta.reshape(t, c).astype(jnp.float32), adv_flag)


def _fwd(video_u8, delta, adv_flag):
    out = _fused_fwd_impl(video_u8, delta, adv_flag)
    return out, (video_u8, delta, jnp.asarray(adv_flag, jnp.float32))


def _bwd(residuals, g):
    video_u8, delta, adv_flag = residuals
    if video_u8.dtype != jnp.uint8 or not _supported(video_u8.shape):
        # mirror the jnp path's gradient
        _, vjp = jax.vjp(lambda d, a: _jnp_reference(video_u8, d, a), delta, adv_flag)
        dd, da = vjp(g)
        return None, dd, da
    b, t, h, w, c = video_u8.shape
    hwc = h * w * c
    rows = b * t
    cb = _col_block(hwc)
    grid = (rows // _ROW_BLOCK, hwc // cb)
    dd = pl.pallas_call(
        functools.partial(_bwd_kernel, c, t),
        out_shape=jax.ShapeDtypeStruct((t, c), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROW_BLOCK, cb), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_ROW_BLOCK, cb), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(
        video_u8.reshape(rows, hwc),
        delta.reshape(t, c).astype(jnp.float32),
        jnp.reshape(adv_flag, (1,)),
        g.astype(jnp.float32).reshape(rows, hwc),
    )
    # d/d(adv_flag) is not needed by the attack (flag is a constant gate);
    # return zeros to keep the vjp well-formed.
    return None, dd.reshape(delta.shape), jnp.zeros_like(adv_flag)


fused_normalize_perturb.defvjp(_fwd, _bwd)
