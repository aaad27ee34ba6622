"""Outpacked stem + channel-space MaxPool3d_2a fusion.

The I3D stem feeds MaxPool3d_2a_3x3 (window (1,3,3), stride (1,2,2);
reference i3d.py:182-186).  XLA lowers that pool's forward to a reduce-window
measured at 76 GiB/s (6.3 ms of the round-2 attack step) and its backward to
select-and-scatter; every direct replacement measured slower because the
parity slices a separable form needs sit half a lane tile from the 64-channel
minor dim and XLA materializes them as relayout copies (PERF.md rounds 2-3).

This op removes the pool's spatial window entirely by changing WHERE the
parity lives: the (already space-to-depth packed, ops/space_to_depth.py) stem
conv is *output-packed* over H and W — output position 2u+s becomes output
CHANNEL block s — so the conv itself materializes the pool's window structure
as real MXU lanes:

    y[2u+s] = sum_d k[d] x[2u+s+d-1]          (packed stem, per axis)
  = conv(x, k_out, stride 2, width 5, pads (1,2)),  k_out[e, (s,c)] = k[e-s]

Per axis the width-5 kernel carries 4 real taps per sub-position (e = s+d),
so MACs inflate 25/16 over the two spatial axes — but output lanes go
64 -> 256 (the plain stem fills half the MXU's 128 lanes) and, decisively,
the pool collapses: with blocks B(sh,sw) the SAME (3,3)/(2,2) max is

    m_sh = max(B(sh,0), B(sh,1), shift_W(B(sh,0)))        per row parity
    out  = max(m_0,     m_1,     shift_H(m_0))

pure elementwise max over channel slices — no reduce-window, and the
backward is first-match mask routing (row-major tie rule, identical to
select-and-scatter's; proof as in ops/maxpool.py: route H first on row
maxes, then W inside the winning row).

The backward's input gradient arrives ALREADY 2x2-packed (it IS the conv
output cotangent), which reverses the economics of the round-1 "packed
transposed-conv stem backward" negative result: that variant paid a 411 MB
pack transpose of the natural gradient before the wide transposed conv
(ops/space_to_depth.py build_stem_bwd_kernel); here the pack is free and
only the small Cin-channel input gradient is depth-to-space unpacked.

BN (inference, offset-only, eps 1e-3 — sonnet v1) and relu ride inside the
op with channel-tiled statistics; only the packed relu output is saved (the
relu mask recomputes as y > 0, exact — see ops/space_to_depth.py
stem_conv_bn_relu).

Kernel/BN cotangents are ZERO — frozen victim; the attack differentiates
w.r.t. delta only.  Gated by FLICKER_STEM_OUTPACK (models/i3d.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .maxpool import _shift_down, _shift_up
from .space_to_depth import build_stem_bwd_kernel, depth_to_space_hw


def pack_stem_kernel_outpack(pk: jax.Array) -> jax.Array:
    """[4,4,4,Cin,Cout] (packed stem kernel, spatial pads (1,2)) ->
    [4,5,5,Cin,4*Cout] for the stride-(2,2) output-packed conv, spatial pads
    (1,2).  Output channel order (s_h, s_w, C) — matching pack_input /
    depth_to_space_hw and the 2x2-packed gradient build_stem_bwd_kernel
    consumes."""
    kt, kh, kw, cin, cout = pk.shape
    assert (kh, kw) == (4, 4), (kh, kw)
    out = jnp.zeros((kt, 5, 5, cin, 4, cout), pk.dtype)
    for sh in range(2):
        for sw in range(2):
            out = out.at[:, sh : sh + 4, sw : sw + 4, :, sh * 2 + sw, :].set(pk)
    return out.reshape(kt, 5, 5, cin, 4 * cout)


def _outpack_conv(xp: jax.Array, pko: jax.Array) -> jax.Array:
    """Temporally-unrolled output-packed stem conv.

    xp [B,T',H',W',Cin] (H', W' even) -> [B,T',H'/2,W'/2,4*Cout]."""
    b, tt, hh, ww, c = xp.shape
    co4 = pko.shape[-1]
    xpad = jnp.pad(xp, ((0, 0), (1, 2), (0, 0), (0, 0), (0, 0)))
    y = None
    for m in range(4):
        sl = xpad[:, m : m + tt].reshape(b * tt, hh, ww, c)
        ym = lax.conv_general_dilated(
            sl,
            pko[m],
            window_strides=(2, 2),
            padding=[(1, 2), (1, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=xp.dtype,
        )
        y = ym if y is None else y + ym
    return y.reshape(b, tt, hh // 2, ww // 2, co4)


def _bn_relu_tiled(y: jax.Array, mean, var, bias, eps: float) -> jax.Array:
    """Inference BN (offset only) + relu with stats tiled over the 4 channel
    blocks; value-identical to nn.BatchNorm in the compute dtype."""
    dt = y.dtype
    m4 = jnp.tile(mean.astype(dt), 4)
    v4 = jnp.tile(var.astype(dt), 4)
    b4 = jnp.tile(bias.astype(dt), 4)
    y = (y - m4) * lax.rsqrt(v4 + jnp.asarray(eps, dt)) + b4
    return jax.nn.relu(y)


def _blocks(yp: jax.Array):
    """The four (s_h, s_w) channel blocks of a packed [.., 4*C] tensor."""
    c = yp.shape[-1] // 4
    return tuple(
        lax.slice_in_dim(yp, i * c, (i + 1) * c, 1, axis=yp.ndim - 1)
        for i in range(4)
    )


def pool2a_fwd_from_blocks(a00, a01, a10, a11):
    """SAME (1,3,3)/(1,2,2) max pool in channel space over [B,T,Hc,Wc,C]
    blocks.  Returns (m0, m1, out): the per-row-parity W maxes and the pooled
    output.  Window w=3/s=2 at even extent has pad_lo=0, so output u reads
    positions 2u, 2u+1, 2u+2 = blocks (s=0)[u], (s=1)[u], (s=0)[u+1]."""
    neg = -jnp.inf
    m0 = lax.max(lax.max(a00, a01), _shift_down(a00, 3, neg))
    m1 = lax.max(lax.max(a10, a11), _shift_down(a10, 3, neg))
    out = lax.max(lax.max(m0, m1), _shift_down(m0, 2, neg))
    return m0, m1, out


def pool2a_bwd_to_blocks(g, a00, a01, a10, a11, m0, m1, out):
    """First-match routing of the pooled cotangent back onto the channel
    blocks; row-major window order (H row first via row maxes, then W within
    the winning row) — identical to XLA select-and-scatter's GE tie rule."""
    dt = g.dtype
    neg = -jnp.inf
    e0 = m0 == out
    e1 = (m1 == out) & ~e0
    e2 = (_shift_down(m0, 2, neg) == out) & ~e0 & ~e1
    g0 = g * e0.astype(dt) + _shift_up(g * e2.astype(dt), 2, 0)
    g1 = g * e1.astype(dt)

    def route_w(gk, ak0, ak1, mk):
        f0 = ak0 == mk
        f1 = (ak1 == mk) & ~f0
        f2 = (_shift_down(ak0, 3, neg) == mk) & ~f0 & ~f1
        d0 = gk * f0.astype(dt) + _shift_up(gk * f2.astype(dt), 3, 0)
        d1 = gk * f1.astype(dt)
        return d0, d1

    d00, d01 = route_w(g0, a00, a01, m0)
    d10, d11 = route_w(g1, a10, a11, m1)
    return jnp.concatenate([d00, d01, d10, d11], axis=g.ndim - 1)


def stem_bwd_from_packed(gp: jax.Array, pk: jax.Array, shape) -> jax.Array:
    """Input gradient of the packed stem conv from an ALREADY 2x2-packed
    upstream gradient gp [B,T',H'/2,W'/2,4*Cout] (channel order (q_h,q_w,C)).

    Per temporal tap m: dx[v] gets k_m^T g[v + 1 - m]; spatially a stride-1
    pads-(1,1) conv with build_stem_bwd_kernel's [3,3,4Cout,4Cin] kernel.
    All four taps concatenate on OUTPUT channels — the same single-read trick
    as stem_conv_catbwd (4 separate taps would re-read the full gradient 4x,
    the round-3 fusion.824-827 pathology) — and the per-tap partials combine
    by temporal shift+add, a fusible elementwise chain; only the SMALL packed
    Cin gradient is depth-to-space unpacked at the end."""
    b, tt, hh, ww, cin = shape
    cout = pk.shape[-1]
    kcat = jnp.concatenate(
        [build_stem_bwd_kernel(pk[m]) for m in range(4)], axis=-1
    )  # [3,3,4*Cout,4*(4*Cin)]
    part = lax.conv_general_dilated(
        gp.reshape(b * tt, hh // 2, ww // 2, 4 * cout),
        kcat,
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pk.dtype,
    ).reshape(b, tt, hh // 2, ww // 2, 16 * cin)
    # temporal combine: dx[v] = sum_m part[v + 1 - m][tap m block]
    acc = None
    for m in range(4):
        blk = lax.slice_in_dim(part, m * 4 * cin, (m + 1) * 4 * cin, 1, axis=4)
        shift = 1 - m  # source index v + 1 - m
        if shift >= 0:
            sl = lax.slice_in_dim(blk, shift, tt, 1, axis=1)
            sl = jnp.pad(sl, ((0, 0), (0, shift), (0, 0), (0, 0), (0, 0)))
        else:
            sl = lax.slice_in_dim(blk, 0, tt + shift, 1, axis=1)
            sl = jnp.pad(sl, ((0, 0), (-shift, 0), (0, 0), (0, 0), (0, 0)))
        acc = sl if acc is None else acc + sl
    return depth_to_space_hw(acc, 2)


def _fwd_math(xp, pk, pko, mean, var, bias, eps):
    yp = _bn_relu_tiled(_outpack_conv(xp, pko), mean, var, bias, eps)
    _, _, out = pool2a_fwd_from_blocks(*_blocks(yp))
    return out, yp


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def stem_pool_outpack(
    xp: jax.Array,
    pk: jax.Array,
    pko: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    bias: jax.Array,
    eps: float = 1e-3,
) -> jax.Array:
    """Packed stem conv + BN + relu + MaxPool3d_2a as ONE custom-VJP op.

    xp:  space-to-depth packed input [B,T',H',W',8*Cin0] (H', W' even)
    pk:  packed 4-tap stem kernel [4,4,4,Cin,Cout] (backward)
    pko: pack_stem_kernel_outpack(pk) [4,5,5,Cin,4*Cout] (forward)
    ->   [B,T',H'/2,W'/2,Cout] — the MaxPool3d_2a_3x3 endpoint value.

    Kernel/BN cotangents are ZERO (frozen victim)."""
    return _fwd_math(xp, pk, pko, mean, var, bias, eps)[0]


def _vjp_fwd(xp, pk, pko, mean, var, bias, eps):
    out, yp = _fwd_math(xp, pk, pko, mean, var, bias, eps)
    return out, (xp.shape, pk, var, yp)


def _vjp_bwd(eps, res, g):
    shape, pk, var, yp = res
    blocks = _blocks(yp)
    m0, m1, out = pool2a_fwd_from_blocks(*blocks)  # elementwise recompute
    gyp = pool2a_bwd_to_blocks(g.astype(yp.dtype), *blocks, m0, m1, out)
    v4 = jnp.tile(var.astype(yp.dtype), 4)
    gyp = gyp * (yp > 0) * lax.rsqrt(v4 + jnp.asarray(eps, yp.dtype))
    dxp = stem_bwd_from_packed(gyp, pk, shape)
    zf = jnp.zeros_like(var)
    return (
        dxp,
        jnp.zeros_like(pk),
        jnp.zeros((4, 5, 5, pk.shape[-2], 4 * pk.shape[-1]), pk.dtype),
        zf,
        zf,
        jnp.zeros_like(var),
    )


stem_pool_outpack.defvjp(_vjp_fwd, _vjp_bwd)
