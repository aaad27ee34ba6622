"""Pallas max-pool kernels for the I3D pool geometries.

XLA's reduce-window-max runs far off HBM speed-of-light on the attack step's
pool shapes (MaxPool2a forward: 6.3 ms at 76 GiB/s for ~0.5 GB of traffic —
~8x off; xplane, PERF.md round 2).  This kernel computes the same pool as
shifted elementwise maxima in VMEM — pure streaming reads/writes.

Mosaic lowering constraints found the hard way (all three attempts are in
the git history):
  * strided slicing (`x[:, 0::2]`) lowers to an unsupported >2-D gather;
  * a `[h, w/2, 2, c]` split puts the 2-extent on the sublane dim, where it
    pads to a full tile (62 MB of temporaries at 112x112x64);
  * a `[h, w/2, 2c]` lane-merge reshape crashes the Mosaic compiler.
The working formulation: H handled by a two-spec block scheme (a dense
2R-row block + the one extra odd row, index-map-clamped at the edge — max
over a replicated row == SAME padding), W handled as a stride-1 pool via
concat-shifts followed by ONE small odd-column select whose padded temp is
tiny.

Coverage: `spatial_pool_132` — window (1,3,3), strides (1,2,2), SAME, even
H/W (MaxPool3d_2a/3a, reference i3d.py).  Forward Pallas; backward = XLA's
own `select_and_scatter_add` primitive, i.e. exactly the gradient the
autodiff path produces (same first-match tie rule), with no forward
recompute.

STATUS: correct (tests/test_pallas_pool.py) but NOT wired into the model —
measured at step level the kernel matches reduce-window's own time while its
default-layout boundary forces ~14 ms of relayouts around it (the
surrounding ops carry non-default layouts).  Kept as kernel infrastructure
and as the measured record; see PERF.md round 2 and ops/maxpool.py.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _neg_inf(dtype):
    return jnp.asarray(-jnp.inf, dtype)


def _spatial_fwd_kernel(rows_ref, extra_ref, o_ref):
    rows = rows_ref[0]  # [2R, W, C]
    extra = extra_ref[0]  # [1, W, C] (row 2R of the window range, clamped)
    r2, w, c = rows.shape
    r = r2 // 2
    neg = jnp.full((r, w, c), _neg_inf(rows.dtype), rows.dtype)

    # H: out row r' = max(rows[2r'], rows[2r'+1], rows[2r'+2])
    re = rows.reshape(r, 2, w, c)
    a = jnp.maximum(re[:, 0], re[:, 1])
    nxt = jnp.concatenate([re[1:, 0], extra], axis=0)  # rows[2r'+2]
    m = jnp.maximum(a, nxt)  # [R, W, C]

    # W: stride-1 3-tap pool via shifts, then keep odd columns
    # (P[2w'+1] = max(m[2w'], m[2w'+1], m[2w'+2]) — exactly the SAME pool)
    negc = jnp.full((r, 1, c), _neg_inf(rows.dtype), rows.dtype)
    up = jnp.concatenate([m[:, 1:], negc], axis=1)
    down = jnp.concatenate([negc, m[:, :-1]], axis=1)
    p = jnp.maximum(jnp.maximum(m, up), down)  # [R, W, C]
    o_ref[0] = p.reshape(r, w // 2, 2, c)[:, :, 1, :]


def _pick_rows_per_block(h2: int) -> int:
    for r in (14, 8, 7, 4, 2, 1):
        if h2 % r == 0:
            return r
    return 1


def _spatial_fwd(x4: jax.Array, interpret: bool) -> jax.Array:
    """[N, H, W, C] -> [N, H/2, W/2, C] via the Pallas kernel."""
    n, h, w, c = x4.shape
    h2 = h // 2
    r = _pick_rows_per_block(h2)
    grid = (n, h2 // r)

    def rows_map(i, j):
        return (i, j, 0, 0)  # block units: (1, 2R, W, C)

    def extra_map(i, j):
        # the single row index 2R*(j+1), clamped to H-1: max over a
        # replicated edge row == SAME (0,1) padding for max pooling
        return (i, jnp.minimum(2 * r * (j + 1), h - 1), 0, 0)

    return pl.pallas_call(
        _spatial_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * r, w, c), rows_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, c), extra_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, r, w // 2, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h2, w // 2, c), x4.dtype),
        interpret=interpret,
    )(x4, x4)


# ---------------------------------------------------------------------------
# Stride-1 3x3x3 SAME pool forward (the Inception-branch pools)
# ---------------------------------------------------------------------------
#
# Round-3 xplane: the stride-1 branch-pool FORWARDS are the single worst op
# group left in the headline step — 6.28 ms of reduce_window_max at 76 GiB/s
# vs a 0.63 ms HBM speed-of-light (PERF.md SoL table).  Four XLA-level
# replacements (separable slice chains, pad-once, one-pass 27-tap) all lost
# to VPU issue rate / broken fusions.  Unlike the STRIDED stem pools (where
# three Pallas kernels died on relayouts — the neighbors carry non-default
# W-minor layouts), these pools are same-shape in/out mid-network tensors
# whose producers/consumers are convs with standard C-minor layouts, so a
# default-layout Pallas boundary should cost nothing.
#
# Kernel: grid over (B, T); each program reads planes t-1, t, t+1
# (index-map-CLAMPED at the edges — max over a replicated edge plane equals
# SAME -inf padding for max), computes the temporal 3-max, then the spatial
# 3x3 stride-1 SAME pool as shift-max chains (concat with one -inf row/col),
# all elementwise in VMEM, and writes one plane.  Values are bit-identical
# to reduce_window (same candidate set, max is order-free), so the routing
# backward in ops/maxpool.py (and its save_y residual) stays exact.


def _overlap_fwd_kernel(prev_ref, cur_ref, nxt_ref, o_ref):
    p = prev_ref[0, 0]  # [H, W, C]
    c = cur_ref[0, 0]
    n = nxt_ref[0, 0]
    h, w, ch = c.shape
    m = jnp.maximum(jnp.maximum(p, c), n)
    neg_row = jnp.full((1, w, ch), _neg_inf(c.dtype), c.dtype)
    up = jnp.concatenate([m[1:], neg_row], axis=0)
    dn = jnp.concatenate([neg_row, m[:-1]], axis=0)
    mh = jnp.maximum(jnp.maximum(m, up), dn)
    neg_col = jnp.full((h, 1, ch), _neg_inf(c.dtype), c.dtype)
    left = jnp.concatenate([mh[:, 1:], neg_col], axis=1)
    right = jnp.concatenate([neg_col, mh[:, :-1]], axis=1)
    o_ref[0, 0] = jnp.maximum(jnp.maximum(mh, left), right)


def _overlap_fwd_kernel_blocked(prev_ref, cur_ref, nxt_ref, o_ref):
    """T-blocked variant: center block [Tb, H, W, C] + one halo plane per
    side — cuts the temporal read redundancy from 3x to (Tb+2)/Tb."""
    c = cur_ref[0]  # [Tb, H, W, C]
    p = prev_ref[0]  # [1, H, W, C]
    n = nxt_ref[0]
    tb, h, w, ch = c.shape
    up = jnp.concatenate([c[1:], n], axis=0)
    dn = jnp.concatenate([p, c[:-1]], axis=0)
    m = jnp.maximum(jnp.maximum(c, up), dn)
    neg_row = jnp.full((tb, 1, w, ch), _neg_inf(c.dtype), c.dtype)
    hu = jnp.concatenate([m[:, 1:], neg_row], axis=1)
    hd = jnp.concatenate([neg_row, m[:, :-1]], axis=1)
    mh = jnp.maximum(jnp.maximum(m, hu), hd)
    neg_col = jnp.full((tb, h, 1, ch), _neg_inf(c.dtype), c.dtype)
    left = jnp.concatenate([mh[:, :, 1:], neg_col], axis=2)
    right = jnp.concatenate([neg_col, mh[:, :, :-1]], axis=2)
    o_ref[0] = jnp.maximum(jnp.maximum(mh, left), right)


def _pick_t_block(t: int, h: int, w: int, c: int, itemsize: int) -> int:
    """Largest Tb dividing T whose working set stays comfortably in VMEM.
    Padded plane bytes: W pads to the sublane multiple, C to the lane (128);
    budget covers ~6 live block-sized temporaries (center/out/max-chain)."""
    sub = 16 if itemsize == 2 else 8
    wp = -(-w // sub) * sub
    cp = -(-c // 128) * 128
    plane = h * wp * cp * itemsize
    for tb in (8, 4, 2):
        if t % tb == 0 and plane * tb * 6 < 8 * 1024 * 1024:
            return tb
    return 1


def overlap_pool_333_supported(shape: Tuple[int, ...]) -> bool:
    """[B, T, H, W, C]: any extents (SAME pads (1,1) per axis at stride 1)."""
    return len(shape) == 5


# --- strided spatial pool (MaxPool2a/3a) in the producer's layout -----------
#
# Round-3 xplane of the gated step: the single worst op in the headline
# program is MaxPool2a's FORWARD — one reduce_window_max at 68-76 GiB/s,
# 6.1 ms vs a 0.63 ms HBM floor — and its W-minor layout preference
# ({2,3,1,0}) forces the 411 MB relayout copy.85 + the 103 MB copy.86 on its
# faces (HLO copy hunt, PERF.md).  Every XLA-level replacement measured
# negative (parity forms, generic routing, NOFOLD).  This kernel computes
# the pool in the PRODUCER's layout: the stem relu output prefers
# {0,3,2,1} on the folded [BT,H,W,C], i.e. physical order H,W,C,BT — so the
# caller's transpose to a default-layout [H,W,C,BT] view is a bitcast, the
# pooled H/W axes are UNTILED (the tiled minors are C and BT: e.g. 64
# sublanes x 256 lanes for pool2a — zero tile padding), and every slice/
# reshape/concat the kernel does runs on untiled-major dims.  That is the
# precise inverse of the round-2 Pallas pool failures, which fought W-minor
# tiles.  The backward stays XLA's select-and-scatter (identical to the
# autodiff the default path runs).


def _strided_fwd_kernel(a_ref, hx_ref, wx_ref, cx_ref, o_ref):
    """SAME (0,1)-padded 3x3/s2 spatial pool on a [2R,2S,C,BT] block.

    Output (r,s) reads rows 2r..2r+2, cols 2s..2s+2; the row/col/corner
    extras carry the first row/col of the NEXT block (index-map-clamped at
    the edge — max over a replicated edge row equals the -inf SAME pad)."""
    a = a_ref[...]            # (2R, 2S, C, BT)
    hx = hx_ref[0]            # (2S, C, BT)
    wx = wx_ref[:, 0]         # (2R, C, BT)
    cx = cx_ref[0, 0]         # (C, BT)
    r2, s2 = a.shape[0], a.shape[1]
    r, s = r2 // 2, s2 // 2
    re = a.reshape(r, 2, s2, *a.shape[2:])
    m0 = jnp.maximum(re[:, 0], re[:, 1])                      # (R, 2S, C, BT)
    # rows 2r+2 (empty-slice guard: Mosaic rejects 0-extent vectors at R==1)
    nxt = hx[None] if r == 1 else jnp.concatenate([re[1:, 0], hx[None]], axis=0)
    m = jnp.maximum(m0, nxt)
    wxe = wx.reshape(r, 2, *wx.shape[1:])
    wm0 = jnp.maximum(wxe[:, 0], wxe[:, 1])                   # (R, C, BT)
    wnxt = cx[None] if r == 1 else jnp.concatenate([wxe[1:, 0], cx[None]], axis=0)
    wm = jnp.maximum(wm0, wnxt)
    me = m.reshape(r, s, 2, *m.shape[2:])
    w0 = jnp.maximum(me[:, :, 0], me[:, :, 1])                # (R, S, C, BT)
    wnext = (                                                  # cols 2s+2
        wm[:, None]
        if s == 1
        else jnp.concatenate([me[:, 1:, 0], wm[:, None]], axis=1)
    )
    o_ref[...] = jnp.maximum(w0, wnext)


def _pick_hw_blocks(ho: int, wo: int, c: int, bt: int, itemsize: int):
    """(HB, WB) output-block extents: divisors of H'/W' keeping the dense
    input block (2HB x 2WB x C x BT) within ~3 MB (temps ~triple it);
    balanced blocks preferred (halo-read overhead ~ (2HB+1)(2WB+1)/4HBWB)."""
    budget = 3 * 1024 * 1024
    best, best_key = (1, 1), (0, 0)
    for hb in (14, 8, 7, 4, 2, 1):
        if ho % hb:
            continue
        for wb in (14, 8, 7, 4, 2, 1):
            if wo % wb:
                continue
            if 4 * hb * wb * c * bt * itemsize > budget:
                continue
            key = (hb * wb, -abs(hb - wb))
            if key > best_key:
                best, best_key = (hb, wb), key
    return best


def strided_spatial_pool_conv_supported(shape: Tuple[int, ...]) -> bool:
    """[B,T,H,W,C] with even H/W (SAME (0,1) pads — the pool2a/3a shapes)."""
    return len(shape) == 5 and shape[2] % 2 == 0 and shape[3] % 2 == 0


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def strided_spatial_pool_conv(
    x: jax.Array, interpret: bool = False, block=None
) -> jax.Array:
    """(1,3,3)/(1,2,2) SAME max pool over NDHWC — Pallas forward in the
    producer's layout, XLA select-and-scatter backward (= the autodiff the
    reduce-window path runs, same first-match tie rule).  `block` overrides
    the (HB, WB) output-block picker (tests exercise the HB/WB==1 edges)."""
    return _strided_fwd_impl(x, interpret, block)


def _strided_fwd_impl(x, interpret, block=None):
    """x: [B,T,H,W,C] logical; compute on a [H,W,C,BT] view.

    Measured the best of three orientations in-step (chip A/Bs 2026-08-18,
    T=64 B=8 headline): this [H,W,C,BT] form 12.26 steps/s; a [T,H,W,B*C]
    form matching the 5-D {4,0,3,2,1} conv layout 11.64 (the folded stem
    region actually lives in W-MINOR {2,3,1,0}, so those faces copied
    anyway); default reduce-window 11.94.  The full-bitcast ideal would
    need a W-minor (lane-dim-pooling) kernel — the orientation Mosaic
    handles worst (round-2 negative results)."""
    b, t, h, w, c = x.shape
    bt = b * t
    ho, wo = h // 2, w // 2
    xt = jnp.transpose(x.reshape(bt, h, w, c), (1, 2, 3, 0))  # [H,W,C,BT]
    hb, wb = block or _pick_hw_blocks(ho, wo, c, bt, x.dtype.itemsize)

    def a_map(i, j):
        return (i, j, 0, 0)

    def hx_map(i, j):
        return (jnp.minimum(2 * hb * (i + 1), h - 1), j, 0, 0)

    def wx_map(i, j):
        return (i, jnp.minimum(2 * wb * (j + 1), w - 1), 0, 0)

    def cx_map(i, j):
        return (
            jnp.minimum(2 * hb * (i + 1), h - 1),
            jnp.minimum(2 * wb * (j + 1), w - 1),
            0,
            0,
        )

    yt = pl.pallas_call(
        _strided_fwd_kernel,
        grid=(ho // hb, wo // wb),
        in_specs=[
            pl.BlockSpec((2 * hb, 2 * wb, c, bt), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * wb, c, bt), hx_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hb, 1, c, bt), wx_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, bt), cx_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (hb, wb, c, bt), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ho, wo, c, bt), x.dtype),
        interpret=interpret,
    )(xt, xt, xt, xt)
    return jnp.transpose(yt, (3, 0, 1, 2)).reshape(b, t, ho, wo, c)


def _strided_pool_fwd(x, interpret, block=None):
    return _strided_fwd_impl(x, interpret, block), x


def _strided_ref_fwd(x):
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 1, 3, 3, 1),
        window_strides=(1, 1, 2, 2, 1),
        padding=((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)),
    )


def _strided_pool_bwd(interpret, block, x, dy):
    # exactly the autodiff backward of the reduce-window path (see _pool_bwd:
    # the private-primitive fast path skips the forward recompute; a JAX
    # upgrade that removes it degrades to jax.vjp, same numerics)
    ssa = getattr(lax, "select_and_scatter_add_p", None)
    ge = getattr(lax, "ge_p", None)
    if ssa is None or ge is None:
        _, pullback = jax.vjp(_strided_ref_fwd, x)
        return (pullback(dy)[0],)
    if os.environ.get("FLICKER_POOL_2A_BWD_VIEW", "1") != "0":
        # DEFAULT ON (chip A/B 2026-08-18: 12.83 -> 12.91 steps/s, HBM bytes
        # 45.68 -> 45.27 GB): bind the select-and-scatter on the SAME
        # [H,W,C,BT] view the Pallas forward reads, so x has one consumer
        # orientation instead of two (the dual-layout materialization
        # fusion.783, 1.9 ms).  Window first-match order is (H,W) row-major
        # in both forms — identical gradients.
        b, t, h, w, c = x.shape
        xv = jnp.transpose(x.reshape(b * t, h, w, c), (1, 2, 3, 0))
        dyv = jnp.transpose(dy.reshape(b * t, h // 2, w // 2, c), (1, 2, 3, 0))
        dxv = ssa.bind(
            dyv,
            xv,
            select_prim=ge,
            window_dimensions=(3, 3, 1, 1),
            window_strides=(2, 2, 1, 1),
            padding=((0, 1), (0, 1), (0, 0), (0, 0)),
        )
        dx = jnp.transpose(dxv, (3, 0, 1, 2)).reshape(x.shape)
        return (dx,)
    dx = ssa.bind(
        dy,
        x,
        select_prim=ge,
        window_dimensions=(1, 1, 3, 3, 1),
        window_strides=(1, 1, 2, 2, 1),
        padding=((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)),
    )
    return (dx,)


strided_spatial_pool_conv.defvjp(_strided_pool_fwd, _strided_pool_bwd)


# --- paired forward+index / index-routing backward --------------------------
#
# The forward-only Pallas pool cannot recover the relayout copies: XLA's
# select-and-scatter BACKWARD still demands x in its W-minor layout, so the
# relu output gets materialized twice (fusion.782 dual-output, 1.9 ms) and
# the boundary copies survive (chip A/Bs 2026-08-18: fwd-only 12.26 / 11.64
# steps/s vs 11.94 default).  This pair removes the backward's x dependence
# entirely: the forward ALSO emits the window's first-match ARGMAX INDEX
# (k = kh*3+kw in row-major window order — exactly XLA's GE select rule),
# stored as bf16 (0..9 exact; Mosaic u8 support is limited), and the
# backward is a pure (dy, idx) -> dx routing kernel.  No select-and-scatter,
# no W-minor tensor anywhere, and the residual is the 4x-smaller idx instead
# of x.


def _pair_fwd_kernel(a_ref, hx_ref, y_ref, idx_ref):
    a = a_ref[0]              # (2R, W, BC)
    hx = hx_ref[0]            # (1, W, BC)
    r2, w, bc = a.shape
    r = r2 // 2
    re = a.reshape(r, 2, w, bc)
    rows = [
        re[:, 0],
        re[:, 1],
        hx if r == 1 else jnp.concatenate([re[1:, 0], hx], axis=0),
    ]
    negc = jnp.full((r, 1, bc), _neg_inf(a.dtype), a.dtype)
    cands = []
    for kh in range(3):
        mr = rows[kh].reshape(r, w // 2, 2, bc)
        ev = mr[:, :, 0, :]                                     # cols 2w'
        od = mr[:, :, 1, :]                                     # cols 2w'+1
        ev_next = jnp.concatenate([ev[:, 1:], negc], axis=1)    # cols 2w'+2
        cands.extend([ev, od, ev_next])
    y = cands[0]
    for c in cands[1:]:
        y = jnp.maximum(y, c)
    # compare in f32: Mosaic rejects sub-word equality ("Target does not
    # support this comparison" for bf16 ==); the upcast is exact
    y32 = y.astype(jnp.float32)
    idx = jnp.full(y.shape, 9.0, jnp.float32)
    for k in range(8, -1, -1):  # descending: the smallest matching k wins
        idx = jnp.where(cands[k].astype(jnp.float32) == y32, jnp.float32(k), idx)
    y_ref[0] = y
    idx_ref[0] = idx.astype(jnp.bfloat16)


def _pair_bwd_kernel(dyc_ref, dyh_ref, idc_ref, idh_ref, o_ref):
    j = pl.program_id(1)
    dyc = dyc_ref[0]          # (R, W', BC)
    idc = idc_ref[0]
    # halo row = window a-1 of the block's first output row; at j==0 that
    # window does not exist (SAME pad_lo=0) — zero it (the index map clamps
    # to row 0, which would otherwise double-count window 0)
    live = (j > 0).astype(dyc.dtype)
    dyh = dyh_ref[0] * live   # (1, W', BC)
    idh = idh_ref[0]
    dyx = jnp.concatenate([dyh, dyc], axis=0)   # (R+1, W', BC)
    idxx = jnp.concatenate([idh, idc], axis=0)
    r, wo, bc = dyc.shape

    idxx32 = idxx.astype(jnp.float32)  # Mosaic: no sub-word equality

    def t(k):
        return dyx * (idxx32 == jnp.float32(k)).astype(dyx.dtype)

    def shift_r(x):  # window col b-1 -> dx col 2b (k_w = 2)
        zero = jnp.zeros((r, 1, bc), x.dtype)
        return jnp.concatenate([zero, x[:, :-1]], axis=1)

    A = {k: t(k)[1:] for k in (0, 1, 2, 3, 4, 5)}    # windows a
    B = {k: t(k)[:-1] for k in (6, 7, 8)}            # windows a-1 (kh=2)
    ee = A[0] + shift_r(A[2]) + B[6] + shift_r(B[8])
    eo = A[1] + B[7]
    oe = A[3] + shift_r(A[5])
    oo = A[4]
    p0 = jnp.stack([ee, eo], axis=2)                 # (R, W', 2, BC)
    p1 = jnp.stack([oe, oo], axis=2)
    dx6 = jnp.stack([p0, p1], axis=1)                # (R, 2, W', 2, BC)
    o_ref[0] = dx6.reshape(2 * r, 2 * wo, bc)


def _pick_pair_h_block(ho: int, w: int, bc: int, itemsize: int, live: int) -> int:
    """HB dividing H' with ~`live` live row-sized temporaries in VMEM."""
    row = w * (-(-bc // 128) * 128) * itemsize
    for hb in (14, 8, 7, 4, 2):
        if ho % hb == 0 and hb * row * live < 7 * 1024 * 1024:
            return hb
    return 1


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def strided_spatial_pool_pair(
    x: jax.Array, interpret: bool = False, block=None
) -> jax.Array:
    """(1,3,3)/(1,2,2) SAME max pool — Pallas forward+argmax-index, Pallas
    index-routing backward.  Gradient equals XLA's select-and-scatter (GE
    first-match over row-major window order) bit for bit."""
    y, _ = _pair_fwd_impl(x, interpret, block)
    return y


def _pair_view(x):
    b, t, h, w, c = x.shape
    return jnp.transpose(x, (1, 2, 3, 0, 4)).reshape(t, h, w, b * c)


def _pair_unview(xt, b, c):
    t, h, w, _ = xt.shape
    return jnp.transpose(xt.reshape(t, h, w, b, c), (3, 0, 1, 2, 4))


def _pair_fwd_impl(x, interpret, block=None):
    b, t, h, w, c = x.shape
    bc = b * c
    ho, wo = h // 2, w // 2
    xt = _pair_view(x)
    # live=28: measured scoped-vmem usage of this kernel is ~5.8 MB per HB
    # unit on the pool2a geometry (23.1 MB at HB=4 — compile-time OOM above
    # the 16 MB scoped limit); the f32 compare temporaries double the naive
    # estimate
    hb = block or _pick_pair_h_block(ho, w, bc, x.dtype.itemsize, live=28)
    y_t, idx_t = pl.pallas_call(
        _pair_fwd_kernel,
        grid=(t, ho // hb),
        in_specs=[
            pl.BlockSpec(
                (1, 2 * hb, w, bc), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, w, bc),
                lambda i, j: (i, jnp.minimum(2 * hb * (j + 1), h - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, hb, wo, bc), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hb, wo, bc), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, ho, wo, bc), x.dtype),
            jax.ShapeDtypeStruct((t, ho, wo, bc), jnp.bfloat16),
        ],
        interpret=interpret,
    )(xt, xt)
    return _pair_unview(y_t, b, c), idx_t


def _pair_vjp_fwd(x, interpret, block=None):
    y, idx_t = _pair_fwd_impl(x, interpret, block)
    return y, idx_t


def _pair_vjp_bwd(interpret, block, idx_t, dy):
    b, c, dtype = dy.shape[0], dy.shape[4], dy.dtype
    dyt = _pair_view(dy)
    t, ho, wo, bc = dyt.shape
    hb = block or _pick_pair_h_block(ho, 2 * wo, bc, dy.dtype.itemsize, live=14)
    dxt = pl.pallas_call(
        _pair_bwd_kernel,
        grid=(t, ho // hb),
        in_specs=[
            pl.BlockSpec(
                (1, hb, wo, bc), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, wo, bc),
                lambda i, j: (i, jnp.maximum(hb * j - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hb, wo, bc), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, wo, bc),
                lambda i, j: (i, jnp.maximum(hb * j - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * hb, 2 * wo, bc), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, 2 * ho, 2 * wo, bc), dtype),
        interpret=interpret,
    )(dyt, dyt, idx_t, idx_t)
    return (_pair_unview(dxt, b, c),)


strided_spatial_pool_pair.defvjp(_pair_vjp_fwd, _pair_vjp_bwd)


# --- conv-layout variant -----------------------------------------------------
#
# The B-major kernel above is 2.5-2.7x faster than reduce-window in ISOLATION
# (chip A/B 2026-08-18: Mixed_3b fwd 1.67 -> 0.61 ms) but net-NEGATIVE inside
# fwd+bwd programs: the attack step keeps these tensors in layout
# {4,0,3,2,1} (physical order T,H,W,B,C — batch sits next to channels for the
# convs), and the default-layout Pallas boundary forced three full-size
# relayout copies (microbench HLO: copy.7/copy/copy.6, 77 MB each).  This
# variant speaks the conv layout natively: the caller transposes to
# [T,H,W,B,C] (a BITCAST against {4,0,3,2,1} operands — XLA's
# transpose-is-bitcast rule) and merges (W,B) into one sublane axis (free
# reshape in that order; W-shifts become shifts by B), so no relayout exists
# on either face.  Grid over (T, H-blocks); T handled by three clamped plane
# refs, H by one halo row per side, W by in-row shift-maxes.


def _conv_fwd_kernel(b: int):
    def kernel(cp_ref, cc_ref, cn_ref, pp_ref, pc_ref, pn_ref,
               np_ref, nc_ref, nn_ref, o_ref):
        # c*_ref: center H-block of planes t-1/t/t+1, [1, Hb, W*B, C]
        # p*_ref / n*_ref: single H rows above/below the block, [1, 1, W*B, C]
        cm = jnp.maximum(jnp.maximum(cp_ref[0], cc_ref[0]), cn_ref[0])
        pm = jnp.maximum(jnp.maximum(pp_ref[0], pc_ref[0]), pn_ref[0])
        nm = jnp.maximum(jnp.maximum(np_ref[0], nc_ref[0]), nn_ref[0])
        hb, wb, ch = cm.shape
        up = jnp.concatenate([cm[1:], nm], axis=0)
        dn = jnp.concatenate([pm, cm[:-1]], axis=0)
        hm = jnp.maximum(jnp.maximum(cm, up), dn)
        negb = jnp.full((hb, b, ch), _neg_inf(cm.dtype), cm.dtype)
        wu = jnp.concatenate([hm[:, b:], negb], axis=1)
        wd = jnp.concatenate([negb, hm[:, :-b]], axis=1)
        o_ref[0] = jnp.maximum(jnp.maximum(hm, wu), wd)

    return kernel


def _pick_h_block(h: int, wb: int, c: int, itemsize: int) -> int:
    """Largest Hb dividing H whose ~10 live block temporaries fit VMEM."""
    cp = -(-c // 128) * 128
    row = wb * cp * itemsize
    for hb in (28, 14, 8, 7, 4, 2):
        if h % hb == 0 and row * hb * 10 < 8 * 1024 * 1024:
            return hb
    return 1


def _overlap_fwd_conv_layout(x: jax.Array, interpret: bool) -> jax.Array:
    """x: [B, T, H, W, C] logical; compute in the conv layout's physical
    order [T, H, W*B, C].  The boundary transposes/reshapes are bitcasts
    when x carries the step's {4,0,3,2,1} layout."""
    bsz, t, h, w, c = x.shape
    xt = jnp.transpose(x, (1, 2, 3, 0, 4)).reshape(t, h, w * bsz, c)
    wb = w * bsz
    hb = _pick_h_block(h, wb, c, x.dtype.itemsize)

    def center(dt):
        def imap(i, j):
            return (jnp.clip(i + dt, 0, t - 1), j, 0, 0)

        return pl.BlockSpec((1, hb, wb, c), imap, memory_space=pltpu.VMEM)

    def row(dt, side):
        def imap(i, j):
            ti = jnp.clip(i + dt, 0, t - 1)
            if side < 0:
                return (ti, jnp.maximum(j * hb - 1, 0), 0, 0)
            return (ti, jnp.minimum(j * hb + hb, h - 1), 0, 0)

        return pl.BlockSpec((1, 1, wb, c), imap, memory_space=pltpu.VMEM)

    yt = pl.pallas_call(
        _conv_fwd_kernel(bsz),
        grid=(t, h // hb),
        in_specs=[
            center(-1), center(0), center(1),
            row(-1, -1), row(0, -1), row(1, -1),
            row(-1, +1), row(0, +1), row(1, +1),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, wb, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, h, wb, c), x.dtype),
        interpret=interpret,
    )(*([xt] * 9))
    return jnp.transpose(yt.reshape(t, h, w, bsz, c), (3, 0, 1, 2, 4))


def overlap_pool_333(
    x: jax.Array, interpret: bool = False, layout: str = "conv"
) -> jax.Array:
    """(3,3,3)/(1,1,1) SAME max pool over NDHWC — Pallas forward only.

    The caller (ops/maxpool.py `_custom_fwd_impl`) wraps this in the
    custom-VJP whose backward is the separable first-match routing, so tie
    semantics are untouched: this kernel only produces the pooled VALUES,
    bit-identical to lax.reduce_window.

    layout='conv' (default): compute in the attack step's {4,0,3,2,1}
    physical order — no relayout on either face in-step.  layout='plain':
    the B-major plane kernel (faster if the surrounding program actually
    uses default layouts).
    """
    if layout == "conv":
        return _overlap_fwd_conv_layout(x, interpret)
    b, t, h, w, c = x.shape
    tb = _pick_t_block(t, h, w, c, x.dtype.itemsize)
    if tb > 1:
        return pl.pallas_call(
            _overlap_fwd_kernel_blocked,
            grid=(b, t // tb),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, h, w, c),
                    lambda i, j: (i, jnp.maximum(j * tb - 1, 0), 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, tb, h, w, c),
                    lambda i, j: (i, j, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, h, w, c),
                    lambda i, j: (i, jnp.minimum(j * tb + tb, t - 1), 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, tb, h, w, c), lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=interpret,
        )(x, x, x)
    return pl.pallas_call(
        _overlap_fwd_kernel,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec(
                (1, 1, h, w, c),
                lambda i, j: (i, jnp.maximum(j - 1, 0), 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, h, w, c), lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, h, w, c),
                lambda i, j: (i, jnp.minimum(j + 1, t - 1), 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, w, c), lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, x, x)


def spatial_pool_132_supported(shape: Tuple[int, ...]) -> bool:
    """[B, T, H, W, C] with even H/W (SAME pads (0,1) per spatial axis)."""
    return len(shape) == 5 and shape[2] % 2 == 0 and shape[3] % 2 == 0


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def spatial_pool_132(x: jax.Array, interpret: bool = False) -> jax.Array:
    """(1,3,3)/(1,2,2) SAME max pool over NDHWC, Pallas forward."""
    return _fwd_impl(x, interpret)


def _fwd_impl(x, interpret):
    b, t, h, w, c = x.shape
    y = _spatial_fwd(x.reshape(b * t, h, w, c), interpret)
    return y.reshape(b, t, h // 2, w // 2, c)


def _pool_fwd(x, interpret):
    return _fwd_impl(x, interpret), x


def _reduce_window_fwd(x):
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 1, 3, 3, 1),
        window_strides=(1, 1, 2, 2, 1),
        padding=((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)),
    )


def _pool_bwd(interpret, x, dy):
    # exactly the autodiff backward of reduce-window-max: XLA's
    # select-and-scatter-add with the GE (first-match) selector — without
    # re-running the forward when the (private, no-stability-guarantee)
    # primitive is available, else via jax.vjp over reduce_window (one extra
    # forward, same numerics) so a JAX upgrade degrades instead of breaking
    ssa = getattr(lax, "select_and_scatter_add_p", None)
    ge = getattr(lax, "ge_p", None)
    if ssa is not None and ge is not None:
        dx = ssa.bind(
            dy,
            x,
            select_prim=ge,
            window_dimensions=(1, 1, 3, 3, 1),
            window_strides=(1, 1, 2, 2, 1),
            padding=((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)),
        )
    else:
        _, pullback = jax.vjp(_reduce_window_fwd, x)
        (dx,) = pullback(dy)
    return (dx,)


spatial_pool_132.defvjp(_pool_fwd, _pool_bwd)
