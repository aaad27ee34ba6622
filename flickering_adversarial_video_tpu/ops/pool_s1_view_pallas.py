"""Fused Pallas forward/backward for the stride-1 (3,3,3) SAME branch pool
on the T-major view — the round-3 "loop fusion" lever.

What it replaces: `ops/stem_tmajor.stride1_pool333_view`'s XLA lowering.
That path is exact and fuses well, but it is traffic-heavy by construction:
the separable forward materializes two full-size intermediates (m_w, m_hw)
as custom-VJP residuals, and the three routing stages of the backward each
read (g, pooled, source) and write g — ~18 tensor-traversals of HBM per
branch_3 pool.  The depth-5c xplane (2026-08-19, 58.4 ms step) shows those
chains as the 15.5 ms "loop fusion" bucket running 1.3-2.7x off per-op SoL
(broadcast_select_fusion.1/.3 at 2.1x, fusion.2 at 2.7x).

These kernels compute each direction in ONE pass over VMEM blocks:

  forward : read x (+1 halo row each side), write y           ~2 traversals
  backward: read x (+2 halo rows), dy (+1), write dx          ~3 traversals
            (m_w / m_hw / y are recomputed IN VMEM — the residual is x only)

The view layout [H, W, C, T'B] makes this kernel-friendly everywhere the
round-2 b-major pool kernels were hostile: H/W are untiled major dims
(shift-max = cheap concat-slices), C rides sublanes, and the merged T'B
lane dim turns the temporal window into a lane roll by ±B (`pltpu.roll`)
with an iota edge mask.

Exactness: bit-identical to the chain (tests/test_pool_s1_view_pallas.py,
engineered integer ties) —
  * values: max is order-free; SAME -inf pads == masked candidates;
  * gradients: the same first-match routing in the same T, H, W stage
    order, with compares upcast to f32 (Mosaic has no bf16 ==; the upcast
    is exact) and the contribution adds kept in the cotangent dtype, so
    even the up-to-3-way bf16 accumulations round identically.

Wired behind FLICKER_S1V_PALLAS in stride1_pool333_view; per-direction
gates (FLICKER_S1V_PALLAS_FWD) exist because the forward chain may fuse
into neighboring conv epilogues where a kernel boundary cannot — both
directions are A/B'd separately on the chip (results in PERF.md).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _neg_inf(dtype):
    return jnp.asarray(-jnp.inf, dtype)


# ---------------------------------------------------------------------------
# shared in-VMEM pieces
# ---------------------------------------------------------------------------


def _mask_rows(x, r0, h, fill):
    """Replace rows whose GLOBAL index r0+r falls outside [0, h) with `fill`.
    The halo specs clamp their index maps at the array edge, so edge blocks
    load a duplicated real row there; this restores the -inf/0 SAME-pad
    semantics the routing compares require (max-replication is only valid
    for the forward's values, not for first-match ties)."""
    rows = x.shape[0]
    ridx = lax.broadcasted_iota(jnp.int32, (rows, 1, 1, 1), 0) + r0
    valid = (ridx >= 0) & (ridx < h)
    return jnp.where(valid, x, jnp.full_like(x, fill))


def _shift_w(x, s, fill):
    """out[:, j] = x[:, j+s] with `fill` beyond the edge (W = dim 1)."""
    if s == 0:
        return x
    pad = jnp.full(x.shape[:1] + (abs(s),) + x.shape[2:], fill, x.dtype)
    if s > 0:
        return jnp.concatenate([x[:, s:], pad], axis=1)
    return jnp.concatenate([pad, x[:, :s]], axis=1)


def _lane_idx(n):
    return lax.broadcasted_iota(jnp.int32, (1, 1, 1, n), 3)


def _shift_t(x, s_units, b, fill):
    """out[..., l] = x[..., l + s_units*B] on the merged T'B lane dim, with
    `fill` past the temporal edge — a lane roll + iota mask."""
    if s_units == 0:
        return x
    n = x.shape[3]
    s = s_units * b
    # pltpu.roll requires a non-negative shift, and current Mosaic only
    # implements lane rotates for 32-bit element types.  The roll is
    # circular with the wrapped lanes masked below, so the modular shift is
    # equivalent, and the f32 round-trip is exact (pure data movement).
    xr = x if x.dtype.itemsize == 4 else x.astype(jnp.float32)
    rolled = pltpu.roll(xr, shift=(-s) % n, axis=3).astype(x.dtype)
    lanes = _lane_idx(n)
    valid = lanes < (n - s) if s > 0 else lanes >= -s
    return jnp.where(valid, rolled, jnp.full_like(x, fill))


def _shift_t_f32(xf, s_units, b, fill):
    """_shift_t for an ALREADY-f32 operand, staying in f32 — the T-stage
    candidates need f32 for the routing compares anyway, so sharing one
    upcast saves 2-3 full-tensor casts per candidate (pure data movement,
    bit-identical: f32 represents every bf16 exactly)."""
    if s_units == 0:
        return xf
    n = xf.shape[3]
    s = s_units * b
    rolled = pltpu.roll(xf, shift=(-s) % n, axis=3)
    lanes = _lane_idx(n)
    valid = lanes < (n - s) if s > 0 else lanes >= -s
    return jnp.where(valid, rolled, jnp.full_like(xf, fill))


def _max_w(x):
    neg = _neg_inf(x.dtype)
    return jnp.maximum(jnp.maximum(x, _shift_w(x, 1, neg)), _shift_w(x, -1, neg))


def _max_t(x, b):
    neg = _neg_inf(x.dtype)
    return jnp.maximum(
        jnp.maximum(x, _shift_t(x, 1, b, neg)), _shift_t(x, -1, b, neg)
    )


def _f32(x):
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# forward kernel: y = maxT(maxH(maxW(x)))
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, xt_ref, xb_ref, o_ref, *, b, h, hb):
    # No SAME-pad row mask needed for VALUES: the halo specs clamp at the
    # array edge, so an out-of-range halo row duplicates a real row already
    # inside every window it joins — max(x, x, ...) == max(x, -inf, ...).
    # (The backward's first-match ROUTING still needs true -inf pads; only
    # the forward drops the mask.)  Round-5 VPU-work trim.
    xe = jnp.concatenate([xt_ref[...], x_ref[...], xb_ref[...]], axis=0)
    m_w = _max_w(xe)
    # m_hw[m] = max(m_w[m], m_w[m+1], m_w[m+2]) -> global row r0+1+m = i*hb+m
    m_hw = jnp.maximum(jnp.maximum(m_w[:hb], m_w[1 : hb + 1]), m_w[2 : hb + 2])
    # T stage on a single shared f32 upcast (the rolls need 32-bit anyway;
    # f32 max of exact bf16 values == bf16 max, so the downcast is exact)
    neg = -jnp.inf
    mf = _f32(m_hw)
    yf = jnp.maximum(
        jnp.maximum(mf, _shift_t_f32(mf, 1, b, neg)),
        _shift_t_f32(mf, -1, b, neg),
    )
    o_ref[...] = yf.astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernel: one-pass first-match routing (T, then H, then W)
# ---------------------------------------------------------------------------


def _bwd_kernel(
    x_ref, xt2_ref, xt1_ref, xb1_ref, xb2_ref,
    dy_ref, dyt_ref, dyb_ref, o_ref, *, b, h, hb,
):
    i = pl.program_id(0)
    neg = -jnp.inf

    # x rows r0-2 .. r0+hb+1, in f32 (ONE upcast; f32 embeds bf16 exactly,
    # so every downstream max/compare is bit-identical to the old per-use
    # casts — round-5 VPU-work trim).  Halo rows masked by SCALAR block
    # predicates: rows r0-2/r0-1 are OOB only at the first block, rows
    # r0+hb/r0+hb+1 only at the last (hb >= 2 from _pick_blocks).
    r0 = i * hb
    fill = jnp.full(xt2_ref.shape, neg, jnp.float32)
    top2 = jnp.where(r0 - 2 < 0, fill, _f32(xt2_ref[...]))
    top1 = jnp.where(r0 - 1 < 0, fill, _f32(xt1_ref[...]))
    bot1 = jnp.where(r0 + hb > h - 1, fill, _f32(xb1_ref[...]))
    bot2 = jnp.where(r0 + hb + 1 > h - 1, fill, _f32(xb2_ref[...]))
    xe = jnp.concatenate([top2, top1, _f32(x_ref[...]), bot1, bot2], axis=0)
    m_w = _max_w(xe)                                  # rows r0-2 .. r0+hb+1
    # m_hw rows r0-1 .. r0+hb  (index j -> global r0-1+j, j = 0..hb+1)
    m_hw = jnp.maximum(
        jnp.maximum(m_w[: hb + 2], m_w[1 : hb + 3]), m_w[2 : hb + 4]
    )

    # dy rows r0-1 .. r0+hb; the halo rows contribute zero gradient OOB
    dy_fill = jnp.zeros(dyt_ref.shape, dy_ref.dtype)
    dyt = jnp.where(r0 - 1 < 0, dy_fill, dyt_ref[...])
    dyb = jnp.where(r0 + hb > h - 1, dy_fill, dyb_ref[...])
    dye = jnp.concatenate([dyt, dy_ref[...], dyb], axis=0)

    # ---- T routing: window t-1, t, t+1 in ascending order --------------
    # (matches _route_axis on the 5-D T' dim: dx[t] = sum_k contrib_k[t+1-k],
    # cand_k[t] = m_hw[t+k-1], first-match over ascending k).
    # y is recomputed from the SAME three f32 candidates (f32 represents
    # every bf16 exactly, so this equals the forward's bf16 _max_t bit for
    # bit), and no explicit lane edge masks are needed: the shifts fill
    # past-the-edge lanes with -inf, which can never equal the finite
    # pooled maximum.
    m_hw_f = m_hw  # already f32 (single upcast at xe)
    cands = [_shift_t_f32(m_hw_f, s, b, neg) for s in (-1, 0, 1)]
    yf = jnp.maximum(jnp.maximum(cands[0], cands[1]), cands[2])
    gt = None
    taken = None
    for k in range(3):
        s = k - 1  # candidate = m_hw[t + s]
        eq = cands[k] == yf
        if taken is not None:
            eq = eq & ~taken
        taken = eq if taken is None else taken | eq
        contrib = dye * eq.astype(dye.dtype)
        back = _shift_t(contrib, -s, b, 0.0)          # dx[t+s] += contrib[t]
        gt = back if gt is None else gt + back

    # ---- H routing: distribute gt (on m_hw rows) onto m_w rows ---------
    # cand_k at pooled row j (global r0-1+j) is m_w[j+k] (global r0-2+j+k);
    # first-match over ascending k; source-row gradient
    # g_w[m] = sum_k contrib_k[m + 2 - k]  (m = 0..hb-1, global row r0+m).
    m_w_f = m_w  # already f32
    taken = None
    contribs = []
    for k in range(3):
        eq = m_w_f[k : k + hb + 2] == m_hw_f
        if taken is not None:
            eq = eq & ~taken
        taken = eq if taken is None else taken | eq
        contribs.append(gt * eq.astype(gt.dtype))
    g_w = (
        contribs[0][2 : hb + 2]
        + contribs[1][1 : hb + 1]
        + contribs[2][:hb]
    )

    # ---- W routing: in-row, window w-1, w, w+1 ascending ----------------
    xc = xe[2 : hb + 2]                               # source rows (f32)
    pw = m_w[2 : hb + 2]                        # pooled (same rows)
    taken = None
    acc = None
    for k in range(3):
        s = k - 1
        cand = _shift_w(xc, s, neg)
        eq = cand == pw
        if taken is not None:
            eq = eq & ~taken
        taken = eq if taken is None else taken | eq
        contrib = g_w * eq.astype(g_w.dtype)
        back = _shift_w(contrib, -s, 0.0)
        acc = back if acc is None else acc + back
    o_ref[...] = acc


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _pick_blocks(h, w, c, n, itemsize):
    """(hb, ct): rows per block / channel tile.

    The 4 halo rows are pure re-read overhead, so the first-order cost
    model is halo redundancy (hb+4)/hb: prefer the TALLEST block that
    fits, then the widest channel tile.  The round-3 default capped the
    padded block at 1.5 MB (hb=2 on the Mixed_3b/3c shapes = 3x redundant
    x reads); the chip A/B (scripts/ab_s1v_blocks.py, 2026-08-20) measured
    taller blocks strictly faster — Mixed_3b bwd 1.52 -> 1.12 ms at
    (14,16), Mixed_3c 2.05 -> 1.49, Mixed_4x 0.51 -> 0.27 at (14,64) —
    up to a hard Mosaic ceiling: padded blocks >= ~7 MB crash
    tpu_compile_helper (every (4,64)/(14,32)@W28/(28,16) config), so the
    default budget sits at 5.5 MB, just above the largest measured-good
    block (5.04 MB).  FLICKER_S1V_BLOCK_MB / FLICKER_S1V_BLOCKS override
    for re-measurement."""
    forced = os.environ.get("FLICKER_S1V_BLOCKS", "")
    if forced:
        hb, ct = (int(v) for v in forced.split(","))
        return (hb, ct) if (h % hb == 0 and c % ct == 0) else None
    budget = float(os.environ.get("FLICKER_S1V_BLOCK_MB", "5.5")) * 2**20
    best = None
    for hb in (28, 16, 14, 8, 7, 4, 2):
        if h % hb:
            continue
        for ct in (128, 96, 64, 48, 32, 16):
            if c % ct:
                continue
            if (hb + 4) * w * ct * n * itemsize > budget:
                continue
            # rank: least halo redundancy first, then widest channel tile
            key = (hb, ct)
            if best is None or key > (best[0], best[1]):
                best = (hb, ct)
    if best is None:
        return None
    return best


def eligible(shape, b, itemsize: int = 2) -> bool:
    """Static geometry gate for the fused kernels: 4-D view, merged lanes
    128-aligned (excludes the tiny 7x7 Mixed_5 pools at T'B=64), sublane-
    aligned channel tiles, and a block picker that fits VMEM."""
    if len(shape) != 4:
        return False
    h, w, c, n = shape
    return (
        n % 128 == 0
        and n % b == 0
        and c % 16 == 0
        and w >= 3
        and h >= 3
        and _pick_blocks(h, w, c, n, itemsize) is not None
    )


def _row_spec(w, ct, n, imap):
    return pl.BlockSpec((1, w, ct, n), imap, memory_space=pltpu.VMEM)


# The routing backward keeps ~20 block-sized vregs live (xe/m_w/m_hw/y/dye
# plus the per-k f32 candidates); Mosaic's default 16 MB scoped-VMEM stack
# is too small for the Mixed_3b geometry at the block sizes worth running.
# v5e has 128 MB VMEM — give the stack room and mark the grid parallel.
_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel"),
    vmem_limit_bytes=100 * 2**20,
)


def _fwd_impl(xv, b, interpret):
    h, w, c, n = xv.shape
    hb, ct = _pick_blocks(h, w, c, n, xv.dtype.itemsize)
    grid = (h // hb, c // ct)
    if not interpret:
        from .accounting import record

        isz = xv.dtype.itemsize
        # reads: main block + 2 halo rows per grid cell; writes: y once
        record(
            f"s1v_fwd_{h}x{w}x{c}",
            hbm_bytes=(h // hb) * (hb + 2) * w * c * n * isz
            + h * w * c * n * isz,
        )

    def main_map(i, j):
        return (i, 0, j, 0)

    def top_map(i, j):
        return (jnp.maximum(i * hb - 1, 0), 0, j, 0)

    def bot_map(i, j):
        return (jnp.minimum(i * hb + hb, h - 1), 0, j, 0)

    return pl.pallas_call(
        partial(_fwd_kernel, b=b, h=h, hb=hb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((hb, w, ct, n), main_map, memory_space=pltpu.VMEM),
            _row_spec(w, ct, n, top_map),
            _row_spec(w, ct, n, bot_map),
        ],
        out_specs=pl.BlockSpec((hb, w, ct, n), main_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xv.shape, xv.dtype),
        compiler_params=_PARAMS,
        interpret=interpret,
    )(xv, xv, xv)


def _bwd_impl(xv, dy, b, interpret):
    h, w, c, n = xv.shape
    hb, ct = _pick_blocks(h, w, c, n, xv.dtype.itemsize)
    grid = (h // hb, c // ct)
    if not interpret:
        from .accounting import record

        isz = xv.dtype.itemsize
        # reads: x main + 4 halo rows, dy main + 2 halo rows; writes: dx once
        record(
            f"s1v_bwd_{h}x{w}x{c}",
            hbm_bytes=(h // hb) * (hb + 4) * w * c * n * isz
            + (h // hb) * (hb + 2) * w * c * n * dy.dtype.itemsize
            + h * w * c * n * dy.dtype.itemsize,
        )

    def main_map(i, j):
        return (i, 0, j, 0)

    def row(off):
        def imap(i, j):
            return (jnp.clip(i * hb + off, 0, h - 1), 0, j, 0)

        return imap

    def bot(off):
        def imap(i, j):
            return (jnp.clip(i * hb + hb + off, 0, h - 1), 0, j, 0)

        return imap

    return pl.pallas_call(
        partial(_bwd_kernel, b=b, h=h, hb=hb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((hb, w, ct, n), main_map, memory_space=pltpu.VMEM),
            _row_spec(w, ct, n, row(-2)),
            _row_spec(w, ct, n, row(-1)),
            _row_spec(w, ct, n, bot(0)),
            _row_spec(w, ct, n, bot(1)),
            pl.BlockSpec((hb, w, ct, n), main_map, memory_space=pltpu.VMEM),
            _row_spec(w, ct, n, row(-1)),
            _row_spec(w, ct, n, bot(0)),
        ],
        out_specs=pl.BlockSpec((hb, w, ct, n), main_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xv.shape, dy.dtype),
        compiler_params=_PARAMS,
        interpret=interpret,
    )(xv, xv, xv, xv, xv, dy, dy, dy)


# ---------------------------------------------------------------------------
# custom VJP (residual: x only)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def s1_pool333_view_pallas(xv: jax.Array, b: int, interpret: bool = False):
    """(3,3,3)/(1,1,1) SAME max pool on the [H, W, C, T'B] view, fused
    Pallas backward (and optionally forward).  Bit-identical to
    ops/stem_tmajor.stride1_pool333_view (= reduce_window autodiff)."""
    return _dispatch_fwd(xv, b, interpret)


def _fwd_gate() -> bool:
    """FLICKER_S1V_PALLAS_FWD=0 restores the chain FORWARD (whose max
    stages can fuse into neighboring conv epilogues).  Default ON: the
    chip A/B (scripts/ab_headline_gate.py, 2026-08-20) measured the Pallas
    forward as a further win on top of the Pallas backward — headline
    18.36 -> 18.92 steps/s — the one-pass VMEM recompute beats the fused
    chain's extra HBM traversals."""
    return os.environ.get("FLICKER_S1V_PALLAS_FWD", "1") == "1"


def _chain_fwd(xv, b):
    """The stem_tmajor chain forward (bit-identical values; with no m_w /
    m_hw residuals saved, XLA is free to fuse the stages)."""
    from .maxpool import _pool_axis, _pool_axis_overlap
    from .stem_tmajor import _t_axis_5d

    m_w = _pool_axis_overlap(xv, 1, 3)
    m_hw = _pool_axis_overlap(m_w, 0, 3)
    y5 = _pool_axis(_t_axis_5d(m_hw, b), 3, 3, 1)
    return y5.reshape(xv.shape)


def _dispatch_fwd(xv, b, interpret):
    if not interpret and not _fwd_gate():
        return _chain_fwd(xv, b)
    return _fwd_impl(xv, b, interpret)


def _vjp_fwd(xv, b, interpret):
    return _dispatch_fwd(xv, b, interpret), xv


def _vjp_bwd(b, interpret, xv, dy):
    return (_bwd_impl(xv, dy, b, interpret),)


s1_pool333_view_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def gate_on() -> bool:
    """FLICKER_S1V_PALLAS=0 restores the separable-chain lowering for the
    stride-1 view pools (TPU only either way; CPU keeps the chain so the
    gate is inert in tests).  Default ON: chip A/B 2026-08-20 measured the
    fused one-pass kernels at 16.79 -> 18.92 steps/s end to end on the
    T=64 B=8 headline (the depth-5c step's 15.5 ms loop-fusion bucket is
    the chain's ~18 HBM traversals per pool; the kernels do one)."""
    return os.environ.get("FLICKER_S1V_PALLAS", "1") == "1"
