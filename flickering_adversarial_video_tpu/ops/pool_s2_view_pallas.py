"""One-pass Pallas routing backward for the STRIDED (3,3)/(2,2) SAME
spatial pool on the T-major view — the follow-on to ops/pool_s1_view_pallas.

What it replaces: `ops/stem_tmajor.strided_pool_view`'s backward, which is
XLA's `select_and_scatter_add` bound on the [H, W, C, T'B] view.  That op is
healthy (458-584 GiB/s in the depth-5c xplane) but still ~2-3x off its HBM
floor, and it re-reads the full x operand besides dy.  This kernel computes
dx in ONE pass over VMEM row-blocks:

  read x block (+2 top / +1 bottom halo rows), dy block (+1 top halo row),
  recompute the W-pooled rows and the pooled outputs IN VMEM (max is
  order-free, so the recompute is bit-identical to the Pallas forward and
  to reduce_window), route first-match H then W, write dx.

Routing equivalence with select-and-scatter (reference semantics
`lax.reduce_window` autodiff, window (3,3,1,1) stride (2,2,1,1) SAME pads
((0,1),(0,1))): the composite window scan order is row-major (dh, dw), and
separable first-match — pick the first window ROW whose W-pooled value
equals the output, then the first column within that row — selects the same
element: the first row containing the window max is the row the composite
scan reaches first, and within it the first column achieving the row max is
the first achieving the window max.  Ties are asserted bit-equal on
engineered integer grids (tests/test_pool_s2_view_pallas.py).

Accumulation: an input cell can be selected by up to FOUR windows (two H
phases x two W phases).  The adds stay in the cotangent dtype but group
(H-sum, then W-sum) instead of select-and-scatter's window-scan order, so
f32/bf16 sums agree to reassociation (bit-equal on integer grids, 1e-6 rel
otherwise) — the same contract as the chain backward this file's stride-1
sibling replaced.

Wired behind FLICKER_S2V_PALLAS in strided_pool_view's VJP (TPU only; the
gate is inert on CPU so tests see the select-and-scatter reference).
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


def _mask_rows(x, r0, h, fill):
    """Zero/-inf rows whose GLOBAL index r0+r falls outside [0, h) (the halo
    specs clamp at the array edge, duplicating a real row there; first-match
    compares need the true SAME-pad value)."""
    rows = x.shape[0]
    ridx = lax.broadcasted_iota(jnp.int32, (rows, 1, 1, 1), 0) + r0
    valid = (ridx >= 0) & (ridx < h)
    return jnp.where(valid, x, jnp.full_like(x, fill))


def _f32(x):
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    x_ref, xt2_ref, xt1_ref, xb1_ref, dy_ref, dyt_ref, o_ref, *, h, hb
):
    """Grid cell (i, j): input rows [2*i*hb, 2*(i+1)*hb), one channel tile.

    Local row frames (r0 = 2*i*hb, o0 = i*hb):
      xe  rows 0..2hb+2  <-> global r0-2 .. r0+2hb
      m_w rows (same as xe)
      y / dye rows 0..hb <-> global output rows o0-1 .. o0+hb-1

    VPU-work revision (round 5, the "~35% less to flip" candidate from the
    round-4 A/B): ONE f32 upcast of the assembled xe (f32 represents every
    bf16 exactly, so all downstream maxes/compares are bit-identical to the
    per-use-cast spelling this replaces — 11 separate tensor casts gone),
    and the SAME-pad row masks are scalar-predicated single-row selects on
    the halo rows only (the main block rows are always in-bounds; the old
    full-block iota mask paid compare+select over every element)."""
    i = pl.program_id(0)
    r0 = i * (2 * hb)
    nblocks = h // (2 * hb)
    neg = -jnp.inf

    # ---- extended x rows r0-2 .. r0+2hb in f32, halo rows masked by the
    # scalar block predicate (top two rows invalid iff i == 0; the bottom
    # halo row r0+2hb is the SAME pad exactly at the last block)
    fill = jnp.full(xt2_ref.shape, neg, jnp.float32)
    top2 = jnp.where(i == 0, fill, _f32(xt2_ref[...]))
    top1 = jnp.where(i == 0, fill, _f32(xt1_ref[...]))
    bot1 = jnp.where(i == nblocks - 1, fill, _f32(xb1_ref[...]))
    xe = jnp.concatenate([top2, top1, _f32(x_ref[...]), bot1], axis=0)

    # ---- W-pooled rows: m_w[r, u] = max(x[r, 2u], x[r, 2u+1], x[r, 2u+2])
    rows, w = xe.shape[0], xe.shape[1]
    wo = w // 2
    xp = xe.reshape(rows, wo, 2, *xe.shape[2:])
    ev, od = xp[:, :, 0], xp[:, :, 1]                 # cols 2u / 2u+1
    pad_col = jnp.full((rows, 1) + xe.shape[2:], neg, xe.dtype)
    ev_n = jnp.concatenate([ev[:, 1:], pad_col], axis=1)   # col 2u+2 (SAME pad)
    m_w = jnp.maximum(jnp.maximum(ev, od), ev_n)      # (2hb+3, wo, ct, n) f32

    # ---- pooled outputs for rows o0-1 .. o0+hb-1 -------------------------
    # output j (global o0-1+j) covers m_w local rows 2j, 2j+1, 2j+2.
    # Step-2 row slices are written as parity reshapes on the MAJOR dim
    # (m_w[a:b:2] lowers to a >2-D gather in Mosaic; the reshape is free).
    m_par = m_w[0 : 2 * hb + 2].reshape(hb + 1, 2, *m_w.shape[1:])
    k0 = m_par[:, 0]                                  # (hb+1, wo, ...)
    k1 = m_par[:, 1]
    k2 = jnp.concatenate([k0[1:], m_w[2 * hb + 2 :]], axis=0)
    y = jnp.maximum(jnp.maximum(k0, k1), k2)

    # ---- dy rows o0-1 .. o0+hb-1; the top halo row is OOB iff i == 0 -----
    dy_fill = jnp.zeros(dyt_ref.shape, dy_ref.dtype)
    dyt = jnp.where(i == 0, dy_fill, dyt_ref[...])
    dye = jnp.concatenate([dyt, dy_ref[...]], axis=0)  # (hb+1, wo, ct, n)

    # ---- H routing: first-match over window rows k = 0, 1, 2 -------------
    yf = y
    cands = (k0, k1, k2)
    taken = None
    gh = []
    for k in range(3):
        eq = cands[k] == yf
        if taken is not None:
            eq = eq & ~taken
        taken = eq if taken is None else taken | eq
        gh.append(dye * eq.astype(dye.dtype))
    # g_w on the block's input rows (global r0+p, p = 0..2hb-1):
    #   p even  = 2q: from (j=q+1, k=0) and (j=q, k=2)
    #   p odd   = 2q+1: from (j=q+1, k=1)
    g_even = gh[0][1:] + gh[2][:hb]                   # (hb, wo, ct, n)
    g_odd = gh[1][1:]

    # ---- W routing on the block rows, per H parity -----------------------
    # candidates at output col u: x cols 2u, 2u+1, 2u+2 == ev, od, ev_n
    # (same parity-reshape spelling as above for all step-2 row picks)
    def rows_par(a):
        return a[2 : 2 * hb + 2].reshape(hb, 2, *a.shape[1:])

    ev_p, od_p, ev_n_p = rows_par(ev), rows_par(od), rows_par(ev_n)
    xc_e = ev_p[:, 0]                                 # block even rows (f32)
    xc_o = od_p[:, 0]
    xc_n = ev_n_p[:, 0]
    pw_par = rows_par(m_w)                            # (hb, 2, wo, ...)
    pw_e, pw_o = pw_par[:, 0], pw_par[:, 1]

    def route_w(g, pwr, ce, co, cn):
        """First-match over window cols k = 0, 1, 2; returns the dx
        contributions landing on even / odd input columns."""
        eq0 = ce == pwr
        eq1 = (co == pwr) & ~eq0
        eq2 = (cn == pwr) & ~(eq0 | eq1)
        c0 = g * eq0.astype(g.dtype)                  # -> col 2u
        c1 = g * eq1.astype(g.dtype)                  # -> col 2u+1
        c2 = g * eq2.astype(g.dtype)                  # -> col 2u+2 = 2(u+1)
        zero_col = jnp.zeros_like(c2[:, :1])
        dx_even = c0 + jnp.concatenate([zero_col, c2[:, :-1]], axis=1)
        return dx_even, c1

    # even input rows use (xc at even block rows), matching pw even rows
    e_ev, e_od = route_w(g_even, pw_e, xc_e, xc_o, xc_n)
    o_ev, o_od = route_w(g_odd, pw_o, ev_p[:, 1], od_p[:, 1], ev_n_p[:, 1])

    # ---- interleave parities back to the (2hb, W) block ------------------
    rows_even = jnp.stack([e_ev, e_od], axis=2).reshape(
        hb, w, *xe.shape[2:]
    )
    rows_odd = jnp.stack([o_ev, o_od], axis=2).reshape(hb, w, *xe.shape[2:])
    o_ref[...] = jnp.stack([rows_even, rows_odd], axis=1).reshape(
        2 * hb, w, *xe.shape[2:]
    )


# ---------------------------------------------------------------------------
# wrapper
# ---------------------------------------------------------------------------

_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel"),
    vmem_limit_bytes=100 * 2**20,
)


def _pick_blocks(h, w, c, n, itemsize):
    """(hb output rows per block, ct channel tile): keep the padded xe block
    (~(2hb+3) full-W rows) under the budget — the f32 temporaries roughly
    triple the live set and v5e has 128 MB VMEM.  FLICKER_S2V_BLOCK_MB
    overrides for re-measurement (round-5 A/B: the v2 kernel's single-f32
    xe doubles the live set vs the bf16-block sizing this budget assumed)."""
    # round-5 chip A/B (headline, FLICKER_S2V_PALLAS=1): budget 8 MB ->
    # 21.15 steps/s (-0.35 vs the s&s default), 4 MB -> 21.42 (parity),
    # 16 MB -> tpu_compile_helper crash (the same Mosaic padded-block
    # ceiling as S1V's >=7 MB).  The v2 kernel's single-f32 xe doubles the
    # live set the old 8 MB sizing assumed — 4 MB is the measured best.
    budget = float(os.environ.get("FLICKER_S2V_BLOCK_MB", "4")) * 2**20
    ho = h // 2
    best = None
    for hb in (8, 7, 4, 2, 1):
        if ho % hb:
            continue
        for ct in (128, 96, 64, 48, 32, 16):
            if c % ct:
                continue
            if (2 * hb + 3) * w * ct * n * itemsize > budget:
                continue
            key = (hb * ct, hb)
            if best is None or key > best[0]:
                best = (key, hb, ct)
    if best is None:
        return None
    return best[1], best[2]


def eligible(shape, itemsize: int = 2) -> bool:
    """4-D view, even H/W (the (0,1) SAME-pad geometry every strided view
    pool has), lane-aligned merged dim, sublane-aligned channel tiles."""
    if len(shape) != 4:
        return False
    h, w, c, n = shape
    return (
        h % 2 == 0
        and w % 2 == 0
        and h >= 4
        and w >= 4
        and n % 128 == 0
        and c % 16 == 0
        and _pick_blocks(h, w, c, n, itemsize) is not None
    )


def gate_on() -> bool:
    """FLICKER_S2V_PALLAS=1 routes eligible strided_pool_view backwards to
    the one-pass routing kernel.  Default off pending the chip A/B."""
    return os.environ.get("FLICKER_S2V_PALLAS", "0") == "1"


def s2_pool_view_bwd_pallas(xv, dy, interpret: bool = False):
    """dx for the (3,3)/(2,2) SAME view pool (reference: select-and-scatter
    over `_pool_view_ref_fwd`), one Pallas pass."""
    h, w, c, n = xv.shape
    hb, ct = _pick_blocks(h, w, c, n, xv.dtype.itemsize)
    grid = (h // 2 // hb, c // ct)

    if not interpret:
        from .accounting import record

        isz = xv.dtype.itemsize
        cells = h // 2 // hb
        # x: 2hb main + 3 halo rows per cell; dy: hb main + 1 halo; dx once
        record(
            f"s2v_bwd_{h}x{w}x{c}",
            hbm_bytes=(
                cells * (2 * hb + 3) * w * c * n * isz
                + cells * (hb + 1) * (w // 2) * c * n * dy.dtype.itemsize
                + h * w * c * n * dy.dtype.itemsize
            ),
        )

    def main_x(i, j):
        return (i, 0, j, 0)

    def xrow(off):
        def imap(i, j):
            return (jnp.clip(i * 2 * hb + off, 0, h - 1), 0, j, 0)

        return imap

    def dyrow(off):
        def imap(i, j):
            return (jnp.clip(i * hb + off, 0, h // 2 - 1), 0, j, 0)

        return imap

    def xr_spec(imap):
        return pl.BlockSpec((1, w, ct, n), imap, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_bwd_kernel, h=h, hb=hb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * hb, w, ct, n), main_x, memory_space=pltpu.VMEM),
            xr_spec(xrow(-2)),
            xr_spec(xrow(-1)),
            xr_spec(xrow(2 * hb)),
            pl.BlockSpec((hb, w // 2, ct, n), main_x, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, w // 2, ct, n), dyrow(-1), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (2 * hb, w, ct, n), main_x, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(xv.shape, dy.dtype),
        compiler_params=_PARAMS,
        interpret=interpret,
    )(xv, xv, xv, xv, dy, dy)
