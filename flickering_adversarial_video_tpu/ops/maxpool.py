"""SAME max pooling with a scatter-free, first-match separable backward.

Why: XLA differentiates reduce-window-max into `select-and-scatter`, which on
TPU runs at 28-37 GiB/s for the overlapping 3x3x3/stride-1 pools inside the
I3D Inception blocks — ~27 ms of a 126 ms attack step goes to nine of these
(xplane profile, PERF.md round 2).  The reference's victims pool with
tf.nn.max_pool3d (i3d.py:204 et seq.), whose gradient routes each window's
cotangent to the FIRST maximal element in row-major window order — the same
choice XLA's select-and-scatter makes (GE select keeps the earlier of equal
candidates).

This op keeps the forward as a plain reduce-window (identical values) and
replaces the backward with a *separable routing* pass built only from pads,
strided slices, compares and adds — everything fuses on the VPU:

  m_w  = pool_W(x);  m_hw = pool_H(m_w);  y = pool_T(m_hw)
  route dy along T (compare m_hw slices vs y, first match wins)  -> g_hw
  route g_hw along H (compare m_w slices vs m_hw)                -> g_w
  route g_w along W (compare x slices vs m_w)                    -> dx

Routing first-along-T, then H, then W reproduces the row-major
(lexicographic) first-argmax exactly, so dx matches XLA's own
select-and-scatter bit for bit — asserted including engineered ties in
tests/test_maxpool.py.

The per-tap scatter uses the fixed-tap disjointness of strided windows:
for a fixed in-window offset k, target positions {w*s + k} never collide, so
the accumulation is a static slice-add on a [rows, s] reshape — no scatter
HLO is ever emitted.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _same_pads(n: int, w: int, s: int) -> Tuple[int, int, int]:
    """TF SAME: (out, pad_lo, pad_hi) for size n, window w, stride s."""
    out = -(-n // s)
    pad_total = max((out - 1) * s + w - n, 0)
    pad_lo = pad_total // 2
    return out, pad_lo, pad_total - pad_lo


def _pool_axis(x: jax.Array, axis: int, w: int, s: int) -> jax.Array:
    """1-D SAME max pool along `axis` of an NDHWC array."""
    if w == 1 and s == 1:
        return x
    if _parity_eligible(x.shape[axis], w, s):
        return _pool_axis_parity(x, axis, w)
    if s == 1 and _sepfwd() in ("1", "2"):
        return _pool_axis_overlap(x, axis, w)
    window = [1] * x.ndim
    strides = [1] * x.ndim
    window[axis] = w
    strides[axis] = s
    return lax.reduce_window(x, -jnp.inf, lax.max, window, strides, "SAME")


def _sepfwd() -> bool:
    """FLICKER_POOL_SEPFWD: stride-1 pool forwards (and their backward
    recomputes) as separable elementwise shifted-slice max chains instead of
    reduce-window.  The 3-D reduce-window forward of the overlapping
    Inception-branch pools runs at 76 GiB/s on TPU (xplane rounds 2-3, 6.3 ms
    of the 81 ms step) while the identically-shaped slice/pad/compare loop
    fusions of the routing backward run at 350-770 GiB/s — this moves the
    forward onto that second lowering.  Values are bit-identical: max is
    separable, SAME pads compose (pad value is the max identity), and the
    candidate set per output is the same elements.  Modes: =1 separable
    (three 1-D passes, pad once + static slice per tap); =2 one-pass (single
    -inf pad + w^3 static slices + tree max in ONE fusion, one output write).
    ALL measured negative end to end vs the 11.936 steps/s reduce-window
    default (2026-08-18 chip A/Bs, PERF.md): per-tap-pad separable 10.56,
    pad-once separable 11.73, one-pass 11.59 — even the byte-saving forms
    lose (VPU-issue-bound max chains + broken neighbor fusions).  Kept gated
    for future-toolchain A/B; default OFF."""
    return os.environ.get("FLICKER_POOL_SEPFWD", "")


def _pool_axis_overlap(x: jax.Array, axis: int, w: int) -> jax.Array:
    """1-D SAME max pool, stride 1, any w: pad ONCE with -inf, then
    elementwise max over w static slices of the padded tensor — one pad op
    feeding one loop fusion (the per-tap slice+pad form materialized a pad
    per tap and measured net-negative)."""
    n = x.shape[axis]
    _, pad_lo, pad_hi = _same_pads(n, w, 1)
    pad_cfg = [(0, 0)] * x.ndim
    pad_cfg[axis] = (pad_lo, pad_hi)
    xp = jnp.pad(x, pad_cfg, constant_values=jnp.asarray(-jnp.inf, x.dtype))
    acc = None
    for k in range(w):
        cand = lax.slice_in_dim(xp, k, k + n, 1, axis=axis)
        acc = cand if acc is None else lax.max(acc, cand)
    return acc


def _pool_overlap_onepass(x, window):
    """3-D SAME max pool, all strides 1: ONE -inf pad + prod(window) static
    slices + tree max — a single loop fusion with a single output write."""
    pads = [_same_pads(x.shape[i + 1], w, 1)[1:] for i, w in enumerate(window)]
    pad_cfg = [(0, 0)] + [(lo, hi) for lo, hi in pads] + [(0, 0)]
    xp = jnp.pad(x, pad_cfg, constant_values=jnp.asarray(-jnp.inf, x.dtype))
    acc = None
    for kt in range(window[0]):
        for kh in range(window[1]):
            for kw in range(window[2]):
                cand = lax.slice(
                    xp,
                    (0, kt, kh, kw, 0),
                    (
                        x.shape[0],
                        kt + x.shape[1],
                        kh + x.shape[2],
                        kw + x.shape[3],
                        x.shape[4],
                    ),
                )
                acc = cand if acc is None else lax.max(acc, cand)
    return acc


def _parity_eligible(n: int, w: int, s: int) -> bool:
    """Axis pools expressible on a free (cell, parity) split of the axis.

    FLICKER_POOL_NOPARITY=1 disables the parity forms so the generic
    pad+add+stack routing handles strided pools — A/B knob for geometries
    where the parity interleave layout is hostile (PERF.md round 2/3).

    SAME with s=2 and even n gives pad_lo=0, so output o reads positions
    2o..2o+w-1: for w=3 that is cells (o,0),(o,1),(o+1,0); for w=2 just
    (o,0),(o,1).  Both become elementwise max over parity slices — no
    reduce_window (measured 76 GiB/s on the MaxPool2a geometry) and no
    select-and-scatter in the backward (17-37 GiB/s on B=1/overlap shapes)."""
    if os.environ.get("FLICKER_POOL_NOPARITY", "") == "1":
        return False
    return s == 2 and w in (2, 3) and n % 2 == 0


def _parity_split(x: jax.Array, axis: int):
    """(a, b): even/odd elements along `axis` via a free (n/2, 2) reshape."""
    n = x.shape[axis]
    shape = list(x.shape)
    shape[axis : axis + 1] = [n // 2, 2]
    xr = x.reshape(shape)
    a = lax.index_in_dim(xr, 0, axis + 1, keepdims=False)
    b = lax.index_in_dim(xr, 1, axis + 1, keepdims=False)
    return a, b


def _shift_down(x: jax.Array, axis: int, fill) -> jax.Array:
    """x[i] <- x[i+1], last element <- fill (one slice + one pad, fusible)."""
    n = x.shape[axis]
    sl = lax.slice_in_dim(x, 1, n, 1, axis=axis)
    pad_cfg = [(0, 0)] * x.ndim
    pad_cfg[axis] = (0, 1)
    return jnp.pad(sl, pad_cfg, constant_values=fill)


def _shift_up(x: jax.Array, axis: int, fill) -> jax.Array:
    """x[i] <- x[i-1], first element <- fill."""
    n = x.shape[axis]
    sl = lax.slice_in_dim(x, 0, n - 1, 1, axis=axis)
    pad_cfg = [(0, 0)] * x.ndim
    pad_cfg[axis] = (1, 0)
    return jnp.pad(sl, pad_cfg, constant_values=fill)


def _pool_axis_parity(x: jax.Array, axis: int, w: int) -> jax.Array:
    """1-D SAME max pool, w in (2,3), s=2, even extent — parity-split form."""
    a, b = _parity_split(x, axis)
    y = lax.max(a, b)
    if w == 3:
        neg = jnp.asarray(-jnp.inf, x.dtype)
        y = lax.max(y, _shift_down(a, axis, neg))
    return y


def _route_axis_parity(
    g: jax.Array, pooled: jax.Array, source: jax.Array, axis: int, w: int
) -> jax.Array:
    """First-match routing for the parity pools, entirely in parity space.

    Window order along the axis is ascending position (2o, 2o+1, 2o+2), so
    first-match masks go a -> b -> a_next; the two parity gradients then
    interleave via ONE stack + free reshape.  Equals XLA's select-and-scatter
    GE tie rule (asserted in tests/test_maxpool.py)."""
    a, b = _parity_split(source, axis)
    e_a = a == pooled
    e_b = (b == pooled) & ~e_a
    dx_a = g * e_a.astype(g.dtype)
    dx_b = g * e_b.astype(g.dtype)
    if w == 3:
        neg = jnp.asarray(-jnp.inf, source.dtype)
        a_next = _shift_down(a, axis, neg)
        e_n = (a_next == pooled) & ~(e_a | e_b)
        # contribution lands one cell later on the even parity
        dx_a = dx_a + _shift_up(g * e_n.astype(g.dtype), axis, 0)
    dx = jnp.stack([dx_a, dx_b], axis=axis + 1)
    return dx.reshape(source.shape)


def _route_axis(
    g: jax.Array,
    pooled: jax.Array,
    source: jax.Array,
    axis: int,
    w: int,
    s: int,
) -> jax.Array:
    """Distribute cotangent g (on the pooled grid along `axis`) back onto the
    source grid, first-match-wins within each window.

    pooled = pool_axis(source, axis, w, s) — recomputed by the caller.
    All other axes of g/pooled/source already agree.
    """
    if w == 1 and s == 1:
        return g
    n = source.shape[axis]
    if _parity_eligible(n, w, s):
        return _route_axis_parity(g, pooled, source, axis, w)
    out, pad_lo, pad_hi = _same_pads(n, w, s)
    # pad so every tap's strided slice is in range
    lo_pad_cfg = [(0, 0)] * source.ndim
    hi_extra = max(0, (out - 1) * s + w - (n + pad_lo + pad_hi))
    lo_pad_cfg[axis] = (pad_lo, pad_hi + hi_extra)
    neg = jnp.asarray(jnp.finfo(source.dtype).min, source.dtype)
    src_pad = jnp.pad(source, lo_pad_cfg, constant_values=neg)

    taken = jnp.zeros(pooled.shape, jnp.bool_)

    if s == 1:
        # overlapping windows: accumulate as pad+add chains — explicit
        # jnp.pad fuses reliably, whereas .at[slice].add lowers to real
        # dynamic-update-slices at 36 GiB/s on B=1 shapes (PERF.md round 2)
        pad_len = src_pad.shape[axis]
        acc = None
        for k in range(w):
            cand = lax.slice_in_dim(src_pad, k, k + out, 1, axis=axis)
            eq = (cand == pooled) & ~taken
            taken = taken | eq
            contrib = g * eq.astype(g.dtype)
            pad_cfg = [(0, 0)] * source.ndim
            pad_cfg[axis] = (k, pad_len - out - k)
            shifted = jnp.pad(contrib, pad_cfg)
            acc = shifted if acc is None else acc + shifted
        return lax.slice_in_dim(acc, pad_lo, pad_lo + n, 1, axis=axis)

    # strided windows: for a fixed tap k the target positions {w*s + k} never
    # collide, so accumulate on an axis split as (rows, s): row r, col c <->
    # position r*s + c.  Per-column accumulation is pad+add chains (same
    # DUS-avoidance as the stride-1 branch) and the columns interleave via
    # ONE stack — no .at[].add, no scatter, no dynamic-update-slice.
    rows = out + -(-w // s)
    per_col = [None] * s
    # taps must be visited in ascending k for the first-match rule, so run
    # the compare pass first, then group contributions by column
    contribs = []
    for k in range(w):
        cand = lax.slice_in_dim(src_pad, k, k + (out - 1) * s + 1, s, axis=axis)
        eq = (cand == pooled) & ~taken
        taken = taken | eq
        contribs.append(g * eq.astype(g.dtype))
    for c in range(s):
        col_acc = None
        for k in range(c, w, s):
            row0 = k // s
            pad_cfg = [(0, 0)] * source.ndim
            pad_cfg[axis] = (row0, rows - out - row0)
            shifted = jnp.pad(contribs[k], pad_cfg)
            col_acc = shifted if col_acc is None else col_acc + shifted
        if col_acc is None:
            zero_shape = list(source.shape)
            zero_shape[axis] = rows
            col_acc = jnp.zeros(zero_shape, g.dtype)
        per_col[c] = col_acc
    acc = jnp.stack(per_col, axis=axis + 1)  # [..., rows, s, ...]
    flat_shape = list(source.shape)
    flat_shape[axis] = rows * s
    acc = acc.reshape(flat_shape)
    return lax.slice_in_dim(acc, pad_lo, pad_lo + n, 1, axis=axis)


def max_pool_same(
    x: jax.Array,
    window: Tuple[int, int, int],
    strides: Tuple[int, int, int],
    force_custom: bool = False,
) -> jax.Array:
    """tf.nn.max_pool3d(..., padding='SAME') over NDHWC.

    Stride-1 pools (the overlapping 3x3x3 Inception-branch pools, where
    XLA's select-and-scatter runs at 28-37 GiB/s) take the custom separable
    backward; strided pools keep XLA's autodiff at EVERY batch size — its
    select-and-scatter is memory-healthy at batch>1 (354-586 GiB/s measured
    in-step), and although it collapses to 17 GiB/s at B=1 (PERF.md round 2
    single-video profile), both measured replacements lost end to end
    (round 3, T=64 B=8 headline / T=90 B=1 single-video):
      * generic strided routing (pad+add+stack): 24.1 -> 23.4 steps/s B=1;
      * parity-split forward+routing (free (cell,parity) reshapes,
        elementwise max / mask-route): 11.33 -> 7.47 steps/s headline,
        HBM bytes/step 48 -> 87 GB — the parity slices sit next to the
        64-channel minor dim (half a lane tile) and XLA materializes
        layout-hostile interleave copies, the same trap as the round-2
        "free-reshape W-split" negative result.
    Both implementations stay (exact-parity tested, incl. ties) behind
    `force_custom` for future A/B on other geometries/toolchains.
    """
    if (
        force_custom
        or os.environ.get("FLICKER_POOL_FORCE_CUSTOM", "") == "1"
        or all(s == 1 for s in strides)
        # pool4a-only A/B: its b-major (2,2,2)-strided select-and-scatter is
        # the worst remaining op in the 67 ms step (1.66 ms at 224 GiB/s,
        # 3.3x off SoL — xplane 2026-08-19); the generic routing was only
        # ever measured for ALL strided pools at once
        or (
            os.environ.get("FLICKER_POOL_CUSTOM4A", "") == "1"
            and tuple(window) == (3, 3, 3)
            and tuple(strides) == (2, 2, 2)
        )
    ):
        return _max_pool_custom(x, tuple(window), tuple(strides))
    # Chip A/Bs 2026-08-18 (T=64 B=8 headline): Pallas pool2a-only 12.83
    # steps/s vs 11.94 reduce-window default (+7.4%); including pool3a
    # 12.26 (its Conv2c-relu faces pay relayout copies); the paired
    # fwd+idx/routing-bwd kernels 9.65 (kernel cost dwarfs the copy win).
    # Hence the defaults: 2A on, 3A off, pair off.
    pallas_2a = os.environ.get("FLICKER_POOL_PALLAS_2A", "1")
    if (
        pallas_2a in ("1", "2")
        and tuple(window) == (1, 3, 3)
        and tuple(strides) == (1, 2, 2)
        and x.ndim == 5
        and x.shape[2] % 2 == 0
        and x.shape[3] % 2 == 0
        and jax.default_backend() == "tpu"
        # the kernel's [H,W,C,BT] view puts B*T on lanes: require lane
        # alignment (the T=90 slots=4 vector sweep has BT=180 -> padded to
        # 256, measured 42.2 -> 28.8 clip-steps/s; the headline's BT=256 is
        # exact)
        and (x.shape[0] * x.shape[1]) % 128 == 0
        # FLICKER_POOL_PALLAS_3A=1 extends the gate beyond MaxPool2a (C=64)
        and not (
            os.environ.get("FLICKER_POOL_PALLAS_3A", "0") == "0"
            and x.shape[4] != 64
        )
    ):
        # FLICKER_POOL_PALLAS_2A: MaxPool2a/3a through Pallas kernels — the
        # reduce-window lowering of pool2a is the single worst op in the
        # headline step (6.1 ms at 68 GiB/s, ~10x off SoL) and its W-minor
        # layout preference forces the 411 MB relayout copies at the stem
        # boundary (PERF.md round-3 copy hunt).  =1: forward only (XLA
        # select-and-scatter backward keeps its W-minor demand — measured
        # 12.26/11.64 steps/s, the copies survive).  =2: paired
        # forward+argmax-index / index-routing backward — no
        # select-and-scatter, no W-minor tensor at the boundary at all.
        if pallas_2a == "2":
            from .pallas_pool import strided_spatial_pool_pair

            return strided_spatial_pool_pair(x)
        from .pallas_pool import strided_spatial_pool_conv

        return strided_spatial_pool_conv(x)
    if (
        window[0] == 1
        and strides[0] == 1
        and x.ndim == 5
        and os.environ.get("FLICKER_POOL_NOFOLD", "") != "1"
    ):
        # spatial-only pool: fold (B, T) so XLA sees a 4-D reduce-window
        # (free reshape — adjacent major dims).  NOTE the fold is free but
        # the 4-D reduce-window PREFERS layout {2,3,1,0}, which inserts
        # relayout copies on both sides of the stem boundary (HLO round 3:
        # copy.85/86/89/91, ~4.9 ms) — FLICKER_POOL_NOFOLD=1 A/Bs the plain
        # 5-D lowering against that copy cost.
        b, t, h, w, c = x.shape
        y = lax.reduce_window(
            x.reshape(b * t, h, w, c),
            -jnp.inf,
            lax.max,
            (1, *window[1:], 1),
            (1, *strides[1:], 1),
            "SAME",
        )
        return y.reshape(b, t, *y.shape[1:])
    # NOTE on rejected variants (all measured at step level, PERF.md round 2):
    # separable two-1-D-reduce-window forward (6.1 -> 10.7 ms), the custom
    # routing backward for strided pools (6-D padded accumulators), and a
    # Pallas forward kernel (ops/pallas_pool.py — the kernel matched
    # reduce-window's time but its default-layout boundary broke the
    # surrounding fusions, +14 ms of relayouts).  One 3-D reduce-window with
    # XLA autodiff it stays.
    return _pool3d(x, tuple(window), tuple(strides))


def _fully_parity(x, window, strides) -> bool:
    return all(
        w == 1 or _parity_eligible(x.shape[i + 1], w, s)
        for i, (w, s) in enumerate(zip(window, strides))
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _max_pool_custom(
    x: jax.Array, window: Tuple[int, int, int], strides: Tuple[int, int, int]
) -> jax.Array:
    return _custom_fwd_impl(x, window, strides)


def _pallas_s1() -> bool:
    """FLICKER_POOL_PALLAS_S1=1: stride-1 (3,3,3) pool FORWARDS through the
    Pallas plane kernel (ops/pallas_pool.overlap_pool_333).  The reduce-window
    lowering of these pools is the worst op left in the headline step (6.28 ms
    at 76 GiB/s, ~10x off SoL — PERF.md round-3 SoL table) and every XLA-level
    replacement measured negative; the Pallas kernel streams the same max
    through VMEM at the memory floor.  Values are bit-identical, so the
    first-match routing backward (and its save_y residual) is unaffected."""
    return os.environ.get("FLICKER_POOL_PALLAS_S1", "") == "1"


def _custom_fwd_impl(x, window, strides):
    if (
        _pallas_s1()
        and window == (3, 3, 3)
        and all(s == 1 for s in strides)
        and x.ndim == 5
        and jax.default_backend() == "tpu"
    ):
        from .pallas_pool import overlap_pool_333

        return overlap_pool_333(x)
    # Fully parity-eligible strided pools take the separable parity forward
    # (elementwise max over free parity splits; max is separable in any axis
    # order) — reduce_window measured 76 GiB/s on the MaxPool2a geometry.
    # Safe ONLY under this custom VJP: autodiff of the elementwise form would
    # route ties by lax.max's rule, not the reference's first-match.
    if all(s == 1 for s in strides) and _sepfwd() == "2":
        return _pool_overlap_onepass(x, window)
    if _fully_parity(x, window, strides) or (
        _sepfwd() == "1" and all(s == 1 for s in strides)
    ):
        y = x
        for i, (w, s) in enumerate(zip(window, strides)):
            if w > 1:
                y = _pool_axis(y, i + 1, w, s)
        return y
    return _pool3d(x, window, strides)


def _pool3d(x, window, strides):
    # NOTE: init must be the PYTHON float -inf: JAX recognizes the max
    # monoid (-> differentiable reduce_window_max_p) by the literal identity
    # value; a materialized array (or finfo.min) silently loses the VJP rule
    # and grad-under-jit dies with "Linearization failed".
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, *window, 1), (1, *strides, 1), "SAME"
    )


def _save_y() -> bool:
    """Carry the forward's pooled output as a residual so the backward skips
    the final pool_T recompute (VERDICT r2 'reuse instead of recompute').
    Safe because max is exactly separable — pool_T(pool_H(pool_W(x))) is
    bit-identical to the fused forward.  Default ON since the round-3 chip
    A/B: 11.845 -> 11.949 steps/s on the T=64 B=8 headline, HBM bytes/step
    47.30 -> 46.58 GB.  FLICKER_POOL_SAVE_Y=0 opts out (recompute)."""
    return os.environ.get("FLICKER_POOL_SAVE_Y", "1") != "0"


def _fwd(x, window, strides):
    y = _custom_fwd_impl(x, window, strides)
    return y, (x, y if _save_y() else None)


def _bwd(window, strides, res, dy):
    x, y_saved = res
    (wt, wh, ww), (st, sh, sw) = window, strides
    # separable recompute (max is separable; SAME pads per axis compose
    # because the padding value is the max-identity)
    m_w = _pool_axis(x, 3, ww, sw)
    m_hw = _pool_axis(m_w, 2, wh, sh)
    y = y_saved if y_saved is not None else _pool_axis(m_hw, 1, wt, st)
    g = _route_axis(dy, y, m_hw, axis=1, w=wt, s=st)
    g = _route_axis(g, m_hw, m_w, axis=2, w=wh, s=sh)
    g = _route_axis(g, m_w, x, axis=3, w=ww, s=sw)
    return (g,)


_max_pool_custom.defvjp(_fwd, _bwd)
