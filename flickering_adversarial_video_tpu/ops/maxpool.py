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
    window = [1] * x.ndim
    strides = [1] * x.ndim
    window[axis] = w
    strides[axis] = s
    return lax.reduce_window(x, -jnp.inf, lax.max, window, strides, "SAME")


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
    select-and-scatter runs at 28-37 GiB/s) take the custom separable
    backward; strided pools keep XLA's autodiff at batch>1 — its
    select-and-scatter is memory-healthy there (354-586 GiB/s measured
    in-step) — but at B=1 the same lowering collapses to 17 GiB/s (PERF.md
    round 2 single-video profile), so B=1 takes the custom routing too
    (pad+add+stack accumulation; no DUS, no scatter).  `force_custom`
    overrides the policy (micro-bench A/B).
    """
    if force_custom or all(s == 1 for s in strides) or x.shape[0] == 1:
        return _max_pool_custom(x, tuple(window), tuple(strides))
    if window[0] == 1 and strides[0] == 1 and x.ndim == 5:
        # spatial-only pool: fold (B, T) so XLA sees a 4-D reduce-window
        # (free reshape — adjacent major dims)
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


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _max_pool_custom(
    x: jax.Array, window: Tuple[int, int, int], strides: Tuple[int, int, int]
) -> jax.Array:
    return _pool3d(x, window, strides)


def _pool3d(x, window, strides):
    # NOTE: init must be the PYTHON float -inf: JAX recognizes the max
    # monoid (-> differentiable reduce_window_max_p) by the literal identity
    # value; a materialized array (or finfo.min) silently loses the VJP rule
    # and grad-under-jit dies with "Linearization failed".
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, *window, 1), (1, *strides, 1), "SAME"
    )


def _fwd(x, window, strides):
    return _pool3d(x, window, strides), x


def _bwd(window, strides, x, dy):
    (wt, wh, ww), (st, sh, sw) = window, strides
    # separable recompute (max is separable; SAME pads per axis compose
    # because the padding value is the max-identity)
    m_w = _pool_axis(x, 3, ww, sw)
    m_hw = _pool_axis(m_w, 2, wh, sh)
    y = _pool_axis(m_hw, 1, wt, st)
    g = _route_axis(dy, y, m_hw, axis=1, w=wt, s=st)
    g = _route_axis(g, m_hw, m_w, axis=2, w=wh, s=sh)
    g = _route_axis(g, m_w, x, axis=3, w=ww, s=sw)
    return (g,)


_max_pool_custom.defvjp(_fwd, _bwd)
