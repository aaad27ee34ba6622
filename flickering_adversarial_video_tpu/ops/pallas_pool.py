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
