"""One-pass Pallas temporal lane-shift combine for the catbwd stem backward.

What it replaces: the tail of `stem_tmajor._catbwd_lane_combine` — after the
(healthy, 170 TF/s) wide dgrad conv produces `part` [H, W, KT*Cin, T'B],
the temporal combine dx[v] = sum_m part[.., m-block, v + (t_plo-m)*B] lowers
in XLA as a 3-fusion pad/slice/add chain (round-5 headline xplane:
fusion.458 946 us + fusion.459 625 us + fusion.460 319 us at 588-593 GiB/s)
that traverses the 616 MB `part` tensor repeatedly.  This kernel reads
`part` once per row-block, does the KT lane shifts as `pltpu.roll`s on an
exact f32 embedding, adds in the tensor dtype in ascending-m order (the
XLA chain's association — bit-identical), and writes dx once:
~770 MB total traffic, a 0.94 ms floor against the chain's measured 1.9 ms.

Gated FLICKER_STEM_CATBWD_PALLAS (chip A/B results in PERF.md round 5).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gate_on() -> bool:
    return os.environ.get("FLICKER_STEM_CATBWD_PALLAS", "1") == "1"


def eligible(part_shape, cin: int, b: int) -> bool:
    """[H, W, KT*Cin, T'B] with 128-aligned lanes divisible by B."""
    if len(part_shape) != 4:
        return False
    h, w, ktc, tb = part_shape
    return (
        ktc % cin == 0
        and 2 <= ktc // cin <= 8
        and tb % 128 == 0
        and tb % b == 0
        and cin % 8 == 0
    )


def _lane_idx(n):
    return lax.broadcasted_iota(jnp.int32, (1, 1, 1, n), 3)


def _shift_lanes(x, s, n):
    """out[..., l] = x[..., l+s] with 0 past the edge (f32 roll is an exact
    embedding of bf16; the downcast after the roll is pure movement)."""
    if s == 0:
        return x
    xr = x if x.dtype.itemsize == 4 else x.astype(jnp.float32)
    rolled = pltpu.roll(xr, shift=(-s) % n, axis=3).astype(x.dtype)
    lanes = _lane_idx(n)
    valid = lanes < (n - s) if s > 0 else lanes >= -s
    return jnp.where(valid, rolled, jnp.zeros_like(x))


def _kernel(p_ref, o_ref, *, b, cin, n_taps, t_plo):
    n = p_ref.shape[3]
    acc = None
    for m in range(n_taps):
        blk = p_ref[:, :, m * cin : (m + 1) * cin, :]
        sl = _shift_lanes(blk, (t_plo - m) * b, n)
        # ascending-m adds in the tensor dtype: the XLA chain's association
        acc = sl if acc is None else acc + sl
    o_ref[...] = acc


def catbwd_lane_combine_pallas(
    part: jax.Array, b: int, cin: int, t_plo: int, interpret: bool = False
) -> jax.Array:
    """dx [H, W, Cin, T'B] from part [H, W, KT*Cin, T'B] in one VMEM pass."""
    h, w, ktc, n = part.shape
    n_taps = ktc // cin
    # block: full W and channels, hb rows; keep the padded block ~<= 12 MB
    budget = 12 * 2**20
    hb = 1
    for cand in (8, 7, 4, 2, 1):
        if h % cand == 0 and cand * w * ktc * n * part.dtype.itemsize <= budget:
            hb = cand
            break

    if not interpret:
        from .accounting import record

        isz = part.dtype.itemsize
        record(
            f"catbwd_combine_{h}x{w}x{ktc}",
            hbm_bytes=h * w * ktc * n * isz + h * w * cin * n * isz,
        )

    return pl.pallas_call(
        partial(_kernel, b=b, cin=cin, n_taps=n_taps, t_plo=t_plo),
        grid=(h // hb,),
        in_specs=[
            pl.BlockSpec(
                (hb, w, ktc, n), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (hb, w, cin, n), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h, w, cin, n), part.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(part)
