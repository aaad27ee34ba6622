"""Pallas im2col stem conv forward on the T-major view (round-4 lever).

What it replaces: `stem_tmajor._stem_fwd_view` + `_bn_relu_view` — four
tap convs at 64 of 128 output lanes (129-145 TF/s) plus a combine fusion
that re-reads three 411 MB tap intermediates (xplane 2026-08-20: 6.7 ms
total for the stem forward complex at T=64 B=8).

This kernel reads x once into VMEM, runs ONE full-fill
[4*Cout, 16*Cin] x [16*Cin, L] MXU dot per output position (631 GF at
full M=256 occupancy -> ~3.2 ms floor), applies the temporal lane-shift
combine, BN and relu in-register, and writes y once.  The structural
prototype (scripts/ab_stem_pallas_proto.py) measured 4.3-4.6 ms/pass.

Derivation (catfwd identity, bit-checked in tests): with
P_m = conv_sp(x, pk[m]) (spatial SAME (1,2)x(1,2)),
    y[v] = sum_m P_m[v + (m-1)*B]
because a temporal tap's lane window is a lane shift of the unshifted
conv (the conv is spatial-only; lanes are batch).  In-kernel the shift is
a pltpu.roll + edge mask on the f32 accumulator blocks.

Numerics: the dot accumulates all 16 spatial taps AND the 4 temporal taps
in ONE f32 contraction, where the tap path rounds each P_m to bf16 and
adds in bf16 — outputs agree to bf16 reassociation (strictly better
accumulation), asserted at tolerance in tests/test_stem_conv_pallas.py.
BN + relu follow in bf16 with _bn_relu_view's exact op order.

Gated FLICKER_STEM_PALLAS (default per chip A/B — see PERF.md round 4).
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
    """Default ON: chip A/B 2026-08-20 (T=64 B=8 headline) measured the
    im2col kernel at 20.02 -> 20.97 steps/s = 11.41x, HBM 28.4 -> 24.8
    GB/step — the three 411 MB tap intermediates and their combine re-reads
    leave the program.  FLICKER_STEM_PALLAS=0 restores the tap-conv
    composition (bit-different at bf16-reassociation level: the kernel
    accumulates all 16 spatial x 4 temporal taps in one f32 contraction)."""
    return os.environ.get("FLICKER_STEM_PALLAS", "1") == "1"


def eligible(xv_shape, pk_shape, b: int) -> bool:
    """[H, W, Cin, T'B] with 128-aligned lanes, 4-temporal-tap packed
    kernel, H divisible by a usable block height."""
    if len(xv_shape) != 4 or len(pk_shape) != 5:
        return False
    h, w, c, tb = xv_shape
    return (
        pk_shape[0] == 4
        and pk_shape[3] == c
        and tb % 128 == 0
        and tb % b == 0
        and h % 2 == 0
        and c % 8 == 0
    )


def _lane_idx(n):
    return lax.broadcasted_iota(jnp.int32, (1, n), 1)


def _shift_f32(x, s, n):
    """out[., l] = x[., l+s] with 0 fill past the edge (f32, 2-D)."""
    if s == 0:
        return x
    rolled = pltpu.roll(x, shift=(-s) % n, axis=1)
    lanes = _lane_idx(n)
    valid = lanes < (n - s) if s > 0 else lanes >= -s
    return jnp.where(valid, rolled, jnp.zeros_like(x))


def _kernel(
    x_ref, xt1_ref, xb1_ref, xb2_ref, k_ref, mean_ref, mul_ref, bias_ref,
    o_ref, xe_ref, *, hb, h_total, b, cout, unroll,
):
    """Grid cell i: output rows [i*hb, (i+1)*hb).

    xe scratch rows 0..hb+2 <-> global rows i*hb-1 .. i*hb+hb+1, W extent
    pre-padded by (1, 2) zero columns.  Boundary halo rows are zeroed
    (conv SAME pad semantics)."""
    i = pl.program_id(0)
    w_in = x_ref.shape[1]
    w_out = w_in  # SAME
    cin = x_ref.shape[2]
    n = x_ref.shape[3]

    zrow = jnp.zeros((1, w_in, cin, n), x_ref.dtype)
    top = jnp.where(i == 0, zrow, xt1_ref[...])
    bot1 = jnp.where(i * hb + hb <= h_total - 1, xb1_ref[...], zrow)
    bot2 = jnp.where(i * hb + hb + 1 <= h_total - 1, xb2_ref[...], zrow)
    xe = jnp.concatenate([top, x_ref[...], bot1, bot2], axis=0)
    # W SAME pad (1, 2): zero columns on both sides
    zcol = jnp.zeros((hb + 3, 1, cin, n), x_ref.dtype)
    xe_ref[...] = jnp.concatenate([zcol, xe, zcol, zcol], axis=1)

    kmat = k_ref[...]  # [4*Cout, 16*Cin]
    mean = mean_ref[...]  # [Cout, 1] f32
    mul = mul_ref[...]
    bias = bias_ref[...]

    def one_pos(j, w):
        pieces = []
        for kh in range(4):
            for kw in range(4):
                sl = xe_ref[pl.ds(j + kh, 1), pl.ds(w + kw, 1), :, :]
                pieces.append(sl.reshape(cin, n))
        col = jnp.concatenate(pieces, axis=0)  # [16*Cin, L]
        acc = lax.dot_general(
            kmat, col, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [4*Cout, L]
        y = None
        for m in range(4):
            blk = _shift_f32(acc[m * cout : (m + 1) * cout], (m - 1) * b, n)
            y = blk if y is None else y + blk
        # BN + relu in the compute dtype, _bn_relu_view's op order
        yc = y.astype(o_ref.dtype)
        yb = (yc - mean.astype(o_ref.dtype)) * mul.astype(o_ref.dtype)
        yb = yb + bias.astype(o_ref.dtype)
        yb = jnp.maximum(yb, jnp.zeros_like(yb))
        o_ref[pl.ds(j, 1), pl.ds(w, 1)] = yb[None, None]

    def row_body(j, carry):
        def w_body(wi, c2):
            w = wi * unroll
            for u in range(unroll):
                one_pos(j, w + u)
            return c2

        return lax.fori_loop(0, w_out // unroll, w_body, carry)

    lax.fori_loop(0, hb, row_body, 0)


def _pick_hb(h):
    for hb in (2, 4, 7, 1):
        if h % hb == 0:
            return hb
    return None


def stem_conv_bn_relu_view_pallas(
    xv: jax.Array,
    pk: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    bias: jax.Array,
    b: int,
    eps: float = 1e-3,
    interpret: bool = False,
) -> jax.Array:
    """One-pass stem conv + temporal combine + BN + relu on the view.

    xv: [H, W, Cin, T'B]; pk: [4, kh=4, kw=4, Cin, Cout]; BN vectors
    [Cout] f32.  Returns [H, W, Cout, T'B] in xv.dtype."""
    h, w, cin, n = xv.shape
    cout = pk.shape[-1]
    hb = _pick_hb(h)
    # chip sweep 2026-08-20 (headline steps/s): unroll 2 -> 20.62,
    # 4 -> 20.97, 8 -> 21.09, 16 -> 21.17, 28 -> 21.10
    unroll = int(os.environ.get("FLICKER_STEM_PALLAS_UNROLL", "16"))
    while unroll > 1 and w % unroll:
        unroll //= 2

    # kmat rows: (tap m, cout) blocks; cols: (kh, kw, cin)
    # rows (tap m, cout); cols (kh, kw, cin) — both match the kernel's
    # block/col construction order
    kmat = (
        jnp.transpose(pk, (0, 4, 1, 2, 3)).reshape(4 * cout, 16 * cin)
    ).astype(xv.dtype)
    mean_c = mean.astype(jnp.float32).reshape(cout, 1)
    mul_c = (
        lax.rsqrt(var.astype(jnp.float32) + jnp.float32(eps))
    ).reshape(cout, 1)
    bias_c = bias.astype(jnp.float32).reshape(cout, 1)

    if not interpret:
        from .accounting import record

        itemsize = xv.dtype.itemsize
        # per grid cell: hb main rows + 3 single halo rows of x; kmat and
        # the BN vectors have constant (whole-array) blocks -> fetched once
        record(
            "stem_im2col_fwd",
            flops=2.0 * h * w * n * (16 * cin) * (4 * cout),
            hbm_bytes=(
                (h // hb) * (hb + 3) * w * cin * n * itemsize  # x + halo
                + h * w * cout * n * itemsize  # y
                + 4 * cout * 16 * cin * itemsize  # kmat
                + 3 * cout * 4  # BN f32 vectors
            ),
        )

    def main_map(i):
        return (i, 0, 0, 0)

    def row(off):
        def imap(i):
            return (jnp.clip(i * hb + off, 0, h - 1), 0, 0, 0)

        return imap

    def row_spec(imap):
        return pl.BlockSpec((1, w, cin, n), imap, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(
            _kernel, hb=hb, h_total=h, b=b, cout=cout, unroll=unroll
        ),
        grid=(h // hb,),
        in_specs=[
            pl.BlockSpec((hb, w, cin, n), main_map, memory_space=pltpu.VMEM),
            row_spec(row(-1)),
            row_spec(row(hb)),
            row_spec(row(hb + 1)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (hb, w, cout, n), main_map, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h, w, cout, n), xv.dtype),
        scratch_shapes=[
            pltpu.VMEM((hb + 3, w + 3, cin, n), xv.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 2**20,
        ),
        interpret=interpret,
    )(xv, xv, xv, xv, kmat, mean_c, mul_c, bias_c)
