"""Viability microbench for a Pallas im2col stem conv (round-4 candidate).

The stem forward complex costs 6.7 ms (4 tap convs at 64-lane fill + a
combine that re-reads three 411 MB intermediates).  A VMEM-accumulating
kernel would read x once, run ONE full-fill [256,384]x[384,256] dot per
output position (631 GF total -> ~3.2 ms MXU floor), and write y once.

The make-or-break unknowns are Mosaic-side: the [W,C] sublane transpose,
the per-position col concat, fori overhead, and VPU/MXU pipelining.  This
prototype measures a structurally-equivalent kernel (correct shapes and
data movement; values unchecked) — if it can't beat ~4.5 ms there is no
point building the exact version.

Usage: python scripts/ab_stem_pallas_proto.py [--hb 4] [--iters 20]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W, CIN, L = 112, 112, 24, 256
WP = W + 3  # W pre-padded in the array
COUT = 256  # 4 taps x 64


def _kernel(x_ref, xt1_ref, xb1_ref, xb2_ref, k_ref, o_ref, xt_ref, *, hb):
    # rows: xt1 = i*hb-1 (clipped), main = [i*hb, i*hb+hb), xb1/xb2 below
    xt_ref[...] = jnp.concatenate(
        [xt1_ref[...], x_ref[...], xb1_ref[...], xb2_ref[...]], axis=0
    )  # [hb+3, WP, CIN, L]
    kmat = k_ref[...]
    unroll = int(os.environ.get("PROTO_UNROLL", "1"))

    def one_pos(j, w):
        pieces = []
        for kh in range(4):
            for kw in range(4):
                sl = xt_ref[pl.ds(j + kh, 1), pl.ds(w + kw, 1), :, :]
                pieces.append(sl.reshape(CIN, L))
        col = jnp.concatenate(pieces, axis=0)  # [384, L]
        acc = jax.lax.dot_general(
            kmat, col, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [COUT, L]
        y = (
            acc[0:64] + acc[64:128] + acc[128:192] + acc[192:256]
        ).astype(o_ref.dtype)
        o_ref[pl.ds(j, 1), pl.ds(w, 1)] = y[None, None]

    def row_body(j, carry):
        def w_body(wi, c2):
            w = wi * unroll
            for u in range(unroll):
                one_pos(j, w + u)
            return c2

        return jax.lax.fori_loop(0, W // unroll, w_body, carry)

    jax.lax.fori_loop(0, hb, row_body, 0)


def _kernel_rowcol(x_ref, xt1_ref, xb1_ref, xb2_ref, k_ref, o_ref,
                   xt_ref, col_ref, *, hb):
    xt_ref[...] = jnp.concatenate(
        [xt1_ref[...], x_ref[...], xb1_ref[...], xb2_ref[...]], axis=0
    )  # [hb+3, WP, CIN, L]
    kmat = k_ref[...]

    def row_body(j, carry):
        # build the row's column slabs once: col[(kh,kw), w, ci, l]
        for kh in range(4):
            for kw in range(4):
                col_ref[kh * 4 + kw] = xt_ref[
                    pl.ds(j + kh, 1), pl.ds(kw, W), :, :
                ].reshape(W, CIN, L)

        def w_body(w, c2):
            col = col_ref[:, pl.ds(w, 1)].reshape(16 * CIN, L)
            acc = jax.lax.dot_general(
                kmat, col, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = (
                acc[0:64] + acc[64:128] + acc[128:192] + acc[192:256]
            ).astype(o_ref.dtype)
            o_ref[pl.ds(j, 1), pl.ds(w, 1)] = y[None, None]
            return c2

        return jax.lax.fori_loop(0, W, w_body, carry)

    jax.lax.fori_loop(0, hb, row_body, 0)


def build(hb, rowcol=False):
    if rowcol:
        grid = (H // hb,)

        def main_map(i):
            return (i, 0, 0, 0)

        def row(off):
            def imap(i):
                return (jnp.clip(i * hb + off, 0, H - 1), 0, 0, 0)

            return imap

        def row_spec(imap):
            return pl.BlockSpec((1, WP, CIN, L), imap, memory_space=pltpu.VMEM)

        return pl.pallas_call(
            partial(_kernel_rowcol, hb=hb),
            grid=grid,
            in_specs=[
                pl.BlockSpec((hb, WP, CIN, L), main_map, memory_space=pltpu.VMEM),
                row_spec(row(-1)),
                row_spec(row(hb)),
                row_spec(row(hb + 1)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (hb, W, 64, L), main_map, memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((H, W, 64, L), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((hb + 3, WP, CIN, L), jnp.bfloat16),
                pltpu.VMEM((16, W, CIN, L), jnp.bfloat16),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 2**20,
            ),
        )
    grid = (H // hb,)

    def main_map(i):
        return (i, 0, 0, 0)

    def row(off, scale_hb=True):
        def imap(i):
            return (jnp.clip(i * hb + off, 0, H - 1), 0, 0, 0)

        return imap

    def row_spec(imap):
        return pl.BlockSpec((1, WP, CIN, L), imap, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_kernel, hb=hb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((hb, WP, CIN, L), main_map, memory_space=pltpu.VMEM),
            row_spec(row(-1)),
            row_spec(row(hb)),
            row_spec(row(hb + 1)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hb, W, 64, L), main_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, 64, L), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((hb + 3, WP, CIN, L), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 2**20,
        ),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hb", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--chunk", type=int, default=5)
    ap.add_argument("--rowcol", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((H, WP, CIN, L)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((COUT, 16 * CIN)), jnp.bfloat16)

    fn = build(args.hb, rowcol=args.rowcol)

    @jax.jit
    def many(q):
        def body(c, _):
            y = fn(c, c, c, c, k)
            bump = (y[0, 0, 0, 0] * jnp.asarray(0.0, y.dtype)).astype(c.dtype)
            return c + bump, None

        c, _ = jax.lax.scan(body, q, None, length=args.chunk)
        return c

    try:
        q = many(x)
        _ = float(jnp.sum(q[:1, :1].astype(jnp.float32)))
    except Exception as e:  # noqa: BLE001
        print(f"hb={args.hb} FAILED: {type(e).__name__} {str(e)[:300]}")
        return
    t0 = time.perf_counter()
    _ = float(jnp.sum(q[:1, :1].astype(jnp.float32)))
    rtt = time.perf_counter() - t0
    n = max(args.iters // args.chunk, 1)
    t0 = time.perf_counter()
    for _ in range(n):
        q = many(q)
    _ = float(jnp.sum(q[:1, :1].astype(jnp.float32)))
    dt = time.perf_counter() - t0 - rtt
    per = dt / (n * args.chunk) * 1e3
    print(f"hb={args.hb}: {per:.3f} ms per stem-conv pass (MXU floor ~3.2)")


if __name__ == "__main__":
    main()
