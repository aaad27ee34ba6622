"""A/B: can a W-grouped conv fix the layer1 temporal-dx fill on TPU?

The r2plus1d layer1 backward-input for the (3,1,1) temporal conv produces
dx with MID=144 output channels — 2 lane tiles at 56% fill.  Folding W
pairs into channels would give M = p*144 (p=2 -> 75%, p=4 -> 90% fill) at
UNCHANGED MACs iff the conv is expressed with feature_group_count=p (the
dense block-diagonal spelling pays p x MACs — the deep-stem experiment's
einsum-eye form).  Whether XLA's TPU lowering realizes grouped convs at
full efficiency is exactly what this measures.

Measurement rules (PERF.md): scan-chained programs, value readback as the
fence, quiet host, one jax process.

Usage: python scripts/ab_grouped_convt.py [--iters 30] [--p 2 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, T, H, W = 16, 16, 56, 56
COUT, MID = 64, 144  # layer1 temporal conv: mid -> cout fwd, dx has MID chans
DT = jnp.bfloat16


def dx_plain(g, ktf):
    # dx[b,t,h,w,mid] = sum_a ktf[a,0,0,cout,mid] g[b,t+1-a,h,w,cout]
    return lax.conv_general_dilated(
        g, ktf, (1, 1, 1), [(1, 1), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=DT,
    )


def dx_grouped(gp, ktf_rep, p):
    # gp [B,T,H,W/p,p*COUT]; kernel [3,1,1,COUT,p*MID] with
    # feature_group_count=p: group s contracts gp channels [s*COUT,(s+1)*COUT)
    # into output block [s*MID,(s+1)*MID) — W-pair-packed dx, MACs x1.
    return lax.conv_general_dilated(
        gp, ktf_rep, (1, 1, 1), [(1, 1), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=p,
        preferred_element_type=DT,
    )


def chain(fn, x0, iters):
    def body(c, _):
        y = fn(c)
        # re-derive an input-shaped carry so the loop composes (cheap slice)
        return c + 0.0 * jnp.mean(y), jnp.float32(jnp.mean(y))

    def run(x):
        return lax.scan(body, x, None, length=iters)

    return jax.jit(run)


def timed(fn_j, x, iters, trials=3):
    out = fn_j(x)
    _ = float(np.asarray(out[1])[-1])  # warmup + fence
    best = np.inf
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn_j(x)
        _ = float(np.asarray(out[1])[-1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--p", type=int, nargs="+", default=[2, 4])
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((B, T, H, W, COUT)), DT)
    ktf = jnp.asarray(rng.standard_normal((3, 1, 1, COUT, MID)), DT)
    flops = 2 * B * T * H * W * 3 * COUT * MID

    t_plain = timed(chain(lambda x: dx_plain(x, ktf), g, args.iters), g, args.iters)
    print(
        f"plain dx   [M={MID}]: {t_plain*1e3:.3f} ms  "
        f"{flops/t_plain/1e12:.1f} TF/s"
    )

    for p in args.p:
        gp = jnp.asarray(
            np.asarray(g, np.float32)
            .reshape(B, T, H, W // p, p * COUT),
            DT,
        )
        ktf_rep = jnp.concatenate([ktf] * p, axis=-1)  # [3,1,1,COUT,p*MID]
        # exactness: grouped output block s == plain dx at W col p*u+s
        ref = np.asarray(dx_plain(g, ktf), np.float32)
        got = np.asarray(dx_grouped(gp, ktf_rep, p), np.float32)
        got_unpacked = got.reshape(B, T, H, W // p, p, MID).reshape(
            B, T, H, W, MID
        )
        np.testing.assert_allclose(ref, got_unpacked, rtol=2e-2, atol=1e-2)
        t_g = timed(
            chain(lambda x: dx_grouped(x, ktf_rep, p), gp, args.iters),
            gp,
            args.iters,
        )
        print(
            f"grouped p={p} [M={p*MID}]: {t_g*1e3:.3f} ms  "
            f"{flops/t_g/1e12:.1f} TF/s  ({t_plain/t_g:.2f}x vs plain)"
        )


if __name__ == "__main__":
    main()
