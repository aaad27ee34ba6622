"""A/B microbench: stride-1 (3,3,3) branch pools ON THE T-MAJOR VIEW —
stem_tmajor chain vs the fused Pallas kernels (ops/pool_s1_view_pallas.py).

Three arms per site:
  chain   : _stride1_pool333_view_chain (separable fwd + 3-stage routing bwd)
  hybrid  : chain forward + Pallas one-pass backward (FLICKER_S1V_PALLAS=1)
  full    : Pallas forward too            (+ FLICKER_S1V_PALLAS_FWD=1)

Chained lax.scan + value-readback fencing (the only timing that survives the
tunneled dispatch RTT — PERF.md round 3).

Usage: python scripts/ab_pool_s1_view.py [--iters 60] [--chunk 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# stride-1 branch-pool sites of the T=64 B=8 headline step in VIEW shape
# [H, W, C, T'B] (count = identical pools per step); Mixed_5b/5c are
# ineligible (64 lanes) and excluded by the gate.
SITES = [
    ("Mixed_3b/3", (28, 28, 192, 256), 1),
    ("Mixed_3c/3", (28, 28, 256, 256), 1),
    ("Mixed_4b/3", (14, 14, 480, 128), 1),
    ("Mixed_4cde", (14, 14, 512, 128), 3),
    ("Mixed_4f/3", (14, 14, 528, 128), 1),
]
B = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--chunk", type=int, default=20)
    args = ap.parse_args()

    from flickering_adversarial_video_tpu.ops.pool_s1_view_pallas import (
        s1_pool333_view_pallas,
        _fwd_impl,
        _vjp_bwd,
    )
    from flickering_adversarial_video_tpu.ops.stem_tmajor import (
        _stride1_pool333_view_chain,
    )

    rng = np.random.default_rng(0)

    def chained(fn, x):
        step = jax.grad(lambda q: jnp.sum(fn(q).astype(jnp.float32) ** 2))

        @jax.jit
        def many(q):
            def body(c, _):
                g = step(c)
                return c + jnp.asarray(0.0 * g, c.dtype), None

            q, _ = jax.lax.scan(body, q, None, length=args.chunk)
            return q

        q = many(x)
        _ = float(jnp.sum(q.astype(jnp.float32)))
        t0 = time.perf_counter()
        _ = float(jnp.sum(q.astype(jnp.float32)))
        rtt = time.perf_counter() - t0
        n = max(args.iters // args.chunk, 1)
        t0 = time.perf_counter()
        for _ in range(n):
            q = many(q)
        _ = float(jnp.sum(q.astype(jnp.float32)))
        total = time.perf_counter() - t0
        return max(0.0, total - rtt) / (n * args.chunk) * 1e3

    def chain(q):
        return _stride1_pool333_view_chain(q, B)

    def hybrid(q):
        return s1_pool333_view_pallas(q, B)  # fwd gate off -> chain fwd

    @jax.custom_vjp
    def full(q):
        return _fwd_impl(q, B, False)

    full.defvjp(
        lambda q: (_fwd_impl(q, B, False), q),
        lambda res, dy: _vjp_bwd(B, False, res, dy),
    )

    print(f"{'site':<12} {'chain':>8} {'hybrid':>8} {'full':>8} "
          f"{'d_hyb':>8} {'d_full':>8}")
    tot_h = tot_f = 0.0
    for name, shape, count in SITES:
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        t_c = chained(chain, x)
        t_h = chained(hybrid, x)
        t_f = chained(full, x)
        tot_h += (t_c - t_h) * count
        tot_f += (t_c - t_f) * count
        print(f"{name:<12} {t_c:8.3f} {t_h:8.3f} {t_f:8.3f} "
              f"{t_c - t_h:+8.3f} {t_c - t_f:+8.3f}")
    print(f"network-weighted delta: hybrid {tot_h:+.3f} ms/step, "
          f"full {tot_f:+.3f} ms/step")


if __name__ == "__main__":
    main()
