"""A/B microbench: stride-1 (3,3,3) Inception-branch pools, reduce-window
forward vs the Pallas plane kernel (FLICKER_POOL_PALLAS_S1).

Times fwd+bwd of JUST the pool (values + first-match routing backward) as
chained lax.scan programs on the bench chip — the only measurement method
that survives the tunneled dispatch RTT (PERF.md round 3: per-dispatch
Python loops measure the tunnel below ~5 ms of device work; sub-RTT op
timings are pure noise).

Usage: python scripts/ab_pool_s1.py [--iters 60] [--chunk 20] [--fwd-only]
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

# the stride-1 pool sites of the T=64 B=8 headline step (count = how many
# identical pools the network runs per step)
SITES = [
    ("Mixed_3b/3", (8, 32, 28, 28, 192), 1),
    ("Mixed_3c/3", (8, 32, 28, 28, 256), 1),
    ("Mixed_4x/3", (8, 16, 14, 14, 512), 5),
    ("Mixed_5x/3", (8, 8, 7, 7, 832), 2),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    from flickering_adversarial_video_tpu.ops import maxpool as mp
    from flickering_adversarial_video_tpu.ops.pallas_pool import overlap_pool_333

    rng = np.random.default_rng(0)

    def chained(fn, x):
        if args.fwd_only:
            def step(q):
                return jnp.sum(fn(q).astype(jnp.float32))
        else:
            step = jax.grad(lambda q: jnp.sum(fn(q).astype(jnp.float32) ** 2))

        @jax.jit
        def many(q):
            def body(c, _):
                g = step(c)
                return c + jnp.asarray(0.0 * g, c.dtype), None

            q, _ = jax.lax.scan(body, q, None, length=args.chunk)
            return q

        # block_until_ready is NOT a reliable completion fence on the
        # tunneled (axon) chip — only an actual value READBACK is (see
        # scripts/bench_maxpool.py docstring / PERF.md round 3); time the
        # whole chained loop around one final scalar fetch and subtract the
        # fetch RTT.
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

    def pool_default(q):
        return mp._max_pool_custom(q, (3, 3, 3), (1, 1, 1))

    print(f"{'site':<12} {'xla ms':>8} {'pallas ms':>10} {'delta':>8}")
    tot = 0.0
    for name, shape, count in SITES:
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        os.environ["FLICKER_POOL_PALLAS_S1"] = ""
        t_def = chained(pool_default, x)
        if args.fwd_only:
            t_pl = chained(lambda q: overlap_pool_333(q), x)
        else:
            os.environ["FLICKER_POOL_PALLAS_S1"] = "1"
            t_pl = chained(pool_default, x)
        tot += (t_def - t_pl) * count
        print(f"{name:<12} {t_def:8.3f} {t_pl:10.3f} {t_def - t_pl:+8.3f}")
    os.environ["FLICKER_POOL_PALLAS_S1"] = ""
    print(f"network-weighted delta: {tot:+.3f} ms/step")


if __name__ == "__main__":
    main()
