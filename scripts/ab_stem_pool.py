"""A/B microbench: stem+MaxPool2a region, default path vs stem_pool_outpack.

Times fwd+bwd of JUST the region (packed input -> pooled output, input
gradient) as chained scans on the bench chip — attributes the end-to-end
headline delta to the region itself (PERF.md evidence).

Usage: python scripts/ab_stem_pool.py [--frames 64] [--batch 8] [--iters 30]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--chunk", type=int, default=10)
    args = ap.parse_args()

    from flickering_adversarial_video_tpu.ops.maxpool import max_pool_same
    from flickering_adversarial_video_tpu.ops.space_to_depth import (
        stem_conv_bn_relu,
    )
    from flickering_adversarial_video_tpu.ops.stem_pool import (
        pack_stem_kernel_outpack,
        stem_pool_outpack,
    )

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    b, tt, hh, ww, cin, cout = (
        args.batch, args.frames // 2, args.size // 2, args.size // 2, 24, 64,
    )
    xp = jax.device_put(
        jnp.asarray(rng.normal(size=(b, tt, hh, ww, cin)) * 0.3, dt)
    )
    pk = jax.device_put(jnp.asarray(rng.normal(size=(4, 4, 4, cin, cout)) * 0.1, dt))
    pko = jax.jit(pack_stem_kernel_outpack)(pk)
    mean = jax.device_put(jnp.zeros((cout,), jnp.float32))
    var = jax.device_put(jnp.ones((cout,), jnp.float32))
    bias = jax.device_put(jnp.zeros((cout,), jnp.float32))

    def region_default(q):
        y = stem_conv_bn_relu(q, pk, mean, var, bias)
        y = max_pool_same(y, (1, 3, 3), (1, 2, 2))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def region_fused(q):
        y = stem_pool_outpack(q, pk, pko, mean, var, bias)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def chained(fn):
        grad = jax.grad(fn)

        @jax.jit
        def many(q):
            def body(c, _):
                g = grad(c)
                # data-dependence so the scan cannot collapse
                return c + 0.0 * g, None

            q, _ = jax.lax.scan(body, q, None, length=args.chunk)
            return q

        q = many(xp)  # compile + warm
        jax.block_until_ready(q)
        n = max(args.iters // args.chunk, 1)
        t0 = time.perf_counter()
        for _ in range(n):
            q = many(q)
        jax.block_until_ready(q)
        return (time.perf_counter() - t0) / (n * args.chunk) * 1e3

    ms_def = chained(region_default)
    ms_fused = chained(region_fused)
    print(
        f"stem+pool region fwd+bwd: default {ms_def:.2f} ms | "
        f"outpack-fused {ms_fused:.2f} ms | delta {ms_def - ms_fused:+.2f} ms"
    )


if __name__ == "__main__":
    main()
