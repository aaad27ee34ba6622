"""A/B microbench: S1V fused view-pool kernel block shapes (FLICKER_S1V_BLOCKS).

The round-3 kernels shipped with a 1.5 MB padded-block budget, which forces
hb=2 / ct=16 on the Mixed_3b/3c view shapes — 4 halo rows on a 2-row block
triples the x read traffic.  This script times the kernel (fwd-only and
fwd+bwd) per block config on the real chip, scan-chained with a value
readback (the only valid sub-5 ms methodology over the tunnel — PERF.md).

Usage: python scripts/ab_s1v_blocks.py [--iters 60] [--chunk 20]
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

# view shapes [H, W, C, T'B] of the headline step's stride-1 branch pools
SITES = [
    ("Mixed_3b", (28, 28, 192, 256)),
    ("Mixed_3c", (28, 28, 256, 256)),
    ("Mixed_4x", (14, 14, 512, 128)),
]

# (hb, ct) candidates per H extent; None = the module's current default pick
CONFIGS = {
    28: [None, (2, 16), (4, 64), (7, 32), (7, 64), (14, 16), (14, 32), (28, 16)],
    14: [None, (2, 16), (7, 32), (7, 64), (14, 16), (14, 32), (14, 64)],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--chunk", type=int, default=20)
    args = ap.parse_args()

    import flickering_adversarial_video_tpu.ops.pool_s1_view_pallas as s1v

    rng = np.random.default_rng(0)

    def chained(fn, x):
        @jax.jit
        def many(q):
            def body(c, _):
                g = fn(c)
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
        dt = time.perf_counter() - t0 - rtt
        return dt / (n * args.chunk) * 1e3  # ms per iteration

    for name, shape in SITES:
        h, w, c, n = shape
        b = 8
        x = jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)

        for cfg in CONFIGS[h]:
            if cfg is None:
                os.environ.pop("FLICKER_S1V_BLOCKS", None)
                label = "default"
            else:
                if h % cfg[0] or c % cfg[1]:
                    continue
                os.environ["FLICKER_S1V_BLOCKS"] = f"{cfg[0]},{cfg[1]}"
                label = f"hb={cfg[0]:>2} ct={cfg[1]:>3}"

            def fwd_fn(q):
                return jnp.sum(s1v._fwd_impl(q, b, False).astype(jnp.float32))

            def fb_fn(q):
                return jax.grad(
                    lambda v: jnp.sum(
                        s1v.s1_pool333_view_pallas(v, b).astype(jnp.float32) ** 2
                    )
                )(q)

            try:
                t_f = chained(fwd_fn, x)
                t_fb = chained(fb_fn, x)
                print(
                    f"{name} {label:>14}: fwd {t_f:6.3f} ms   fwd+bwd {t_fb:6.3f} ms"
                    f"   (bwd ~{t_fb - t_f:6.3f})",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001 — report and move on
                print(f"{name} {label:>14}: FAILED {type(e).__name__} {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
