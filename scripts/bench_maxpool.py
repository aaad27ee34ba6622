"""Micro-benchmark: maxpool fwd+bwd variants on the real I3D tensor shapes.

Compares XLA's reduce-window autodiff (select-and-scatter backward) against
ops/maxpool.py's separable first-match backward, per pool site of the
T=64 B=8 attack step.  Run on the TPU.

Measurement notes for the tunneled (axon) device, learned the hard way:
  * a CONSTANT cotangent lets XLA fold the whole backward away — use a
    random dy;
  * independent repeated executions are not reliably forced by
    block_until_ready — iterations must be CHAINED (each step consumes a
    scalar from the previous output) and the loop timed around one final
    scalar readback, with the readback RTT subtracted.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flickering_adversarial_video_tpu.ops.maxpool import max_pool_same

# (name, input shape, window, strides, count-in-network)
SITES = [
    ("MaxPool2a", (8, 32, 112, 112, 64), (1, 3, 3), (1, 2, 2), 1),
    ("MaxPool3a", (8, 32, 56, 56, 192), (1, 3, 3), (1, 2, 2), 1),
    ("Mixed_3b/3", (8, 32, 28, 28, 192), (3, 3, 3), (1, 1, 1), 1),
    ("Mixed_3c/3", (8, 32, 28, 28, 256), (3, 3, 3), (1, 1, 1), 1),
    ("MaxPool4a", (8, 32, 28, 28, 480), (3, 3, 3), (2, 2, 2), 1),
    ("Mixed_4x/3", (8, 16, 14, 14, 512), (3, 3, 3), (1, 1, 1), 5),
    ("MaxPool5a", (8, 16, 14, 14, 832), (2, 2, 2), (2, 2, 2), 1),
    ("Mixed_5x/3", (8, 8, 7, 7, 832), (3, 3, 3), (1, 1, 1), 2),
]

ITERS = 20


def timed_chain(step_fn, x, dy, iters=ITERS):
    """step_fn(x, dy, tag)->dx; chain tag = dx[0,...] so every iteration is
    data-dependent on the previous one, then subtract the readback RTT."""

    jit_step = jax.jit(step_fn)
    tag = jnp.float32(1.0)
    dx = jit_step(x, dy, tag)  # compile
    tag = jnp.float32(dx.reshape(-1)[0].astype(jnp.float32) * 0 + 1)
    _ = float(tag)

    # RTT of a bare scalar readback
    t0 = time.perf_counter()
    _ = float(jnp.float32(1.0) + tag)
    rtt = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        dx = jit_step(x, dy, tag)
        tag = dx.reshape(-1)[0].astype(jnp.float32) * 0 + 1
    _ = float(tag)
    total = time.perf_counter() - t0
    return max(0.0, (total - rtt)) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    print(f"{'site':<12} {'shape':<22} {'xla ms':>8} {'ours ms':>8} {'speedup':>8}")
    tot_old = tot_new = 0.0
    for name, shape, window, strides, count in SITES:
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        y_shape = nn.max_pool(x, window, strides, "SAME").shape
        dy = jax.random.normal(jax.random.key(0), y_shape, jnp.bfloat16)

        def g_old(z, g, tag):
            g = g * tag.astype(g.dtype)
            _, vjp = jax.vjp(lambda q: nn.max_pool(q, window, strides, "SAME"), z)
            return vjp(g)[0]

        def g_new(z, g, tag):
            g = g * tag.astype(g.dtype)
            _, vjp = jax.vjp(lambda q: max_pool_same(q, window, strides), z)
            return vjp(g)[0]

        t_old = timed_chain(g_old, x, dy)
        t_new = timed_chain(g_new, x, dy)
        tot_old += t_old * count
        tot_new += t_new * count
        print(
            f"{name:<12} {str(shape):<22} {t_old:8.2f} {t_new:8.2f} "
            f"{t_old/max(t_new,1e-9):7.2f}x"
        )
    print(f"{'TOTAL(net)':<12} {'':<22} {tot_old:8.2f} {tot_new:8.2f}   (weighted by per-network count)")


if __name__ == "__main__":
    main()
