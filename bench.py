"""Benchmark: universal flickering-attack steps/sec on I3D, one TPU chip.

Metric (BASELINE.json): "attack steps/sec/chip (I3D 64x224x224)" — one
optimizer step of the universal attack (batch 8, 64-frame 224x224 uint8
clips): on-device preprocess, flickering delta apply, I3D forward, backward
over delta, Adam update.

`vs_baseline` compares against a reference-protocol run measured on the SAME
chip: the TF1 baseline's per-step session behavior (BASELINE.md headroom
note) — host->device transfer of the f32 batch every step plus separate
compiled calls per fetched quantity: train (fwd+bwd), the softmax re-fetch,
and the clean-logits fetch (i3d_adversarial_main_single_video_npy.py:213-308).
The reference GPU's absolute numbers are unpublished (BASELINE.md), so
same-chip protocol replay is the honest denominator; the target from
BASELINE.md is >=10x.

Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compilation cache: the tunneled-TPU XLA compile of the fused
# I3D step is minutes-long; cache it across bench runs.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

FRAMES = 64
SIZE = 224
BATCH = 8
WARMUP = 3
STEPS = 20


def build_engine(compute_dtype, packed_stem=True):
    from flickering_adversarial_video_tpu.attack import FlickerSpec
    from flickering_adversarial_video_tpu.engine import AttackConfig, AttackEngine
    from flickering_adversarial_video_tpu.models.i3d import InceptionI3D, init_i3d_params

    model = InceptionI3D(
        num_classes=400, compute_dtype=compute_dtype, packed_stem=packed_stem
    )
    variables = init_i3d_params(jax.random.key(0), frames=FRAMES, size=SIZE)
    spec = FlickerSpec(frames=FRAMES)
    engine = AttackEngine(
        lambda v, x: model.apply(v, x)[0],
        variables,
        spec,
        AttackConfig(),
        track_probs=False,
    )
    return engine, model, variables


def time_optimized(engine, batch):
    from flickering_adversarial_video_tpu.engine import RuntimeFlags

    flags = RuntimeFlags()
    state = engine.init_state()
    dev_batch = {
        "video": jax.device_put(batch["video"]),
        "labels": jax.device_put(batch["labels"]),
    }
    key = jax.random.key(0)
    for _ in range(WARMUP):
        state, metrics = engine.train_step(state, dev_batch, flags, key)
    jax.block_until_ready(state.delta)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = engine.train_step(state, dev_batch, flags, key)
    jax.block_until_ready(state.delta)
    return STEPS / (time.perf_counter() - t0)


def time_reference_protocol(model, variables, batch, feed_per_step=False):
    """TF1-session-style protocol on the same chip (see module docstring).

    feed_per_step=False keeps the f32 batch device-resident — CONSERVATIVE in
    our favor: the real reference re-feeds host->device every sess.run, but a
    tunneled device would inflate that cost unfairly, so the headline
    vs_baseline excludes it (the full-feed number is reported separately).
    """
    import optax

    spec_clip = 0.4
    opt = optax.adam(1e-3)

    def apply_model(x):
        return model.apply(variables, x)[0]

    @jax.jit
    def train_call(delta, video, labels, opt_state):
        # feed: f32 video shipped from host (handled by caller), dual graph
        def loss_fn(d):
            adv = jnp.clip(video + jnp.clip(d, -spec_clip, spec_clip)[None], -1, 1)
            logits = apply_model(adv)
            probs = jax.nn.softmax(logits)
            one_hot = jax.nn.one_hot(labels, 400)
            label_prob = jnp.sum(probs * one_hot, -1)
            max_other = jnp.max(probs - one_hot, -1)
            gap = label_prob - (max_other - 0.05)
            loss = jnp.sum(jnp.maximum(0, jnp.minimum(gap**2 / 0.05, gap)))
            reg = jnp.mean(d**2) + jnp.mean((d - jnp.roll(d, 1, 0)) ** 2)
            return loss + reg

        loss, g = jax.value_and_grad(loss_fn)(delta)
        updates, opt_state = opt.update(g, opt_state, delta)
        return optax.apply_updates(delta, updates), opt_state, loss

    @jax.jit
    def softmax_fetch(delta, video):
        adv = jnp.clip(video + jnp.clip(delta, -spec_clip, spec_clip)[None], -1, 1)
        return jax.nn.softmax(apply_model(adv))

    @jax.jit
    def clean_logits_fetch(video):
        return apply_model(video)

    video_f32_host = np.asarray(batch["video"], np.float32) / 128.0 - 1.0
    labels = jax.device_put(batch["labels"])
    video_resident = jax.device_put(video_f32_host)
    delta = jnp.zeros((FRAMES, 1, 1, 3))
    opt_state = opt.init(delta)

    def get_video():
        if feed_per_step:
            return jax.device_put(video_f32_host)  # feed_dict each sess.run
        return video_resident

    def one_reference_step(delta, opt_state):
        delta, opt_state, loss = train_call(delta, get_video(), labels, opt_state)
        _ = np.asarray(loss)  # fetch to host
        probs = softmax_fetch(delta, get_video())
        _ = np.asarray(probs)
        logits_c = clean_logits_fetch(get_video())
        _ = np.asarray(logits_c)
        _ = np.asarray(delta)  # pert fetch (single_video_npy.py:305)
        return delta, opt_state

    for _ in range(2):
        delta, opt_state = one_reference_step(delta, opt_state)
    t0 = time.perf_counter()
    ref_steps = 5
    for _ in range(ref_steps):
        delta, opt_state = one_reference_step(delta, opt_state)
    return ref_steps / (time.perf_counter() - t0)


def main():
    rng = np.random.default_rng(0)
    batch = {
        "video": rng.integers(0, 255, (BATCH, FRAMES, SIZE, SIZE, 3), dtype=np.uint8),
        "labels": rng.integers(0, 400, (BATCH,), dtype=np.int64),
    }

    engine, model, variables = build_engine(jnp.bfloat16)
    optimized = time_optimized(engine, batch)

    # reference protocol replays the f32 multi-fetch session loop on the
    # naive (unpacked-stem) model — the implementation the reference's own
    # conv lowering corresponds to
    _, model_f32, variables_f32 = build_engine(jnp.float32, packed_stem=False)
    baseline = time_reference_protocol(model_f32, variables_f32, batch)

    result = {
        "metric": "attack steps/sec/chip (I3D 64x224x224, batch 8)",
        "value": round(optimized, 3),
        "unit": "steps/s",
        "vs_baseline": round(optimized / baseline, 2),
        "baseline_reference_protocol_steps_per_s": round(baseline, 3),
    }
    # The reference's ACTUAL per-sess.run host->device f32 feed costs ~10 min
    # to measure through a tunneled chip (3x308MB per step); opt-in.
    # Last measured here: 0.018-0.036 steps/s (~300x slower than optimized).
    if os.environ.get("BENCH_FEED_BASELINE"):
        baseline_feed = time_reference_protocol(
            model_f32, variables_f32, batch, feed_per_step=True
        )
        result["baseline_with_per_step_feed_steps_per_s"] = round(baseline_feed, 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
