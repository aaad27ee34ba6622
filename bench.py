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


def build_engine(compute_dtype, packed_stem=True, naive_pools=False):
    from flickering_adversarial_video_tpu.attack import FlickerSpec
    from flickering_adversarial_video_tpu.engine import AttackConfig, AttackEngine
    from flickering_adversarial_video_tpu.models.i3d import InceptionI3D, init_i3d_params

    model = InceptionI3D(
        num_classes=400,
        compute_dtype=compute_dtype,
        packed_stem=packed_stem,
        naive_pools=naive_pools,
    )
    variables = init_i3d_params(jax.random.key(0), frames=FRAMES, size=SIZE)
    spec = FlickerSpec(frames=FRAMES)
    apply_packed_fn = None
    stem_head = None
    if packed_stem:
        packed_model = InceptionI3D(
            num_classes=400, compute_dtype=compute_dtype, prepacked_stem_input=True
        )
        apply_packed_fn = lambda v, xp: packed_model.apply(v, xp)[0]
        if os.environ.get("FLICKER_FUSED_HEAD", "") == "1":
            from flickering_adversarial_video_tpu.models.i3d import build_stem_head

            stem_head = build_stem_head(variables, compute_dtype=compute_dtype)
        elif os.environ.get("FLICKER_TMAJOR_HEAD", "") != "0":
            # T-major head (ops/stem_tmajor.flicker_stem_tmajor), default on:
            # the engine auto-gates eligibility (single device, 128-aligned
            # B*T' lanes) and falls back to the plain prepacked path if not.
            from flickering_adversarial_video_tpu.models.i3d import build_stem_head

            stem_head = build_stem_head(
                variables, compute_dtype=compute_dtype, tmajor=True
            )
    engine = AttackEngine(
        lambda v, x: model.apply(v, x)[0],
        variables,
        spec,
        AttackConfig(),
        track_probs=False,
        apply_packed_fn=apply_packed_fn,
        stem_head=stem_head,
    )
    return engine, model, variables


V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak, one v5e chip


def step_cost_analysis(engine, batch):
    """XLA cost analysis of the exact compiled fused train-step program.

    Returns (flops_per_step, bytes_accessed) from the compiler's own cost
    model over the final optimized HLO — the falsifiable FLOP count behind
    the published MFU (VERDICT round 2 item 1): mfu = flops / time / peak.

    Both numbers are CUSTOM-CALL-INCLUSIVE: HloCostAnalysis reports nothing
    for custom-call ops, so the default step's Pallas kernels (im2col stem,
    S1V/strided view pools) each `record()` their analytic FLOPs and HBM
    traffic at trace time (ops/accounting.py, halo-fetch redundancy
    included), and the tally is added here (VERDICT r4 item 5)."""
    from flickering_adversarial_video_tpu.engine import RuntimeFlags
    from flickering_adversarial_video_tpu.ops import accounting

    flags = RuntimeFlags()
    state = engine.init_state()
    dev_batch = {k: jax.device_put(v) for k, v in batch.items()}
    # lower through the engine's OWN jit instance (same donation config ->
    # identical program, shared persistent-cache entry with the timed loop)
    with accounting.recording() as tally:
        lowered = engine._train_step.lower(
            state, dev_batch, flags, jax.random.key(0)
        )
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0)) + tally.flops
    bytes_accessed = float(ca.get("bytes accessed", 0.0)) + tally.hbm_bytes
    return flops, bytes_accessed


def time_optimized(engine, batch, steps=STEPS, warmup=WARMUP, chunk=10):
    """Device-work-only timing: steps run as lax.scan chains of `chunk`
    (engine.train_steps), symmetric with the baseline's chained protocol.
    A Python dispatch loop on the tunneled chip measures the ~40 ms
    per-dispatch RTT whenever the step is faster than it (the B=1
    single-video geometry: 42.7 ms wall vs 32.9 ms xplane device time);
    chaining removes the tunnel from both sides of the ratio."""
    from flickering_adversarial_video_tpu.engine import RuntimeFlags

    flags = RuntimeFlags()
    state = engine.init_state()
    dev_batch = {k: jax.device_put(v) for k, v in batch.items()}
    key = jax.random.key(0)
    # warmup with the same chunk size so only ONE chained program compiles
    state = engine.train_steps(state, dev_batch, flags, key, chunk)
    # value READBACK fences, symmetric with the baseline's protocol (its
    # timed_trial reads delta): block_until_ready is not a reliable
    # completion fence on the tunneled (axon) chip.  The fence error only
    # matters when the timed window is small; the readback keeps both sides
    # of vs_baseline on the same rule.
    _ = float(state.delta.reshape(-1)[0])
    chunks = max(steps // chunk, 1)
    t0 = time.perf_counter()
    for _ in range(chunks):
        state = engine.train_steps(state, dev_batch, flags, key, chunk)
    _ = float(state.delta.reshape(-1)[0])
    return chunks * chunk / (time.perf_counter() - t0)


def build_i3d_geometry_engine(variables, compute_dtype, frames):
    """Secondary-geometry engine over the SAME I3D variables (conv params are
    frame-count agnostic)."""
    from flickering_adversarial_video_tpu.attack import FlickerSpec
    from flickering_adversarial_video_tpu.engine import AttackConfig, AttackEngine
    from flickering_adversarial_video_tpu.models.i3d import InceptionI3D

    model = InceptionI3D(num_classes=400, compute_dtype=compute_dtype)
    packed_model = InceptionI3D(
        num_classes=400, compute_dtype=compute_dtype, prepacked_stem_input=True
    )
    return AttackEngine(
        lambda v, x: model.apply(v, x)[0],
        variables,
        FlickerSpec(frames=frames),
        AttackConfig(),
        track_probs=False,
        apply_packed_fn=lambda v, xp: packed_model.apply(v, xp)[0],
    )


def build_r2plus1d_engine(compute_dtype, frames=16, size=112):
    """Torch-world secondary benchmark: r2plus1d_18 universal-attack step
    (r2plus1d_main_universal_attack.py:130-149 geometry, batch 16).
    Returns (engine, variables) — the variables are f32 and shared with the
    naive f32 replay model of time_torch_reference_protocol."""
    from flickering_adversarial_video_tpu.attack import TorchStyleFlickerSpec
    from flickering_adversarial_video_tpu.engine import AttackConfig, AttackEngine
    from flickering_adversarial_video_tpu.models.video_resnet import (
        make_packed_apply_fn,
        r2plus1d_18,
    )

    model = r2plus1d_18(compute_dtype=compute_dtype)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, frames, size, size, 3), jnp.float32)
    )
    spec = TorchStyleFlickerSpec(frames=frames, max_norm=0.1)
    cfg = AttackConfig(
        norm_world="meanstd", reg_weighting="torch", learning_rate=1e-3
    )
    engine = AttackEngine(
        model.apply,
        variables,
        spec,
        cfg,
        track_probs=False,
        apply_packed_fn=make_packed_apply_fn("r2plus1d_18", 400, compute_dtype),
    )
    return engine, variables


def time_torch_reference_protocol(variables, batch, frames=16, size=112):
    """DataParallel-era torch universal-attack step replayed on the same
    chip (the falsifiable denominator behind torch_vs_baseline — VERDICT r4
    item 1).  Per step, the reference runs a clean no-grad forward, an
    adversarial forward, backward over delta only, and an Adam step, all
    f32 (utils_cv/action_recognition/model.py:697-737), with the
    mean/std-normalized batch fed by DataLoader workers each step.

    Protocol mirror of `time_reference_protocol` (the I3D denominator):
      * naive f32 r2plus1d_18 — plain XLA lowering, none of this
        framework's packed/kernel paths;
      * TWO compiled calls per step (the clean forward is separate from
        the train call, as the reference's two model invocations are);
      * batch DEVICE-RESIDENT and the calls chained fetch-free —
        conservative in the baseline's favor on a tunneled chip (its
        DataLoader feed + per-step metric fetches are ~free on local
        PCIe but ~35 ms RTT here);
      * Perturbation math per model.py:80-101: clamp delta to +-max_norm,
        /std, add, scalar clamp to the normalized-pixel range; improved
        hinge loss on probs + torch-weighted flickering regularizer
        (beta1*thinness + (1-beta1)*(diff+laplacian), model.py:198-209).
    """
    import optax

    from flickering_adversarial_video_tpu.attack import TorchStyleFlickerSpec
    from flickering_adversarial_video_tpu.models.video_resnet import r2plus1d_18

    spec = TorchStyleFlickerSpec(frames=frames, max_norm=0.1)
    model = r2plus1d_18(compute_dtype=jnp.float32)
    mean = np.asarray(spec.mean, np.float32)
    std = np.asarray(spec.std, np.float32)
    min_v, max_v = spec.clamp_range
    opt = optax.adam(1e-3)
    beta1 = 0.1

    @jax.jit
    def train_call(delta, video, labels, opt_state):
        def loss_fn(d):
            dc = jnp.clip(d, -spec.max_norm, spec.max_norm) / jnp.asarray(
                std, jnp.float32
            )
            adv = jnp.clip(video + dc[None], min_v, max_v)
            logits = model.apply(variables, adv)
            probs = jax.nn.softmax(logits)
            one_hot = jax.nn.one_hot(labels, 400)
            label_prob = jnp.sum(probs * one_hot, -1)
            max_other = jnp.max(probs - one_hot, -1)
            gap = label_prob - (max_other - 0.05)
            adv_loss = jnp.mean(jnp.maximum(0, jnp.minimum(gap**2 / 0.05, gap)))
            thin = jnp.mean(d**2)
            diff = jnp.mean((d - jnp.roll(d, 1, 0)) ** 2)
            lap = jnp.mean((-2 * d + jnp.roll(d, 1, 0) + jnp.roll(d, -1, 0)) ** 2)
            reg = beta1 * thin + (1 - beta1) * (diff + lap)
            return adv_loss + reg

        loss, g = jax.value_and_grad(loss_fn)(delta)
        updates, opt_state = opt.update(g, opt_state, delta)
        return optax.apply_updates(delta, updates), opt_state, loss

    @jax.jit
    def clean_fwd(video):
        return model.apply(variables, video)

    video_norm = (
        np.asarray(batch["video"], np.float32) / 255.0 - mean
    ) / std
    video = jax.device_put(video_norm)
    labels = jax.device_put(batch["labels"])
    delta = jnp.zeros(spec.shape, jnp.float32)
    opt_state = opt.init(delta)

    @jax.jit
    def chain_zero(logits_c):
        # keeps the unread clean-forward execution from being elided by the
        # axon runtime (same trick as the I3D protocol's fetch chain)
        return 0.0 * logits_c.ravel()[0]

    def one_step(delta, opt_state):
        logits_c = clean_fwd(video)  # model.py:697-699 (no_grad)
        delta, opt_state, loss = train_call(delta, video, labels, opt_state)
        delta = delta + chain_zero(logits_c)
        return delta, opt_state, loss

    delta, opt_state, _ = one_step(delta, opt_state)  # warmup/compiles
    _ = float(delta.reshape(-1)[0])
    best = 0.0
    for _trial in range(2):
        ref_steps = 8
        t0 = time.perf_counter()
        for _ in range(ref_steps):
            delta, opt_state, _ = one_step(delta, opt_state)
        _ = float(delta.reshape(-1)[0])
        best = max(best, ref_steps / (time.perf_counter() - t0))
    return best


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

    @jax.jit
    def chain_zero(probs, logits_c):
        # scalar that is always 0 but data-depends on both fetch results:
        # folded into delta so the axon runtime cannot elide the unobserved
        # softmax/clean-logits executions (it skips independent unread work)
        return 0.0 * (probs.ravel()[0] + logits_c.ravel()[0])

    def one_reference_step(delta, opt_state, fetch):
        delta, opt_state, loss = train_call(delta, get_video(), labels, opt_state)
        probs = softmax_fetch(delta, get_video())
        logits_c = clean_logits_fetch(get_video())
        if fetch:
            # the protocol's per-sess.run host fetches
            # (single_video_npy.py:213-308)
            for v in (loss, probs, logits_c, delta):
                _ = np.asarray(v)
        else:
            delta = delta + chain_zero(probs, logits_c)
        return delta, opt_state, loss

    def timed_trial(delta, opt_state, ref_steps=8, fetch=False):
        t0 = time.perf_counter()
        for _ in range(ref_steps):
            delta, opt_state, _ = one_reference_step(delta, opt_state, fetch)
        # read DELTA, not loss: delta carries the chain_zero fold of the last
        # step's softmax/clean-logits results, so the readback forces every
        # dispatched program inside the window (loss would leave the final
        # step's two fetch forwards running into the next trial)
        _ = float(delta.reshape(-1)[0])
        return ref_steps / (time.perf_counter() - t0), delta, opt_state

    # warmup (compiles)
    delta, opt_state, _ = one_reference_step(delta, opt_state, fetch=True)
    # CONSERVATIVE (pro-baseline) timing: the reference fetches loss/probs/
    # logits/pert to the host every sess.run — nearly free over its GPU's
    # PCIe, but ~35 ms tunnel RTT each here, which would deflate the baseline
    # through no fault of its own.  So the timed loop chains the three
    # compiled calls per step WITHOUT host fetches (device work only), runs
    # two trials and keeps the faster — a stable upper bound on the
    # baseline's step rate (run-to-run spread was 1.14-1.49 steps/s with
    # in-loop fetches).
    best = 0.0
    for _ in range(2):
        rate, delta, opt_state = timed_trial(
            delta, opt_state, fetch=feed_per_step
        )
        best = max(best, rate)
    return best


def main():
    # Secondary metrics (geometry variants, staged-gate A/Bs, vector sweep)
    # each cost a compile — minutes each when the persistent cache is cold on
    # the remote-compile service.  The headline must never be lost to a
    # driver-side timeout while a secondary compiles, so once the elapsed
    # wall clock passes this budget the remaining secondaries are skipped
    # (recorded in the JSON) and the result prints with what was measured.
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_TIME_BUDGET_S", 1800))
    skipped = []

    def over_budget(tag):
        if time.perf_counter() - t_start > budget_s:
            skipped.append(tag)
            return True
        return False

    rng = np.random.default_rng(0)
    batch = {
        "video": rng.integers(0, 255, (BATCH, FRAMES, SIZE, SIZE, 3), dtype=np.uint8),
        "labels": rng.integers(0, 400, (BATCH,), dtype=np.int64),
    }

    engine, model, variables = build_engine(jnp.bfloat16)
    optimized = time_optimized(engine, batch)

    # reference protocol replays the f32 multi-fetch session loop on the
    # naive model — unpacked stem AND plain reduce-window/select-and-scatter
    # pools, the lowering the reference's TF1 graph gets.  Without
    # naive_pools the baseline silently inherited this framework's custom
    # pool routing; measured round 3, that routing actually HURT the f32
    # unpacked baseline (1.751 -> 1.834 steps/s plain), so the fix makes the
    # denominator honest AND slightly stronger (vs_baseline 6.48 -> 6.17).
    _, model_f32, variables_f32 = build_engine(
        jnp.float32, packed_stem=False, naive_pools=True
    )
    baseline = time_reference_protocol(model_f32, variables_f32, batch)

    # Host-prepacked input IS the production default (universal/class-gen
    # runners, PREPACK_INPUT=true): the native reader emits the packed layout
    # during its record copy (tfr_read_batch_packed, measured 1.36 GB/s
    # single-thread vs the 830 MB/s streaming budget), so the device program
    # never pays the space-to-depth relayout.  That configuration is the
    # headline; the on-device-pack rate (u8 batches straight from the wire
    # schema) is reported alongside.
    try:
        from flickering_adversarial_video_tpu.data.packing import pack_video_np

        packed_batch = {
            "video_packed": pack_video_np(batch["video"]),
            "labels": batch["labels"],
        }
        prepacked = time_optimized(engine, packed_batch)
    except Exception:
        prepacked = None
    # View-prepacked input ([H',W',8C,T'B] batch-in-lanes, assembled on the
    # host by the native SIMD transpose): the runners upgrade to it whenever
    # the engine's T-major head will take it (make_shard_batches +
    # engine.view_input_eligible), which this geometry satisfies — so when
    # eligible, THIS is the production default the headline must measure
    # (measured on-chip 2026-08-19: 16.36 -> 16.73 steps/s, the last
    # device-side layout crossing gone).
    view = None
    try:
        if engine.view_input_eligible(BATCH, FRAMES):
            from flickering_adversarial_video_tpu.data.packing import (
                pack_batch_view_np,
            )

            view_batch = {
                "video_view": pack_batch_view_np(batch["video"]),
                "labels": batch["labels"],
            }
            view = time_optimized(engine, view_batch)
    except Exception:
        view = None
    # the production-default input mode IS the headline (view when eligible,
    # else prepacked) — do NOT take max(), so a default-path regression
    # shows up in the primary metric
    headline = next(
        (r for r in (view, prepacked, optimized) if r is not None), optimized
    )

    result = {
        "metric": "attack steps/sec/chip (I3D 64x224x224, batch 8)",
        "value": round(headline, 3),
        "unit": "steps/s",
        "vs_baseline": round(headline / baseline, 2),
        "baseline_reference_protocol_steps_per_s": round(baseline, 3),
        "device_pack_steps_per_s": round(optimized, 3),
    }
    if prepacked is not None:
        result["prepacked_input_steps_per_s"] = round(prepacked, 3)
    if view is not None:
        result["view_input_steps_per_s"] = round(view, 3)

    # MFU of the headline step from the compiler's own cost model (VERDICT
    # r2 item 1: make the perf claim falsifiable).  flops counts every op in
    # the final optimized HLO of the fused program; peak = 197 TF/s bf16 v5e.
    try:
        if view is not None:
            headline_batch = view_batch
        elif prepacked is not None:
            headline_batch = packed_batch
        else:
            headline_batch = batch
        flops, bytes_accessed = step_cost_analysis(engine, headline_batch)
        if flops:
            step_time = 1.0 / headline
            result["flops_per_step"] = round(flops)
            result["mfu_pct"] = round(flops / step_time / V5E_PEAK_FLOPS * 100, 2)
            if bytes_accessed:
                result["hbm_bytes_per_step"] = round(bytes_accessed)
                # bandwidth-side utilization vs v5e 819 GB/s HBM
                result["hbm_util_pct"] = round(
                    bytes_accessed / step_time / 819e9 * 100, 2
                )
            # flops_per_step / hbm_bytes_per_step include analytic accounting
            # of every Pallas custom call in the step (ops/accounting.py)
            result["cost_model"] = "custom-call-inclusive"
    except Exception as e:
        result["cost_analysis_error"] = repr(e)[:120]

    # Secondary geometries (extra JSON fields; VERDICT round 1 item 6):
    # the single-video config (#1: B=1, T=90) and the torch-world universal
    # step (r2plus1d_18, B=16, 16x112x112).  BENCH_HEADLINE_ONLY=1 skips
    # them (fast A/B of env-gated kernel experiments on the tunneled chip).
    if os.environ.get("BENCH_HEADLINE_ONLY"):
        print(json.dumps(result))
        return

    # Round-3 staged-gate A/Bs are settled (measured on-chip 2026-08-18,
    # PERF.md round-3 table): FLICKER_STEM_OUTPACK at B=8 lost (11.85 ->
    # 8.22 steps/s) and stays off above batch 1; FLICKER_POOL_SAVE_Y won
    # (11.845 -> 11.949) and FLICKER_RESNET_OUTPACK won (22.83 -> 23.53) —
    # both are now the defaults the headline measures.  The B=1 single-video
    # geometry below picks up its measured winner (fused stem + force-custom
    # strided pools, 29.47 -> 31.71) automatically via the batch-aware
    # default in models/i3d.py.
    try:
        if over_budget("single_video"):
            raise TimeoutError("bench time budget")
        sv_engine = build_i3d_geometry_engine(variables, jnp.bfloat16, frames=90)
        sv_batch = {
            "video": rng.integers(0, 255, (1, 90, SIZE, SIZE, 3), dtype=np.uint8),
            "labels": rng.integers(0, 400, (1,), dtype=np.int64),
        }
        # chunk=30: at ~33 ms device step the 10-step chain still paid ~12%
        # tunnel RTT per dispatch; one 30-step scan per dispatch drops that
        # under 4% (xplane device time is the ground truth either way)
        result["single_video_T90_B1_steps_per_s"] = round(
            time_optimized(sv_engine, sv_batch, steps=60, chunk=30), 3
        )
    except Exception as e:  # secondary metric must not sink the headline
        result["single_video_T90_B1_error"] = repr(e)[:120]
    # Vectorized per-video sweep (engine/vector_sweep.py): slots x T90 clips
    # in flight, each with its own delta/Adam/stop-rule.  clip-steps/s vs the
    # sequential single_video rate above.  Honest-fencing note (PERF.md):
    # with value-readback fences this measures ~29 vs 32 sequential — the
    # B=1-specialized kernel path beats slot-batching per-clip on ONE chip
    # (slots>=2 loses the batch-aware stem/pool gates); the sweep's value is
    # mesh scale-out of the slot axis.
    try:
        if over_budget("vector_sweep"):
            raise TimeoutError("bench time budget")
        from flickering_adversarial_video_tpu.engine import RuntimeFlags
        from flickering_adversarial_video_tpu.engine.vector_sweep import (
            VectorSweepEngine,
        )

        slots, vchunk, vtrials = 4, 30, 2
        vs_engine = build_i3d_geometry_engine(variables, jnp.bfloat16, frames=90)
        vse = VectorSweepEngine(vs_engine, slots, n_iter=10**9)
        vvideos = jnp.asarray(
            rng.integers(0, 255, (slots, 90, SIZE, SIZE, 3), dtype=np.uint8)
        )
        vlabels = jnp.asarray(rng.integers(0, 400, (slots,), dtype=np.int32))
        vkeys = jax.vmap(jax.random.key)(jnp.arange(slots, dtype=jnp.uint32))
        vstate = vse.init_slots(list(range(slots)))
        for i in range(slots):
            vstate = vse.refill_slot(vstate, i, i, 0.4)
        vflags = RuntimeFlags(max_norm=0.4)
        vstate, _ = vse.run_chunk(vstate, vvideos, vlabels, vkeys, vflags, vchunk)
        # value READBACK as the fence: block_until_ready is not a reliable
        # completion fence on the tunneled (axon) chip (PERF.md round-3
        # measurement notes); subtract the readback RTT
        _ = float(jnp.sum(vstate.delta.astype(jnp.float32)))
        t0 = time.perf_counter()
        _ = float(jnp.sum(vstate.delta.astype(jnp.float32)))
        v_rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(vtrials):
            vstate, _ = vse.run_chunk(
                vstate, vvideos, vlabels, vkeys, vflags, vchunk
            )
        _ = float(jnp.sum(vstate.delta.astype(jnp.float32)))
        v_elapsed = max(time.perf_counter() - t0 - v_rtt, 1e-9)
        result["vector_sweep4_T90_clip_steps_per_s"] = round(
            slots * vchunk * vtrials / v_elapsed, 3
        )
    except Exception as e:
        result["vector_sweep4_T90_error"] = repr(e)[:120]
    try:
        if over_budget("r2plus1d"):
            raise TimeoutError("bench time budget")
        r2_engine, r2_variables = build_r2plus1d_engine(jnp.bfloat16)
        r2_batch = {
            "video": rng.integers(0, 255, (16, 16, 112, 112, 3), dtype=np.uint8),
            "labels": rng.integers(0, 400, (16,), dtype=np.int64),
        }
        r2_rate = time_optimized(r2_engine, r2_batch, steps=30)
        result["r2plus1d_18_T16_B16_steps_per_s"] = round(r2_rate, 3)
        # the torch world gets the same falsifiability treatment as I3D
        # (VERDICT r4 item 1): a same-chip torch-reference-protocol
        # denominator + custom-call-inclusive MFU/HBM from the cost model
        try:
            if over_budget("torch_baseline"):
                raise TimeoutError("bench time budget")
            torch_baseline = time_torch_reference_protocol(r2_variables, r2_batch)
            result["torch_baseline_steps_per_s"] = round(torch_baseline, 3)
            result["torch_vs_baseline"] = round(r2_rate / torch_baseline, 2)
        except Exception as e:
            result["torch_baseline_error"] = repr(e)[:120]
        try:
            r2_flops, r2_bytes = step_cost_analysis(r2_engine, r2_batch)
            if r2_flops:
                r2_time = 1.0 / r2_rate
                result["torch_flops_per_step"] = round(r2_flops)
                result["torch_mfu_pct"] = round(
                    r2_flops / r2_time / V5E_PEAK_FLOPS * 100, 2
                )
            if r2_bytes:
                result["torch_hbm_bytes_per_step"] = round(r2_bytes)
                result["torch_hbm_util_pct"] = round(
                    r2_bytes / (1.0 / r2_rate) / 819e9 * 100, 2
                )
        except Exception as e:
            result["torch_cost_analysis_error"] = repr(e)[:120]
    except Exception as e:
        result["r2plus1d_18_T16_B16_error"] = repr(e)[:120]
    # The reference's ACTUAL per-sess.run host->device f32 feed costs ~10 min
    # to measure through a tunneled chip (3x308MB per step); opt-in.
    # Last measured here: 0.018-0.036 steps/s (~300x slower than optimized).
    if os.environ.get("BENCH_FEED_BASELINE"):
        baseline_feed = time_reference_protocol(
            model_f32, variables_f32, batch, feed_per_step=True
        )
        result["baseline_with_per_step_feed_steps_per_s"] = round(baseline_feed, 3)

    if skipped:
        result["secondaries_skipped_time_budget"] = skipped
    print(json.dumps(result))


if __name__ == "__main__":
    main()
