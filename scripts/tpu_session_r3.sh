#!/bin/sh
# Round-3 measurement sequence (runs unattended once the tunnel is back).
# ONE jax process at a time — strictly serial.  Writes /tmp/tpu_r3/*.log.
#
# DEADLINE: the chip serializes across processes, so a session still running
# when the round driver launches its own bench would make the DRIVER queue
# and time out — worse than missing these A/Bs (bench.py measures the two
# main gates itself).  Each step refuses to start past the deadline
# (default 18:00 UTC today; override with TPU_SESSION_DEADLINE=<epoch>).
set -x
OUT=/tmp/tpu_r3
mkdir -p $OUT
cd /root/repo

DEADLINE=${TPU_SESSION_DEADLINE:-$(date -u -d 18:00 +%s 2>/dev/null || echo 9999999999)}
check_deadline() {
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "deadline reached — leaving the chip for the round driver" >&2
    exit 1
  fi
}

# 0) chip sanity
python -c "import jax; print(jax.devices())" > $OUT/00_devices.log 2>&1 || exit 1

check_deadline
# 1) headline A/B: default vs outpacked stem+pool
BENCH_HEADLINE_ONLY=1 timeout 3000 python bench.py > $OUT/10_default.json 2>$OUT/10_default.err
BENCH_HEADLINE_ONLY=1 FLICKER_STEM_OUTPACK=1 timeout 3000 python bench.py > $OUT/11_outpack.json 2>$OUT/11_outpack.err

check_deadline
# 1b) pool backward reuse-vs-recompute (FLICKER_POOL_SAVE_Y): carry the
# forward's pooled value as a residual, skip the bwd pool_T recompute
BENCH_HEADLINE_ONLY=1 FLICKER_POOL_SAVE_Y=1 timeout 3000 python bench.py > $OUT/12_save_y.json 2>$OUT/12_save_y.err

check_deadline
# 2) region microbench (attribution)
timeout 2400 python scripts/ab_stem_pool.py > $OUT/20_region.log 2>&1

check_deadline
# 3) B=1 single-video with chunk=30 chains, default vs outpack
timeout 3000 python - > $OUT/30_b1.log 2>&1 <<'EOF'
import os, numpy as np, jax, jax.numpy as jnp, json
import bench
rng = np.random.default_rng(0)
sv_batch = {
    "video": rng.integers(0, 255, (1, 90, 224, 224, 3), dtype=np.uint8),
    "labels": rng.integers(0, 400, (1,), dtype=np.int64),
}
_, _, variables = bench.build_engine(jnp.bfloat16)
for tag, outpack, force_custom in (
    ("default", "0", "0"),
    ("outpack", "1", "0"),
    ("force_custom_pools", "0", "1"),   # PERF.md: re-measure under chained timing
    ("outpack+force_custom", "1", "1"),
):
    os.environ["FLICKER_STEM_OUTPACK"] = outpack
    os.environ["FLICKER_POOL_FORCE_CUSTOM"] = force_custom
    eng = bench.build_i3d_geometry_engine(variables, jnp.bfloat16, frames=90)
    r = bench.time_optimized(eng, sv_batch, steps=60, chunk=30)
    print(json.dumps({"tag": tag, "single_video_T90_B1_steps_per_s": round(r, 3)}), flush=True)
EOF

check_deadline
# 3a) vectorized per-video sweep throughput: slots x T90 clips in flight
# (engine/vector_sweep.py) vs the sequential B=1 rate from step 3
timeout 3000 python - > $OUT/33_vsweep.log 2>&1 <<'EOF'
import time, numpy as np, jax, jax.numpy as jnp, json
import bench
from flickering_adversarial_video_tpu.engine import RuntimeFlags
from flickering_adversarial_video_tpu.engine.vector_sweep import VectorSweepEngine
rng = np.random.default_rng(0)
_, _, variables = bench.build_engine(jnp.bfloat16)
for slots in (2, 4):
    eng = bench.build_i3d_geometry_engine(variables, jnp.bfloat16, frames=90)
    vse = VectorSweepEngine(eng, slots, n_iter=10**9)  # no stop inside timing
    videos = jnp.asarray(rng.integers(0, 255, (slots, 90, 224, 224, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 400, (slots,), dtype=np.int32))
    keys = jax.vmap(jax.random.key)(jnp.arange(slots, dtype=jnp.uint32))
    state = vse.init_slots(list(range(slots)))
    for i in range(slots):
        state = vse.refill_slot(state, i, i, 0.4)
    flags = RuntimeFlags(max_norm=0.4)
    chunk = 30
    state, _ = vse.run_chunk(state, videos, labels, keys, flags, chunk)  # compile
    jax.block_until_ready(state.delta)
    t0 = time.perf_counter()
    trials = 3
    for _ in range(trials):
        state, _ = vse.run_chunk(state, videos, labels, keys, flags, chunk)
    jax.block_until_ready(state.delta)
    rate = slots * chunk * trials / (time.perf_counter() - t0)
    print(json.dumps({"slots": slots, "vector_sweep_clip_steps_per_s": round(rate, 2)}), flush=True)
EOF

check_deadline
# 3b) torch-world secondary: r2plus1d_18 with/without the layer-conv outpack
timeout 3000 python - > $OUT/35_r2.log 2>&1 <<'EOF'
import os, numpy as np, jax, jax.numpy as jnp, json
import bench
rng = np.random.default_rng(0)
r2_batch = {
    "video": rng.integers(0, 255, (16, 16, 112, 112, 3), dtype=np.uint8),
    "labels": rng.integers(0, 400, (16,), dtype=np.int64),
}
for tag, env in (("default", "0"), ("resnet_outpack", "1")):
    os.environ["FLICKER_RESNET_OUTPACK"] = env
    eng, _vars = bench.build_r2plus1d_engine(jnp.bfloat16)
    r = bench.time_optimized(eng, r2_batch, steps=30)
    print(json.dumps({"tag": tag, "r2plus1d_18_T16_B16_steps_per_s": round(r, 3)}), flush=True)
EOF

check_deadline
# 4) full bench with whichever won (recorded; default unless outpack clearly wins)
timeout 4800 python bench.py > $OUT/40_full_default.json 2>$OUT/40_full.err

check_deadline
# 5) xplane per-op profile of the current prepacked headline step
timeout 3000 python scripts/profile_step.py --prepacked --steps 10 \
  --outdir /tmp/xtrace_r3 > $OUT/50_xplane.log 2>&1

# mark done ONLY if the primary A/B actually produced parseable benchmarks —
# a tunnel flap mid-session must leave the watcher retrying, not satisfied
if python - <<'EOF'
import json, sys
for f in ("/tmp/tpu_r3/10_default.json", "/tmp/tpu_r3/11_outpack.json"):
    json.load(open(f))
EOF
then
  echo DONE > $OUT/99_done
else
  echo "session incomplete (benchmarks missing); leaving 99_done unset" >&2
  exit 1
fi
