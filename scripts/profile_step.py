"""Capture an xplane trace of the fused attack step and print per-op times.

Usage:  python scripts/profile_step.py [--steps N] [--outdir DIR]

Parses the raw .xplane.pb with tensorboard_plugin_profile and prints the
top HLO ops by self-time — the per-op roofline evidence VERDICT.md asked
for (round-1 component timings were measured with hand-built sub-programs;
this is the ground-truth breakdown of the *actual* fused step).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def capture_r2plus1d(outdir: str, steps: int, frames: int, size: int, batch: int):
    """Profile the torch-world universal step (r2plus1d_18)."""
    from bench import build_r2plus1d_engine
    from flickering_adversarial_video_tpu.engine import RuntimeFlags

    import jax.numpy as jnp

    engine, _variables = build_r2plus1d_engine(jnp.bfloat16, frames=frames, size=size)
    flags = RuntimeFlags(max_norm=0.1)
    state = engine.init_state()
    rng = np.random.default_rng(0)
    batch_data = {
        "video": jax.device_put(
            rng.integers(0, 256, (batch, frames, size, size, 3), dtype=np.uint8)
        ),
        "labels": jax.device_put(rng.integers(0, 400, (batch,), dtype=np.int32)),
    }
    key = jax.random.key(0)
    for _ in range(3):
        state, _ = engine.train_step(state, batch_data, flags, key)
    jax.block_until_ready(state.delta)
    with jax.profiler.trace(outdir):
        for _ in range(steps):
            state, _ = engine.train_step(state, batch_data, flags, key)
        jax.block_until_ready(state.delta)
    print(f"trace written to {outdir}")


def capture(outdir: str, steps: int, frames: int, size: int, batch: int,
            prepacked: bool = False):
    from flickering_adversarial_video_tpu.attack import FlickerSpec
    from flickering_adversarial_video_tpu.engine import (
        AttackConfig,
        AttackEngine,
        RuntimeFlags,
    )
    from flickering_adversarial_video_tpu.models.i3d import (
        InceptionI3D,
        init_i3d_params,
        make_packed_apply_fn,
    )

    import jax.numpy as jnp

    # build for the REQUESTED geometry (bench.build_engine hard-codes its own)
    model = InceptionI3D(num_classes=400, compute_dtype=jnp.bfloat16)
    variables = init_i3d_params(jax.random.key(0), frames=frames, size=size)
    stem_head = None
    if prepacked and os.environ.get("FLICKER_TMAJOR_HEAD", "") != "0":
        # match the production default (bench.build_engine / runners/common):
        # the T-major fused head on the prepacked path — the engine
        # auto-gates eligibility and falls back if the geometry is wrong
        from flickering_adversarial_video_tpu.models.i3d import build_stem_head

        stem_head = build_stem_head(
            variables, compute_dtype=jnp.bfloat16, tmajor=True
        )
    engine = AttackEngine(
        lambda v, x: model.apply(v, x)[0],
        variables,
        FlickerSpec(frames=frames),
        AttackConfig(),
        track_probs=False,
        apply_packed_fn=make_packed_apply_fn(400, jnp.bfloat16),
        stem_head=stem_head,
    )
    flags = RuntimeFlags()
    state = engine.init_state()
    rng = np.random.default_rng(0)
    video = rng.integers(0, 256, (batch, frames, size, size, 3), dtype=np.uint8)
    if prepacked == "view":
        from flickering_adversarial_video_tpu.data.packing import pack_batch_view_np

        batch_data = {"video_view": jax.device_put(pack_batch_view_np(video))}
    elif prepacked:
        from flickering_adversarial_video_tpu.data.packing import pack_video_np

        batch_data = {"video_packed": jax.device_put(pack_video_np(video))}
    else:
        batch_data = {"video": jax.device_put(video)}
    batch_data["labels"] = jax.device_put(
        rng.integers(0, 400, (batch,), dtype=np.int32)
    )
    key = jax.random.key(0)
    for _ in range(3):
        state, _ = engine.train_step(state, batch_data, flags, key)
    jax.block_until_ready(state.delta)

    with jax.profiler.trace(outdir):
        for _ in range(steps):
            state, _ = engine.train_step(state, batch_data, flags, key)
        jax.block_until_ready(state.delta)
    print(f"trace written to {outdir}")


def summarize(outdir: str, top: int = 40, steps: int = 10, show_text: int = 0):
    """Per-HLO-op roofline table from the trace via xprof's hlo_stats."""
    import json as json_lib

    from xprof.convert import raw_to_tool_data as r

    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print("no xplane.pb found under", outdir)
        return
    data, _ = r.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    obj = json_lib.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["label"] for c in obj["cols"]]
    ix = {c: i for i, c in enumerate(cols)}
    rows = [[c.get("v") for c in row["c"]] for row in obj["rows"]]
    rows.sort(key=lambda q: -(q[ix["Total self time (us)"]] or 0))
    tot = sum(q[ix["Total self time (us)"]] or 0 for q in rows)
    print(f"total self time {tot/1e3:.2f} ms -> {tot/steps/1e3:.2f} ms/step")
    print(f"{'us/step':>9} {'%':>5} {'cat':<18} {'GF/s':>7} {'GiB/s':>6} {'bound':<8} op")
    for q in rows[:top]:
        us = (q[ix["Total self time (us)"]] or 0) / steps
        pct = 100 * (q[ix["Total self time (us)"]] or 0) / tot
        cat = (q[ix["HLO op category"]] or "")[:18]
        gf = q[ix["Model GFLOP/s"]] or 0
        bw = q[ix["Measured memory BW (GiB/s)"]] or 0
        bound = (q[ix["Bound by"]] or "")[:8]
        name = (q[ix["HLO op name"]] or "")[:80]
        print(f"{us:9.1f} {pct:5.1f} {cat:<18} {gf:7.0f} {bw:6.0f} {bound:<8} {name}")
        if show_text:
            print("   ", (q[ix["HLO op text"]] or "").replace("\n", " ")[:220])
    groups = {}
    for q in rows:
        cat = q[ix["HLO op category"]] or "?"
        groups[cat] = groups.get(cat, 0.0) + (q[ix["Total self time (us)"]] or 0)
    print("\n-- by category --")
    for name, us in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"{us/steps:9.1f} {100*us/tot:5.1f}  {name}")
    return rows, ix, tot


_DTYPE_BYTES = {
    "bf16": 2, "f16": 2, "f32": 4, "f64": 8, "u8": 1, "s8": 1, "pred": 1,
    "u16": 2, "s16": 2, "u32": 4, "s32": 4, "u64": 8, "s64": 8,
}


def _logical_bytes(hlo_text: str) -> int:
    """Sum of logical operand+output bytes parsed from one op's HLO text —
    the MINIMUM HBM traffic if every tensor is touched exactly once (no
    padding, no re-reads).  A lower bound for memory SoL."""
    import re

    total = 0
    for m in re.finditer(r"\b(bf16|f16|f32|f64|u8|s8|u16|s16|u32|s32|u64|s64|pred)\[([0-9,]*)\]", hlo_text):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def sol_table(rows, ix, tot, steps: int, peak_flops=197e12, peak_bw=819e9, top=25):
    """Per-op speed-of-light bound: max(model FLOPs / MXU peak, measured
    bytes / HBM peak).  Measured bytes = xprof's measured BW x self time —
    the bytes the op ACTUALLY moved, so per-op SoL never exceeds measured
    time and the step-level ratio is a defensible same-program-at-peak
    bound (the falsifiable wall claim VERDICT r2 asked for).  Logical
    operand+output bytes from the op's HLO shapes print alongside as the
    byte-reduction headroom signal (logical << measured means the op moves
    padding/relayout bytes a better layout could avoid)."""
    print(f"\n-- speed-of-light (peak {peak_flops/1e12:.0f} TF/s, {peak_bw/1e9:.0f} GB/s) --")
    print(f"{'us/step':>9} {'sol_us':>8} {'x':>5} {'logGB/s':>8}  {'bound':<7} op")
    entries = []
    for q in rows:
        us = (q[ix["Total self time (us)"]] or 0) / steps
        if us <= 0:
            continue
        gf = q[ix["Model GFLOP/s"]] or 0
        bw = q[ix["Measured memory BW (GiB/s)"]] or 0
        flops = gf * 1e9 * us / 1e6  # model flops per step for this op
        meas_bytes = bw * 2**30 * us / 1e6
        logical = _logical_bytes(q[ix["HLO op text"]] or "")
        sol_c = flops / peak_flops * 1e6
        sol_m = meas_bytes / peak_bw * 1e6
        sol = min(max(sol_c, sol_m), us)
        bound = "compute" if sol_c >= sol_m else "memory"
        entries.append((us, sol, bound, logical, q[ix["HLO op name"]] or ""))
    entries.sort(key=lambda e: -e[0])
    for us, sol, bound, logical, name in entries[:top]:
        ratio = us / sol if sol > 0 else float("inf")
        log_bw = logical / (us / 1e6) / 1e9 if us else 0
        print(f"{us:9.1f} {sol:8.1f} {ratio:5.1f} {log_bw:8.0f}  {bound:<7} {name[:64]}")
    tot_us = sum(e[0] for e in entries)
    tot_sol = sum(e[1] for e in entries)
    print(f"\nstep: measured {tot_us/1e3:.2f} ms, SoL sum {tot_sol/1e3:.2f} ms "
          f"-> step runs at {100*tot_sol/tot_us:.0f}% of same-program-at-peak "
          f"speed of light")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--outdir", default="/tmp/xtrace")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--prepacked", action="store_true")
    ap.add_argument(
        "--view", action="store_true",
        help="feed host view-prepacked [H',W',8C,T'B] input (production default)",
    )
    ap.add_argument("--model", default="i3d", choices=["i3d", "r2plus1d_18"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--show-text", type=int, default=0)
    ap.add_argument("--sol", action="store_true", help="print per-op speed-of-light table")
    args = ap.parse_args()
    if args.model == "r2plus1d_18":
        # torch-world bench geometry (PERF.md): only override what the user
        # left at the I3D defaults
        if args.frames == 64:
            args.frames = 16
        if args.size == 224:
            args.size = 112
        if args.batch == 8:
            args.batch = 16
        if args.prepacked:
            ap.error("--prepacked is a tanh-world (i3d) pipeline feature")
    if not args.parse_only:
        if args.model == "r2plus1d_18":
            capture_r2plus1d(args.outdir, args.steps, args.frames, args.size, args.batch)
        else:
            capture(
                args.outdir, args.steps, args.frames, args.size, args.batch,
                prepacked="view" if args.view else args.prepacked,
            )
    out = summarize(args.outdir, args.top, steps=args.steps, show_text=args.show_text)
    if args.sol and out:
        rows, ix, tot = out
        sol_table(rows, ix, tot, steps=args.steps, top=args.top)
