"""Host input-pipeline throughput on a synthetic local-disk shard set.

ROADMAP item 3 / VERDICT round-1 item 7: the streaming budget for the
universal attack is batch 8 x 64f x 224^2 uint8 (~77 MB) per ~80-130 ms step
=> the host pipeline must sustain >= ~830 MB/s of parsed video bytes.  The
tunneled bench chip caps host->device at ~8 MB/s, so this asserts the HOST
side (shard read + proto parse + batch assembly) on local disk, which needs
no chip at all.

Default footprint ~270 MB (fast enough for the suite); scale with
FLICKER_TPUT_MB for a full-GB run.  Numbers land in PERF.md.
"""

import os
import time

import numpy as np
import pytest

from flickering_adversarial_video_tpu.data.tfrecord import (
    TFRecordWriter,
    make_uint8_example,
    tfrecord_batches,
)

FRAMES, SIZE = 64, 224
REC_BYTES = FRAMES * SIZE * SIZE * 3  # ~9.6 MB
TOTAL_MB = int(os.environ.get("FLICKER_TPUT_MB", "270"))
BUDGET_MBPS = 830.0


@pytest.fixture(scope="module")
def shard_set(tmp_path_factory):
    root = tmp_path_factory.mktemp("tput_shards")
    rng = np.random.default_rng(0)
    n_records = max(4, (TOTAL_MB * 1_000_000) // REC_BYTES)
    n_shards = max(2, n_records // 7)
    video = rng.integers(0, 255, (FRAMES, SIZE, SIZE, 3), dtype=np.uint8)
    paths = []
    written = 0
    per_shard = -(-n_records // n_shards)
    for s in range(n_shards):
        p = str(root / f"train_{s:03d}.tfrecord")
        with TFRecordWriter(p) as w:
            for r in range(per_shard):
                if written >= n_records:
                    break
                # vary the content cheaply (new label + rolled video) so the
                # parser can't be served by any content-level caching
                w.write(make_uint8_example(np.roll(video, r, axis=0), (s + r) % 400))
                written += 1
        paths.append(p)
    total_bytes = sum(os.path.getsize(p) for p in paths)
    return paths, total_bytes


def _measure(make_batches, warmup: bool = True):
    """Time one full epoch; a prior untimed epoch warms page cache and the
    allocator's page pool (first-touch faults on fresh 100+ MB buffers were
    measured to dominate a cold pass: 222 vs 2787 MB/s on the same shards)."""
    if warmup:
        for b in make_batches():
            pass
    t0 = time.perf_counter()
    n = 0
    for b in make_batches():
        assert b["video"].dtype == np.uint8
        n += b["video"].nbytes
    dt = time.perf_counter() - t0
    return n / dt / 1e6, n  # MB/s, bytes seen


@pytest.mark.slow
class TestHostPipelineThroughput:
    def test_native_reader_meets_budget(self, shard_set):
        paths, total_bytes = shard_set
        mbps, seen = _measure(
            lambda: tfrecord_batches(paths, batch_size=8, use_native=True)
        )
        print(f"\nnative reader: {mbps:.0f} MB/s over {seen/1e6:.0f} MB")
        assert mbps >= BUDGET_MBPS, (
            f"native host path {mbps:.0f} MB/s < {BUDGET_MBPS} MB/s budget"
        )

    def test_native_prepacked_meets_budget(self, shard_set):
        # the production path: space-to-depth packed during the record copy
        paths, total_bytes = shard_set
        mbps, seen = _measure(
            lambda: (
                {"video": b["video_packed"], "labels": b["labels"]}
                for b in tfrecord_batches(
                    paths, batch_size=8, frames=FRAMES, use_native=True,
                    prepack=True,
                )
            )
        )
        print(f"\nnative prepacked: {mbps:.0f} MB/s over {seen/1e6:.0f} MB")
        assert mbps >= BUDGET_MBPS, f"prepacked host path {mbps:.0f} MB/s"

    def test_python_reader_works(self, shard_set):
        # pure-Python fallback: correctness-only floor, no budget assert
        paths, _ = shard_set
        mbps, seen = _measure(
            lambda: tfrecord_batches(paths[:2], batch_size=4, use_native=False),
            warmup=False,
        )
        print(f"\npython reader: {mbps:.0f} MB/s over {seen/1e6:.0f} MB")
        assert seen > 0

    def test_grain_steady_state_meets_budget(self, shard_set):
        """grain_stream (ONE persistent multi-epoch loader) must sustain
        >= 200 MB/s at worker_count=4 once worker spawn is amortized
        (VERDICT round 2 item 6).

        The round-2 ~12 MB/s number measured a fresh DataLoader per epoch:
        every epoch re-spawned 4 workers that re-import jax (~10 s each),
        swamping the actual decode throughput.  The production pattern for
        grain is the persistent stream; spawn cost is paid ONCE per attack.
        """
        pytest.importorskip("grain")
        from flickering_adversarial_video_tpu.data.grain_pipeline import grain_stream

        paths, total_bytes = shard_set
        epochs = 3
        stream = grain_stream(
            paths, batch_size=8, shuffle=False, worker_count=4,
            # drop_remainder=False: grain batches PER WORKER; with
            # drop_remainder a worker whose shard is smaller than the
            # batch silently yields nothing (grain_pipeline.py note)
            drop_remainder=False, num_epochs=epochs,
        )
        # epoch 1 untimed: worker spawn + package import + page-cache warm
        seen = 0
        for b in stream:
            assert b["video"].dtype == np.uint8
            seen += b["video"].nbytes
            if seen >= total_bytes * 0.97:  # framing overhead ~3%
                break
        t0 = time.perf_counter()
        steady = 0
        for b in stream:
            steady += b["video"].nbytes
        dt = time.perf_counter() - t0
        mbps = steady / dt / 1e6
        print(f"\ngrain steady-state worker_count=4: {mbps:.0f} MB/s over {steady/1e6:.0f} MB")
        assert steady > 0, "grain stream ended after one epoch"
        assert mbps >= 200.0, (
            f"grain steady-state {mbps:.0f} MB/s < 200 MB/s budget "
            "(spawn-amortized; see grain_pipeline.grain_stream)"
        )

    def test_grain_epoch_loader_meets_budget(self, shard_set):
        """GrainEpochLoader — the path `epoch_fit.fit_universal_epochs`
        consumes via `loader.epoch_batches` — must sustain >= 200 MB/s
        spawn-amortized (VERDICT r4 item 7: the round-4 suite only budgeted
        the stream path; the epoch path was the documented-slow one).

        Epoch 1 untimed (worker spawn + page cache); epochs 2-3 timed.
        Unlike grain_stream, epoch boundaries here are exact, so the timed
        region is exactly two full epochs of records."""
        pytest.importorskip("grain")
        from flickering_adversarial_video_tpu.data.grain_pipeline import (
            GrainEpochLoader,
        )

        paths, total_bytes = shard_set
        loader = GrainEpochLoader(
            paths, batch_size=8, epochs=3, shuffle=False, worker_count=4,
            drop_remainder=False,
        )
        seen_warm = 0
        for b in loader.epoch_batches():  # epoch 1: spawn + warm, untimed
            assert b["video"].dtype == np.uint8
            seen_warm += b["video"].nbytes
        assert seen_warm * 1.03 >= total_bytes * 0.97
        t0 = time.perf_counter()
        steady = 0
        for _ in range(2):
            for b in loader.epoch_batches():
                steady += b["video"].nbytes
        dt = time.perf_counter() - t0
        mbps = steady / dt / 1e6
        print(
            f"\ngrain epoch-loader steady-state worker_count=4: "
            f"{mbps:.0f} MB/s over {steady/1e6:.0f} MB"
        )
        assert steady >= 2 * seen_warm  # two exact epochs
        assert mbps >= 200.0, (
            f"grain epoch path {mbps:.0f} MB/s < 200 MB/s budget "
            "(see grain_pipeline.GrainEpochLoader)"
        )
