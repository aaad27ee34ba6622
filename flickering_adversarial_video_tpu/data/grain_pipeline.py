"""Grain input pipeline — the JAX-native host loader (P5/P6 equivalence).

Alternative to tfrecord_batches/make_tf_dataset: a grain DataLoader over an
index of (shard, offset) record positions, with multi-worker parallel decode,
deterministic seeded shuffling and epoch semantics.  The record index is
built once per shard set by scanning the TFRecord framing (lengths only, no
payload parse), so random access into shards is O(1) seeks.

Yields the same {'video': uint8 [B,T,H,W,C], 'labels': int64 [B]} batches the
attack loops consume.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def build_record_index(shards: Sequence[str]) -> List[Tuple[str, int, int]]:
    """[(path, byte_offset, record_len)] for every record in the shard set."""
    index = []
    for path in shards:
        with open(path, "rb") as f:
            offset = 0
            while True:
                header = f.read(12)
                if len(header) < 12:
                    break
                (length,) = struct.unpack("<Q", header[:8])
                index.append((path, offset + 12, length))
                f.seek(length + 4, 1)
                offset += 12 + length + 4
    return index


class TFRecordRandomAccessSource:
    """grain RandomAccessDataSource over a tfrecord record index."""

    def __init__(
        self,
        shards: Sequence[str],
        frames: Optional[int] = None,
        height: int = 224,
        width: int = 224,
    ):
        self._index = build_record_index(shards)
        self._frames = frames
        self._height = height
        self._width = width

    def __len__(self) -> int:
        return len(self._index)

    def __getitem__(self, i: int):
        from .tfrecord import parse_example_uint8

        path, offset, length = self._index[int(i)]
        with open(path, "rb") as f:
            f.seek(offset)
            record = f.read(length)
        video, label = parse_example_uint8(
            record, height=self._height, width=self._width
        )
        if self._frames is not None:
            video = video[-self._frames :]
        return {"video": video, "label": np.int64(label)}


def grain_batches(
    shards: Sequence[str],
    batch_size: int,
    *,
    frames: Optional[int] = None,
    height: int = 224,
    width: int = 224,
    shuffle: bool = True,
    seed: int = 0,
    num_epochs: Optional[int] = 1,
    worker_count: int = 0,
    drop_remainder: bool = True,
):
    """grain DataLoader yielding attack-loop batches (ONE-SHOT loader).

    worker_count > 0 decodes records in parallel child processes (the
    DataLoader's own workers — the reference's num_workers=16 DataLoader
    role, common/gpu.py:57-67).

    NOTE: building one of these per epoch re-spawns the workers each time
    (~10 s x workers of jax re-import; measured as ~12 MB/s on short
    epochs, PERF.md round 2).  For epoch-cadenced training use
    `GrainEpochLoader` (persistent workers, exact epoch boundaries); for
    the step-driven universal attack use `grain_stream`.

    Sharp edge (learned the hard way): grain shards the index across workers
    and each worker batches its shard INDEPENDENTLY — with
    drop_remainder=True and fewer than batch_size records per worker, every
    worker drops its partial batch and the loader SILENTLY yields nothing.
    Keep records >> batch_size * worker_count, or pass
    drop_remainder=False."""
    import grain.python as gp

    source = TFRecordRandomAccessSource(shards, frames, height, width)
    if worker_count > 0 and drop_remainder:
        # workers get ceil/floor shares; only if even the LARGEST share is
        # below a batch would every worker drop everything
        largest_share = -(-len(source) // max(worker_count, 1))
        if largest_share < batch_size:
            raise ValueError(
                f"{len(source)} records over {worker_count} workers gives at "
                f"most {largest_share}/worker < batch_size={batch_size}: "
                "every worker would drop its partial batch and the loader "
                "would yield nothing; lower worker_count/batch_size or pass "
                "drop_remainder=False"
            )
    sampler = gp.IndexSampler(
        num_records=len(source),
        shard_options=gp.NoSharding(),
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )
    loader = gp.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[gp.Batch(batch_size=batch_size, drop_remainder=drop_remainder)],
        worker_count=worker_count,
    )
    for batch in loader:
        yield {"video": batch["video"], "labels": batch["label"]}


class GrainEpochLoader:
    """Persistent-worker EPOCH-mode grain pipeline — the pairing for
    `engine.epoch_fit.fit_universal_epochs` (VERDICT r4 item 7: the epoch
    path a torch migrant reaches for must meet the throughput budget, not
    just the stream path).

    ONE DataLoader (workers spawned once, amortized over the whole fit)
    over `epochs` sampler epochs, with NO in-worker Batch operation: grain's
    deterministic round-robin reconstructs the sampler's exact global order
    in the parent (worker w holds positions w, w+W, ... and the parent reads
    them back round-robin), so epoch boundaries are EXACT — record at global
    position p belongs to epoch p // N.  In-worker batching (grain_batches /
    grain_stream) instead batches each worker's stride-W subsequence, which
    is why those are stream-semantics APIs.  Parent-side batching is one
    np.stack per batch — memcpy-cheap next to the workers' parallel decode
    (measured in tests/test_host_pipeline_throughput.py::
    test_grain_epoch_loader_meets_budget).

    Usage:
        loader = GrainEpochLoader(shards, batch_size=8, epochs=E)
        fit_universal_epochs(engine, loader.epoch_batches, valid_fn, ...)
    """

    def __init__(
        self,
        shards: Sequence[str],
        batch_size: int,
        *,
        epochs: int,
        frames: Optional[int] = None,
        height: int = 224,
        width: int = 224,
        shuffle: bool = True,
        seed: int = 0,
        worker_count: int = 4,
        drop_remainder: bool = True,
    ):
        import grain.python as gp

        source = TFRecordRandomAccessSource(shards, frames, height, width)
        self.records_per_epoch = len(source)
        self.batch_size = batch_size
        self.drop_remainder = drop_remainder
        self.epochs = epochs
        self.epochs_consumed = 0
        sampler = gp.IndexSampler(
            num_records=len(source),
            shard_options=gp.NoSharding(),
            shuffle=shuffle,
            num_epochs=epochs,
            seed=seed,
        )
        self._it = iter(
            gp.DataLoader(
                data_source=source,
                sampler=sampler,
                operations=[],
                worker_count=worker_count,
            )
        )

    def epoch_batches(self):
        """Yield exactly one epoch's batches (N records, exact boundary)."""
        if self.epochs_consumed >= self.epochs:
            raise RuntimeError(
                f"GrainEpochLoader exhausted: {self.epochs} epochs consumed "
                "(construct with a larger `epochs`)"
            )
        self.epochs_consumed += 1
        buf_v: List[np.ndarray] = []
        buf_l: List[np.int64] = []
        for _ in range(self.records_per_epoch):
            rec = next(self._it)
            buf_v.append(rec["video"])
            buf_l.append(rec["label"])
            if len(buf_v) == self.batch_size:
                yield {
                    "video": np.stack(buf_v),
                    "labels": np.asarray(buf_l, np.int64),
                }
                buf_v, buf_l = [], []
        if buf_v and not self.drop_remainder:
            yield {
                "video": np.stack(buf_v),
                "labels": np.asarray(buf_l, np.int64),
            }


def grain_stream(
    shards: Sequence[str],
    batch_size: int,
    *,
    frames: Optional[int] = None,
    height: int = 224,
    width: int = 224,
    shuffle: bool = True,
    seed: int = 0,
    num_epochs: Optional[int] = None,
    worker_count: int = 4,
    drop_remainder: bool = True,
):
    """Persistent high-throughput grain mode: ONE worker spawn for the whole
    attack, batches streamed across epoch boundaries.

    Worker spawn is the dominant cost of `grain_batches` when a fresh loader
    is built per epoch: each spawned worker re-imports the package (incl.
    jax, ~10 s x workers), which measured as ~12 MB/s "throughput" on short
    epochs (PERF.md round 2).  Amortized over a single multi-epoch loader the
    same 4 workers sustain hundreds of MB/s steady-state
    (tests/test_host_pipeline_throughput.py::test_grain_steady_state).

    Semantics note: with worker_count > 0 grain shards the record index
    across workers and each worker walks its shard through ALL epochs
    independently, so records from adjacent epochs interleave near epoch
    boundaries — this is a STREAM (right for the step-driven universal
    attack), not a strict epoch iterator; use `grain_batches` (one loader
    per epoch) where exact epoch boundaries matter and throughput doesn't.

    num_epochs=None streams forever (the estimator input_fn's .repeat role,
    i3d_adversarial_main_universal.py:238-243).
    """
    yield from grain_batches(
        shards,
        batch_size,
        frames=frames,
        height=height,
        width=width,
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
        worker_count=worker_count,
        drop_remainder=drop_remainder,
    )
