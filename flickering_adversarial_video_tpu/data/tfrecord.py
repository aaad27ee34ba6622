"""TFRecord reading/writing + batched host pipeline.

Schema parity with the reference (utils/pre_process_rgb_flow.py:154-236 and
the writers kinetics_to_tf_record_uint8{,_shuffle}.py):
  uint8 schema:  'train/label' int64, 'train/video' bytes(raw uint8
                 [T,224,224,3]); parser yields uint8 — normalization
                 (cast/128-1) happens ON DEVICE inside the attack step, unlike
                 the reference which burns host CPU on it per batch
                 (pre_process_rgb_flow.py:234).
  float schema:  'train/video' FloatList (flattened f32), used by the
                 UCF/float writers (pre_process_rgb_flow.py:161-208).

Three IO paths, all binary-compatible:
  * pure-Python framing + minimal proto codec (data/example_proto.py) — no TF;
  * the native C++ reader (native/tfrecord_reader.cc) via ctypes when built —
    the fast host path;
  * a tf.data pipeline (make_tf_dataset) when TensorFlow is importable,
    mirroring the reference's estimator input_fn
    (i3d_adversarial_main_universal.py:231-248).

TFRecord framing: {u64 length, u32 masked-crc32c(length), bytes data,
u32 masked-crc32c(data)}.
"""

from __future__ import annotations

import glob
import os
import struct
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from . import example_proto

# ---------------- crc32c (Castagnoli), for record framing ----------------

_CRC_TABLE = None


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        table = np.zeros(256, np.uint32)
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table[i] = c
        _CRC_TABLE = table
    return _CRC_TABLE


try:  # C-accelerated crc32c (~GB/s); the pure-Python table walk (~1 MB/s)
    # stays as the dependency-free fallback.
    from google_crc32c import value as _crc32c_fast
except Exception:  # pragma: no cover
    _crc32c_fast = None


def crc32c(data: bytes) -> int:
    if _crc32c_fast is not None:
        return _crc32c_fast(data)
    table = _crc_table()
    crc = 0xFFFFFFFF
    arr = np.frombuffer(data, np.uint8)
    for b in arr.tobytes():
        crc = (crc >> 8) ^ int(table[(crc ^ b) & 0xFF])
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


# ---------------- framing ----------------

def read_records(path: str, verify_crc: bool = False) -> Iterator[bytes]:
    """Iterate raw serialized Examples from one tfrecord file."""
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if len(header) < 12:
                return
            (length,) = struct.unpack("<Q", header[:8])
            data = f.read(length)
            footer = f.read(4)
            if len(data) < length or len(footer) < 4:
                return  # truncated shard: stop like tf.data would error-stop
            if verify_crc:
                (expect,) = struct.unpack("<I", footer)
                if masked_crc32c(data) != expect:
                    raise IOError(f"crc mismatch in {path}")
            yield data


class TFRecordWriter:
    """Minimal tfrecord writer (framing + masked crc32c)."""

    def __init__(self, path: str):
        self._f = open(path, "wb")

    def write(self, record: bytes) -> None:
        header = struct.pack("<Q", len(record))
        self._f.write(header)
        self._f.write(struct.pack("<I", masked_crc32c(header)))
        self._f.write(record)
        self._f.write(struct.pack("<I", masked_crc32c(record)))

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------- schema ----------------

LABEL_KEY = "train/label"
VIDEO_KEY = "train/video"


def make_uint8_example(video: np.ndarray, label: int) -> bytes:
    """uint8 schema record (kinetics_to_tf_record_uint8.py layout)."""
    video = np.ascontiguousarray(video, np.uint8)
    return example_proto.encode_example(
        {
            LABEL_KEY: ("int64", int(label)),
            VIDEO_KEY: ("bytes", video.tobytes()),
        }
    )


def make_float_example(video: np.ndarray, label: int) -> bytes:
    """float schema record (pre_process_rgb_flow.py:302-305 layout)."""
    return example_proto.encode_example(
        {
            LABEL_KEY: ("int64", int(label)),
            VIDEO_KEY: ("float", np.asarray(video, np.float32).reshape(-1)),
        }
    )


def parse_example_uint8(
    record: bytes, height: int = 224, width: int = 224, channels: int = 3
) -> Tuple[np.ndarray, int]:
    """-> (uint8 video [T, H, W, C], label).  The reference's cast/128-1
    (pre_process_rgb_flow.py:234) is deferred to the device."""
    feats = example_proto.decode_example(record)
    kind, raw = feats[VIDEO_KEY]
    assert kind == "bytes", kind
    video = np.frombuffer(raw[0], np.uint8).reshape(-1, height, width, channels)
    label = int(feats[LABEL_KEY][1][0])
    return video, label


def parse_example_float(
    record: bytes, height: int = 224, width: int = 224, channels: int = 3
) -> Tuple[np.ndarray, int]:
    feats = example_proto.decode_example(record)
    kind, values = feats[VIDEO_KEY]
    assert kind == "float", kind
    video = np.asarray(values, np.float32).reshape(-1, height, width, channels)
    label = int(feats[LABEL_KEY][1][0])
    return video, label


# ---------------- shard listing & host pipeline ----------------

def list_shards(paths: Sequence[str] | str, limit: Optional[int] = None) -> List[str]:
    """Sorted *.tfrecords under each path, truncated to `limit` — the
    reference's shard-selection convention
    (i3d_adversarial_main_universal.py:212-221)."""
    if isinstance(paths, str):
        paths = [paths]
    shards: List[str] = []
    for p in paths:
        if os.path.isfile(p):
            shards.append(p)
        else:
            shards += sorted(glob.glob(os.path.join(p, "*.tfrecords")))
    return shards[:limit] if limit else shards


def tfrecord_batches(
    shards: Sequence[str],
    batch_size: int,
    *,
    frames: Optional[int] = None,
    repeat: int = 1,
    drop_remainder: bool = True,
    schema: str = "uint8",
    height: int = 224,
    width: int = 224,
    host_id: int = 0,
    num_hosts: int = 1,
    use_native: bool = True,
    prepack: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield {'video': uint8/f32 [B,T,H,W,C], 'labels': int64 [B]} batches.

    Multi-host: each host reads shards[host_id::num_hosts] — per-host shard
    assignment over DCN-free local disk, the pjit-world replacement for
    num_parallel_reads fan-in (universal driver :238).
    `frames` crops to the trailing `frames` frames (the reference stores
    last-90-frame clips already; single-video path slices again,
    i3d_adversarial_main_single_video_npy.py:121).

    prepack=True yields {'video_packed': [B,T/2,H/2,W/2,8C] uint8} instead —
    the device-native space-to-depth layout (ops/packed_apply.py), packed on
    the host (in C++ inside the native reader's record copy, or via
    data.packing.pack_video_np on the Python path).  Requires `frames` and
    the uint8 schema with even geometry.

    prepack="view" yields {'video_view': [H/2,W/2,8C,(T/2)B] uint8}: the
    packed records PLUS the batch-in-lanes transpose (native SIMD
    tfr_batch_view, numpy fallback) — the exact layout the full-depth
    T-major I3D program runs in (ops/stem_tmajor.flicker_stem_tmajor_view),
    so the device never crosses layouts at all.  Single-device engines with
    a T-major stem head only (engine.view_input_eligible).
    """
    if prepack:
        if schema != "uint8" or frames is None:
            raise ValueError("prepack needs the uint8 schema and fixed `frames`")
        if frames % 2 or height % 2 or width % 2:
            raise ValueError("prepack needs even frames/height/width")
    base_parse = parse_example_uint8 if schema == "uint8" else parse_example_float

    def parse(rec):
        return base_parse(rec, height=height, width=width)

    my_shards = list(shards)[host_id::num_hosts]

    reader = None
    if use_native and schema == "uint8":
        try:
            from .native_reader import NativeTFRecordReader

            reader = NativeTFRecordReader(height=height, width=width)
        except Exception:
            reader = None

    def record_iter():
        for _ in range(repeat):
            for shard in my_shards:
                if reader is not None and prepack:
                    yield from reader.read_parsed_packed(shard, frames)
                elif reader is not None:
                    yield from reader.read_parsed(shard)
                else:
                    for rec in read_records(shard):
                        yield parse(rec)

    native_packed = reader is not None and prepack
    view = prepack == "view"
    key = "video_view" if view else ("video_packed" if prepack else "video")
    if view:
        from .packing import batch_to_view_np

    def emit(videos, labels):
        stacked = np.stack(videos)
        if view:
            # records are already space-to-depth packed [T',H',W',8C]; the
            # batch-in-lanes transpose happens once per batch (SIMD C++
            # tfr_batch_view when the native lib is loadable)
            stacked = batch_to_view_np(stacked)
        return {key: stacked, "labels": np.asarray(labels, np.int64)}

    videos, labels = [], []
    for video, label in record_iter():
        if not native_packed:
            if frames is not None:
                # skip-short rule on EVERY read path (the native packed reader
                # drops clips shorter than `frames` in C++): toggling
                # PREPACK_INPUT must not change dataset composition, and a
                # ragged short clip would crash np.stack below
                if video.shape[0] < frames:
                    continue
                video = video[-frames:]
            if prepack:
                from .packing import pack_video_np

                video = pack_video_np(video)
        videos.append(video)
        labels.append(label)
        if len(videos) == batch_size:
            yield emit(videos, labels)
            videos, labels = [], []
    if videos and not drop_remainder:
        yield emit(videos, labels)


def make_tf_dataset(
    shards: Sequence[str],
    batch_size: int,
    *,
    repeat: Optional[int] = None,
    shuffle: int = 0,
    num_parallel_reads: Optional[int] = None,
):
    """tf.data pipeline yielding (uint8 video, int64 label) batches — the
    high-throughput host path, mirroring the estimator input_fn
    (i3d_adversarial_main_universal.py:231-248) but WITHOUT the on-host
    float conversion; prefetch overlaps with device steps."""
    import tensorflow as tf

    ds = tf.data.TFRecordDataset(
        list(shards), num_parallel_reads=num_parallel_reads or os.cpu_count()
    )
    if shuffle:
        ds = ds.shuffle(shuffle)
    if repeat:
        ds = ds.repeat(repeat)
    ds = ds.batch(batch_size, drop_remainder=True)

    def _parse(serialized):
        feats = tf.io.parse_example(
            serialized,
            {
                LABEL_KEY: tf.io.FixedLenFeature((), tf.int64),
                VIDEO_KEY: tf.io.FixedLenFeature([], tf.string),
            },
        )
        video = tf.io.decode_raw(feats[VIDEO_KEY], tf.uint8)
        video = tf.reshape(video, [tf.shape(serialized)[0], -1, 224, 224, 3])
        return video, feats[LABEL_KEY]

    ds = ds.map(_parse, num_parallel_calls=tf.data.AUTOTUNE)
    return ds.prefetch(tf.data.AUTOTUNE)
