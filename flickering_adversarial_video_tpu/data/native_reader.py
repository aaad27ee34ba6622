"""ctypes bindings for the native TFRecord reader (native/tfrecord_reader.cc).

The fast host path of the input pipeline: parses TFRecord framing + the
Example proto in C++ and memcpys raw uint8 video bytes directly into numpy
buffers.  Falls back transparently (callers catch import errors) to the pure
Python codec in data/tfrecord.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libtfrecord_reader.so",
)

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        # best-effort local build; native toolchain is part of the image
        build = os.path.join(os.path.dirname(_LIB_PATH), "build.sh")
        try:
            subprocess.run(["sh", build], check=True, capture_output=True)
        except Exception as e:  # pragma: no cover
            raise ImportError(f"native reader unavailable: {e}")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.tfr_open.restype = ctypes.c_void_p
    lib.tfr_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.tfr_close.argtypes = [ctypes.c_void_p]
    lib.tfr_next.restype = ctypes.c_long
    lib.tfr_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_longlong),
    ]
    lib.tfr_read_batch.restype = ctypes.c_long
    lib.tfr_read_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.c_long,
    ]
    lib.tfr_read_batch_packed.restype = ctypes.c_long
    lib.tfr_read_batch_packed.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.c_long,
    ]
    lib.tfr_batch_view.restype = None
    lib.tfr_batch_view.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
    ]
    _lib = lib
    return lib


def batch_to_view(packed: np.ndarray, nthreads: int = 1) -> np.ndarray:
    """[B, T', H, W, 8C] uint8 -> [H, W, 8C, T'B] via the native SIMD tiled
    transpose (tfr_batch_view: 16x16 SSE2 unpack-network tiles, ~1.4 GB/s on
    one core — numpy's generic strided byte copy manages ~0.3).  Raises
    ImportError if the native lib is unavailable; callers fall back to
    data.packing's numpy path."""
    lib = _load_lib()
    if packed.dtype != np.uint8 or packed.ndim != 5:
        raise ValueError(f"need uint8 [B,T,H,W,C], got {packed.dtype} {packed.shape}")
    packed = np.ascontiguousarray(packed)
    b, t, h, w, c = packed.shape
    out = np.empty((h, w, c, t * b), dtype=np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.tfr_batch_view(
        packed.ctypes.data_as(u8p), out.ctypes.data_as(u8p),
        b, t, h, w, c, int(nthreads),
    )
    return out


class NativeTFRecordReader:
    """Streaming reader over uint8-schema shards."""

    def __init__(self, height: int = 224, width: int = 224, channels: int = 3, verify_crc: bool = False):
        self.lib = _load_lib()
        self.height = height
        self.width = width
        self.channels = channels
        self.verify_crc = verify_crc

    def read_parsed(self, path: str) -> Iterator[Tuple[np.ndarray, int]]:
        """Yield (uint8 video [T,H,W,C], label) per record."""
        handle = self.lib.tfr_open(path.encode(), int(self.verify_crc))
        if not handle:
            raise IOError(f"cannot open {path}")
        frame_bytes = self.height * self.width * self.channels
        try:
            video_p = ctypes.POINTER(ctypes.c_uint8)()
            video_len = ctypes.c_long()
            label = ctypes.c_longlong()
            while True:
                rc = self.lib.tfr_next(
                    handle, ctypes.byref(video_p), ctypes.byref(video_len), ctypes.byref(label)
                )
                if rc == 0:
                    return
                if rc < 0:
                    raise IOError(f"tfrecord parse error {rc} in {path}")
                n = video_len.value
                frames = n // frame_bytes
                arr = np.ctypeslib.as_array(video_p, shape=(frames * frame_bytes,))
                video = (
                    arr.reshape(frames, self.height, self.width, self.channels).copy()
                )
                yield video, int(label.value)
        finally:
            self.lib.tfr_close(handle)

    def read_batch_into(
        self, path: str, frames: int, count: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Bulk-read up to `count` clips of exactly `frames` trailing frames
        into freshly allocated buffers (single memcpy per clip, in C++)."""
        handle = self.lib.tfr_open(path.encode(), int(self.verify_crc))
        if not handle:
            raise IOError(f"cannot open {path}")
        try:
            record_bytes = frames * self.height * self.width * self.channels
            videos = np.empty((count, record_bytes), np.uint8)
            labels = np.empty((count,), np.int64)
            filled = self.lib.tfr_read_batch(
                handle,
                videos.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                record_bytes,
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
                count,
            )
            videos = videos[:filled].reshape(
                filled, frames, self.height, self.width, self.channels
            )
            return videos, labels[:filled]
        finally:
            self.lib.tfr_close(handle)

    def read_parsed_packed(
        self, path: str, frames: int
    ) -> Iterator[Tuple[np.ndarray, int]]:
        """Yield (packed uint8 video [T/2,H/2,W/2,8C], label) per record —
        space-to-depth done in C++ during the record copy; clips shorter
        than `frames` are skipped (writer's skip-short rule)."""
        if frames % 2 or self.height % 2 or self.width % 2:
            raise ValueError("packed read needs even frames/height/width")
        handle = self.lib.tfr_open(path.encode(), int(self.verify_crc))
        if not handle:
            raise IOError(f"cannot open {path}")
        record_bytes = frames * self.height * self.width * self.channels
        shape = (frames // 2, self.height // 2, self.width // 2, 8 * self.channels)
        try:
            while True:
                video = np.empty(record_bytes, np.uint8)
                label = np.empty((1,), np.int64)
                filled = self.lib.tfr_read_batch_packed(
                    handle,
                    video.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    frames,
                    self.height,
                    self.width,
                    self.channels,
                    label.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
                    1,
                )
                if filled == 0:
                    return
                yield video.reshape(shape), int(label[0])
        finally:
            self.lib.tfr_close(handle)

    def read_batch_packed(
        self, path: str, frames: int, count: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Bulk-read up to `count` clips, space-to-depth packed in C++ during
        the per-record copy: [n, T/2, H/2, W/2, 8C] uint8 (the device-native
        layout of the prepacked attack step, ops/packed_apply.py)."""
        if frames % 2 or self.height % 2 or self.width % 2:
            raise ValueError("packed read needs even frames/height/width")
        handle = self.lib.tfr_open(path.encode(), int(self.verify_crc))
        if not handle:
            raise IOError(f"cannot open {path}")
        try:
            record_bytes = frames * self.height * self.width * self.channels
            videos = np.empty((count, record_bytes), np.uint8)
            labels = np.empty((count,), np.int64)
            filled = self.lib.tfr_read_batch_packed(
                handle,
                videos.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                frames,
                self.height,
                self.width,
                self.channels,
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
                count,
            )
            videos = videos[:filled].reshape(
                filled,
                frames // 2,
                self.height // 2,
                self.width // 2,
                8 * self.channels,
            )
            return videos, labels[:filled]
        finally:
            self.lib.tfr_close(handle)
