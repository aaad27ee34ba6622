"""Host-side space-to-depth packing of uint8 clips.

The TPU attack step's fastest input layout is the space-to-depth packed video
([T/2, H/2, W/2, 8C], channel order (parity_t, parity_h, parity_w, c) — what
the packed I3D stem consumes, ops/packed_apply.py).  Relaying out on device
costs 8 ms/step (6-byte atoms cap TPU copies at 29-41 GiB/s, PERF.md round
2); on the host it is effectively free — the native reader packs inside its
per-record memcpy (native/tfrecord_reader.cc tfr_read_batch_packed), and
this numpy fallback serves the pure-Python / grain paths, overlapped with
device compute by the pipeline's prefetch.
"""

from __future__ import annotations

import numpy as np


def pack_video_np(video: np.ndarray) -> np.ndarray:
    """[..., T, H, W, C] -> [..., T/2, H/2, W/2, 8C] (any leading batch dims).

    Matches ops.space_to_depth.pack_input(x, axes=(-4,-3,-2)) exactly:
    channel order (parity_t, parity_h, parity_w, c).
    """
    *lead, t, h, w, c = video.shape
    if t % 2 or h % 2 or w % 2:
        raise ValueError(f"even T/H/W required, got {(t, h, w)}")
    v = video.reshape(*lead, t // 2, 2, h // 2, 2, w // 2, 2, c)
    n = len(lead)
    perm = list(range(n)) + [n, n + 2, n + 4, n + 1, n + 3, n + 5, n + 6]
    v = v.transpose(perm)
    return np.ascontiguousarray(v).reshape(*lead, t // 2, h // 2, w // 2, 8 * c)


def batch_to_view_np(packed: np.ndarray, use_native: bool = True) -> np.ndarray:
    """[B, T', H', W', 8C] -> [H', W', 8C, T'B] (t*B+b lane order) — the
    T-major batch-in-lanes view the full-depth I3D program runs in
    (ops/stem_tmajor.to_tmajor_view, FLICKER_TMAJOR_DEPTH).

    Emitting this layout on the HOST removes the step's last device-side
    layout crossing (the ~2.1 ms advT/mask emit chain, PERF.md: three
    device-side replacements all measured negative — XLA's and Mosaic's
    major-dims-to-lanes relayout is the toolchain's worst orientation,
    but on the host it is just a strided copy).  Uses the native SIMD
    transpose (native_reader.batch_to_view, ~1.4 GB/s/core) when the lib is
    available; numpy reference fallback (~0.3 GB/s) otherwise."""
    if use_native:
        try:
            from .native_reader import batch_to_view

            return batch_to_view(packed)
        except Exception:
            pass
    b, t, h, w, c8 = packed.shape
    return np.ascontiguousarray(packed.transpose(2, 3, 4, 1, 0)).reshape(
        h, w, c8, t * b
    )


def pack_batch_view_np(videos: np.ndarray) -> np.ndarray:
    """[B, T, H, W, C] uint8 -> [H/2, W/2, 8C, (T/2)B] view-prepacked batch
    (space-to-depth pack + batch-in-lanes transpose, both on host)."""
    return batch_to_view_np(pack_video_np(videos))
