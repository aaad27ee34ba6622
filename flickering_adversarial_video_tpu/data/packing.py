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
