"""System / device introspection (the reference's common/gpu.py role:
torch_device, num_devices, system_info — utils_cv/common/gpu.py:43-80)."""

from __future__ import annotations

import os
import platform
import sys
from typing import Dict


def num_devices() -> int:
    import jax

    return jax.local_device_count()


def device_kind() -> str:
    import jax

    devices = jax.devices()
    return devices[0].device_kind if devices else "none"


def db_num_workers(non_windows: int = 16) -> int:
    """Host-pipeline worker count (common/gpu.py:57-67 semantics)."""
    if platform.system() == "Windows":
        return 0
    return min(non_windows, os.cpu_count() or 1)


def system_info() -> Dict[str, object]:
    import jax

    info = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "cpu_count": os.cpu_count(),
    }
    return info


def print_system_info() -> None:
    for k, v in system_info().items():
        print(f"{k}: {v}")
