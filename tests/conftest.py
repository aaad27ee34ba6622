"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The session environment pins JAX_PLATFORMS=axon (the real TPU tunnel), so env
vars are not reliable here; force the CPU platform through jax.config before
any backend initializes.  Multi-device tests then see 8 CpuDevices, matching
the driver's dryrun_multichip validation mode.
"""

import os

# Keep TF (used as a numerical test oracle) off accelerators and quiet.
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(13)
