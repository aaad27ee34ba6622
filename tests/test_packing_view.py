"""Host-side view-prepack (data/packing.py batch_to_view_np): the host-built
[H,W,8C,T'B] batch must equal the device's to_tmajor_view of the prepacked
batch bit for bit — the engine's view-input mode depends on it."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def test_batch_to_view_matches_device_view(rng):
    from flickering_adversarial_video_tpu.data.packing import (
        batch_to_view_np,
        pack_batch_view_np,
        pack_video_np,
    )
    from flickering_adversarial_video_tpu.ops.stem_tmajor import to_tmajor_view

    videos = rng.integers(0, 256, (4, 8, 12, 16, 3), dtype=np.uint8)
    packed = pack_video_np(videos)
    want = np.asarray(to_tmajor_view(jnp.asarray(packed)))
    got = batch_to_view_np(packed)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(pack_batch_view_np(videos), want)
    assert got.flags["C_CONTIGUOUS"]


@pytest.mark.parametrize("use_native", [True, False])
def test_native_and_numpy_paths_agree(rng, use_native):
    from flickering_adversarial_video_tpu.data.packing import batch_to_view_np

    # shapes with 16-tile remainders in both lane and wc dims exercise the
    # SIMD kernel's scalar tails
    for shape in [(8, 16, 14, 14, 24), (3, 5, 7, 9, 6), (2, 2, 4, 18, 3)]:
        packed = rng.integers(0, 256, shape, dtype=np.uint8)
        b, t, h, w, c8 = shape
        want = np.ascontiguousarray(packed.transpose(2, 3, 4, 1, 0)).reshape(
            h, w, c8, t * b
        )
        got = batch_to_view_np(packed, use_native=use_native)
        np.testing.assert_array_equal(got, want)


def test_native_binding_direct(rng):
    nr = pytest.importorskip(
        "flickering_adversarial_video_tpu.data.native_reader"
    )
    try:
        fn = nr.batch_to_view
    except AttributeError:
        pytest.skip("native lib without tfr_batch_view")
    packed = rng.integers(0, 256, (4, 8, 12, 16, 24), dtype=np.uint8)
    want = np.ascontiguousarray(packed.transpose(2, 3, 4, 1, 0)).reshape(
        12, 16, 24, 32
    )
    for nthreads in (1, 3):
        np.testing.assert_array_equal(fn(packed, nthreads=nthreads), want)
    # non-contiguous input is handled (ascontiguousarray on entry)
    nc = packed[:, :, ::2]
    want_nc = np.ascontiguousarray(nc.transpose(2, 3, 4, 1, 0)).reshape(
        6, 16, 24, 32
    )
    np.testing.assert_array_equal(fn(nc), want_nc)
