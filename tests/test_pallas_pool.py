"""Pallas pool kernels vs XLA reduce-window (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from flickering_adversarial_video_tpu.ops.pallas_pool import (
    spatial_pool_132,
    spatial_pool_132_supported,
)


@pytest.fixture
def rng():
    return np.random.default_rng(5)


class TestSpatialPool132:
    @pytest.mark.parametrize("shape", [(2, 3, 8, 8, 4), (1, 2, 12, 16, 3)])
    def test_forward_matches_xla(self, rng, shape):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        got = spatial_pool_132(x, True)  # interpret mode on CPU
        ref = nn.max_pool(x, (1, 3, 3), (1, 2, 2), "SAME")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_forward_bf16(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 4)), jnp.bfloat16)
        got = spatial_pool_132(x, True)
        ref = nn.max_pool(x, (1, 3, 3), (1, 2, 2), "SAME")
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(ref, np.float32)
        )

    def test_grad_matches_autodiff_with_ties(self, rng):
        # quantized values force window ties; the select_and_scatter_add
        # backward must agree with XLA's autodiff bit for bit
        x = jnp.asarray((rng.integers(0, 3, (2, 3, 8, 8, 4)) * 0.5).astype(np.float32))
        w = jax.random.normal(jax.random.key(0), (2, 3, 4, 4, 4))
        got = jax.grad(lambda z: jnp.sum(spatial_pool_132(z, True) * w))(x)
        ref = jax.grad(
            lambda z: jnp.sum(nn.max_pool(z, (1, 3, 3), (1, 2, 2), "SAME") * w)
        )(x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_supported_guard(self):
        assert spatial_pool_132_supported((1, 2, 8, 8, 3))
        assert not spatial_pool_132_supported((1, 2, 7, 8, 3))
        assert not spatial_pool_132_supported((1, 2, 8, 9, 3))
