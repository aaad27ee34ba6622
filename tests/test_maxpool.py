"""max_pool_same (ops/maxpool.py) vs XLA's own reduce-window autodiff.

The custom backward must match select-and-scatter exactly — including the
first-match (row-major) tie rule — for every pool geometry I3D uses
(i3d.py reference: MaxPool3d_2a/3a (1,3,3)/(1,2,2), 4a (3,3,3)/(2,2,2),
5a (2,2,2)/(2,2,2), and the 3x3x3/stride-1 pools inside every Mixed block).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from flickering_adversarial_video_tpu.ops.maxpool import max_pool_same

GEOMETRIES = [
    ((1, 3, 3), (1, 2, 2)),  # MaxPool2a/3a
    ((3, 3, 3), (1, 1, 1)),  # Mixed branch pools
    ((3, 3, 3), (2, 2, 2)),  # MaxPool4a
    ((2, 2, 2), (2, 2, 2)),  # MaxPool5a
]


def _xla_pool(x, window, strides):
    return nn.max_pool(x, window_shape=window, strides=strides, padding="SAME")


def _grads(pool_fn, x, window, strides, seed=0):
    y = pool_fn(x, window, strides)
    w = jax.random.normal(jax.random.key(seed), y.shape, y.dtype)
    return jax.grad(lambda z: jnp.sum(pool_fn(z, window, strides) * w))(x)


@pytest.fixture
def rng():
    return np.random.default_rng(21)


class TestMaxPoolSame:
    @pytest.mark.parametrize("window,strides", GEOMETRIES)
    def test_forward_matches_xla(self, rng, window, strides):
        x = jnp.asarray(rng.standard_normal((2, 6, 9, 9, 4)).astype(np.float32))
        got = max_pool_same(x, window, strides)
        ref = _xla_pool(x, window, strides)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    @pytest.mark.parametrize("window,strides", GEOMETRIES)
    def test_grad_matches_xla_continuous(self, rng, window, strides):
        # continuous values: ties have measure zero
        x = jnp.asarray(rng.standard_normal((2, 6, 9, 9, 4)).astype(np.float32))
        got = np.asarray(_grads(max_pool_same, x, window, strides))
        ref = np.asarray(_grads(_xla_pool, x, window, strides))
        # identical routing (same nonzero pattern); values equal up to f32
        # accumulation order of multi-window contributions
        np.testing.assert_array_equal(got != 0, ref != 0)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("window,strides", GEOMETRIES)
    def test_save_y_residual_exact(self, rng, window, strides, monkeypatch):
        """FLICKER_POOL_SAVE_Y reuses the forward's pooled value in the
        backward instead of recomputing pool_T — bit-identical gradients
        (max is exactly separable in any axis order), incl. on ties."""
        monkeypatch.setenv("FLICKER_POOL_SAVE_Y", "1")
        x = jnp.asarray(
            (rng.integers(0, 3, (2, 6, 9, 9, 4)) * 0.5).astype(np.float32)
        )

        # fresh trace: the gate is read at trace time inside the custom VJP
        def pool(z, w, s):
            return max_pool_same(z, w, s, force_custom=True)

        got = np.asarray(_grads(pool, x, window, strides))
        ref = np.asarray(_grads(_xla_pool, x, window, strides))
        np.testing.assert_array_equal(got != 0, ref != 0)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("window,strides", GEOMETRIES)
    @pytest.mark.parametrize("odd", [False, True])
    @pytest.mark.parametrize("mode", ["1", "2"])
    def test_sepfwd_exact(self, rng, window, strides, odd, mode, monkeypatch):
        """FLICKER_POOL_SEPFWD replaces the stride-1 reduce-window forward
        (and backward recompute) with shifted-slice max chains (mode 1:
        separable; mode 2: one-pass w^3 taps) — values bit-equal and
        gradients first-match-identical, incl. on ties and odd
        (asymmetric-SAME-pad) extents."""
        monkeypatch.setenv("FLICKER_POOL_SEPFWD", mode)
        shape = (2, 7, 9, 9, 4) if odd else (2, 6, 8, 8, 4)
        x = jnp.asarray((rng.integers(0, 3, shape) * 0.5).astype(np.float32))

        def pool(z, w, s):
            return max_pool_same(z, w, s, force_custom=True)

        got_y = np.asarray(pool(x, window, strides))
        ref_y = np.asarray(_xla_pool(x, window, strides))
        np.testing.assert_array_equal(got_y, ref_y)
        got = np.asarray(_grads(pool, x, window, strides))
        ref = np.asarray(_grads(_xla_pool, x, window, strides))
        np.testing.assert_array_equal(got != 0, ref != 0)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("window,strides", GEOMETRIES)
    def test_grad_matches_xla_with_ties(self, rng, window, strides):
        # post-ReLU-like data: values quantized to {0, 0.5, 1.0} => windows
        # full of exact ties; the first-match rule must agree with
        # select-and-scatter on every one of them.
        x = jnp.asarray(
            (rng.integers(0, 3, (2, 6, 9, 9, 4)) * 0.5).astype(np.float32)
        )
        got = np.asarray(_grads(max_pool_same, x, window, strides))
        ref = np.asarray(_grads(_xla_pool, x, window, strides))
        np.testing.assert_array_equal(got != 0, ref != 0)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_grad_bf16_with_ties(self, rng):
        x = jnp.asarray(
            (rng.integers(0, 3, (2, 6, 9, 9, 4)) * 0.5), dtype=jnp.bfloat16
        )
        got = np.asarray(_grads(max_pool_same, x, (3, 3, 3), (1, 1, 1)), np.float32)
        ref = np.asarray(_grads(_xla_pool, x, (3, 3, 3), (1, 1, 1)), np.float32)
        np.testing.assert_array_equal(got != 0, ref != 0)
        # bf16 accumulation-order rounding: last-bit ulps on multi-window sums
        np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)

    def test_odd_sizes_same_padding(self, rng):
        # 7x7 spatial with stride 2 exercises asymmetric SAME pads
        x = jnp.asarray(rng.standard_normal((1, 5, 7, 7, 3)).astype(np.float32))
        for window, strides in GEOMETRIES:
            got = max_pool_same(x, window, strides)
            ref = _xla_pool(x, window, strides)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
            g1 = np.asarray(_grads(max_pool_same, x, window, strides))
            g2 = np.asarray(_grads(_xla_pool, x, window, strides))
            np.testing.assert_array_equal(g1 != 0, g2 != 0)
            np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("window,strides", GEOMETRIES)
    @pytest.mark.parametrize("batch", [1, 2])
    def test_even_extents_parity_path_with_ties(self, rng, window, strides, batch):
        """Even extents route strided pools through the parity-split custom
        path (production I3D geometry: 112/56/28/14 spatial, 32/16 temporal).
        Forward must equal reduce-window exactly and the backward must match
        XLA's select-and-scatter first-match tie rule on heavily tied data."""
        x = jnp.asarray(
            (rng.integers(0, 3, (batch, 8, 8, 8, 4)) * 0.5).astype(np.float32)
        )
        got_y = max_pool_same(x, window, strides)
        ref_y = _xla_pool(x, window, strides)
        np.testing.assert_array_equal(np.asarray(got_y), np.asarray(ref_y))
        got = np.asarray(_grads(max_pool_same, x, window, strides))
        ref = np.asarray(_grads(_xla_pool, x, window, strides))
        np.testing.assert_array_equal(got != 0, ref != 0)
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_gradcheck_sum(self, rng):
        # every window's dy must be routed exactly once: sum(dx) == sum(dy)
        x = jnp.asarray(
            (rng.integers(0, 3, (1, 4, 8, 8, 2)) * 0.5).astype(np.float32)
        )
        for window, strides in GEOMETRIES:
            dx = jax.grad(
                lambda z: jnp.sum(max_pool_same(z, window, strides))
            )(x)
            n_windows = np.prod(max_pool_same(x, window, strides).shape)
            assert float(jnp.sum(dx)) == pytest.approx(float(n_windows))
