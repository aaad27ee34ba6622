"""Exactness tests for the Pallas im2col stem conv (ops/stem_conv_pallas.py).

Interpret-mode (CPU) against the tap-conv composition.  Integer-valued
grids make every intermediate sum exactly representable, so the kernel's
single-f32-contraction accumulation and the composition's per-tap adds
must agree BIT-for-bit there; real-valued bf16 grids agree to
reassociation tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flickering_adversarial_video_tpu.ops.stem_conv_pallas import (
    eligible,
    stem_conv_bn_relu_view_pallas,
)
from flickering_adversarial_video_tpu.ops.stem_tmajor import (
    _bn_relu_view,
    _stem_fwd_view,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _ref(xv, pk, mean, var, bias, b, eps=1e-3):
    return _bn_relu_view(_stem_fwd_view(xv, pk, b), mean, var, bias, eps)


def _bn_vecs(rng, cout):
    mean = jnp.asarray(rng.integers(-2, 3, cout), jnp.float32)
    var = jnp.asarray(rng.integers(1, 4, cout), jnp.float32)
    bias = jnp.asarray(rng.integers(-2, 3, cout), jnp.float32)
    return mean, var, bias


class TestStemConvPallas:
    def test_integer_grid_bit_equal_f32(self, rng):
        b = 8
        h, w, cin, cout, t = 8, 8, 8, 16, 16
        xv = jnp.asarray(
            rng.integers(-3, 4, (h, w, cin, t * b)).astype(np.float32)
        )
        pk = jnp.asarray(
            rng.integers(-2, 3, (4, 4, 4, cin, cout)).astype(np.float32)
        )
        mean, var, bias = _bn_vecs(rng, cout)
        # var=1, mean/bias integer, eps folded: use eps=0 equivalence by
        # keeping the BN affine exact: rsqrt(1+1e-3) is irrational — compare
        # at tight tolerance instead of bits for the BN tail
        ref = _ref(xv, pk, mean, var, bias, b)
        got = stem_conv_bn_relu_view_pallas(
            xv, pk, mean, var, bias, b, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-5
        )

    def test_bf16_matches_to_reassociation(self, rng):
        b = 8
        h, w, cin, cout, t = 8, 8, 8, 16, 16
        xv = jnp.asarray(
            rng.standard_normal((h, w, cin, t * b)), jnp.bfloat16
        )
        pk = jnp.asarray(
            rng.standard_normal((4, 4, 4, cin, cout)), jnp.bfloat16
        )
        mean, var, bias = _bn_vecs(rng, cout)
        ref = np.asarray(_ref(xv, pk, mean, var, bias, b), np.float32)
        got = np.asarray(
            stem_conv_bn_relu_view_pallas(
                xv, pk, mean, var, bias, b, interpret=True
            ),
            np.float32,
        )
        # bf16 rounding of per-tap adds vs one f32 contraction
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(got / scale, ref / scale, atol=4e-2)

    def test_edge_rows_zero_padded(self, rng):
        """SAME (1,2) row/col padding: outputs at the boundary must match
        the composition (which pads with zeros) — catches halo-mask bugs."""
        b = 8
        h, w, cin, cout, t = 4, 6, 8, 8, 16
        xv = jnp.asarray(
            rng.integers(1, 5, (h, w, cin, t * b)).astype(np.float32)
        )
        pk = jnp.asarray(
            rng.integers(1, 3, (4, 4, 4, cin, cout)).astype(np.float32)
        )
        mean, var, bias = _bn_vecs(rng, cout)
        ref = _ref(xv, pk, mean, var, bias, b)
        got = stem_conv_bn_relu_view_pallas(
            xv, pk, mean, var, bias, b, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-5
        )

    def test_eligibility(self):
        assert eligible((112, 112, 24, 256), (4, 4, 4, 24, 64), 8)
        # lanes not 128-aligned (B=1 T=90 -> 45 lanes)
        assert not eligible((112, 112, 24, 45), (4, 4, 4, 24, 64), 1)
        # kernel not 4-tap
        assert not eligible((112, 112, 24, 256), (3, 4, 4, 24, 64), 8)

    def test_gate_off_is_inert_on_cpu(self, rng, monkeypatch):
        """With the env gate forced on, the dispatcher must keep the XLA
        composition on CPU (the kernel is TPU-only outside interpret)."""
        from flickering_adversarial_video_tpu.ops.stem_tmajor import (
            stem_conv_bn_relu_view,
        )

        monkeypatch.setenv("FLICKER_STEM_PALLAS", "1")
        b = 8
        xv = jnp.asarray(
            rng.standard_normal((8, 8, 8, 128)).astype(np.float32)
        )
        pk = jnp.asarray(
            rng.standard_normal((4, 4, 4, 8, 16)).astype(np.float32)
        )
        mean, var, bias = _bn_vecs(rng, 16)
        ref = _ref(xv, pk, mean, var, bias, b)
        got = stem_conv_bn_relu_view(xv, pk, mean, var, bias, b)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
