"""Pallas pool kernels vs XLA reduce-window (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from flickering_adversarial_video_tpu.ops.pallas_pool import (
    _pick_hw_blocks,
    _pick_t_block,
    overlap_pool_333,
    overlap_pool_333_supported,
    spatial_pool_132,
    spatial_pool_132_supported,
    strided_spatial_pool_conv,
    strided_spatial_pool_conv_supported,
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


def _ref_pool333(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1), (1, 1, 1, 1, 1), "SAME"
    )


class TestOverlapPool333:
    """Stride-1 (3,3,3) Pallas forward vs reduce-window — bit-exact values.

    Shapes mirror the I3D Inception-branch pool geometries (channel/extents
    scaled down) plus odd extents (the T=90 single-video tower: T=45 mixed
    blocks, H=W=7) and edge cases T<3."""

    @pytest.mark.parametrize("layout", ["conv", "plain"])
    @pytest.mark.parametrize(
        "shape",
        [
            (2, 4, 8, 8, 4),     # even extents, plane path
            (1, 3, 7, 7, 5),     # odd everything (Mixed_5 geometry)
            (2, 5, 4, 6, 3),     # odd T, mixed H/W
            (1, 1, 5, 5, 2),     # T=1: temporal window fully clamped
            (1, 2, 4, 4, 3),     # T=2: one-sided clamp each end
            (2, 16, 4, 4, 8),    # divisible T -> blocked kernel path
        ],
    )
    def test_forward_matches_xla(self, rng, shape, layout):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        got = overlap_pool_333(x, True, layout=layout)  # interpret mode on CPU
        np.testing.assert_array_equal(np.asarray(got), np.asarray(_ref_pool333(x)))

    @pytest.mark.parametrize("layout", ["conv", "plain"])
    def test_forward_bf16(self, rng, layout):
        x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 4)), jnp.bfloat16)
        got = overlap_pool_333(x, True, layout=layout)
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(_ref_pool333(x), np.float32)
        )

    @pytest.mark.parametrize("layout", ["conv", "plain"])
    def test_forward_with_ties(self, rng, layout):
        # quantized values force window ties — irrelevant for max VALUES but
        # asserts the candidate sets agree at the clamped edges
        x = jnp.asarray((rng.integers(0, 3, (2, 6, 6, 6, 4)) * 0.5).astype(np.float32))
        got = overlap_pool_333(x, True, layout=layout)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(_ref_pool333(x)))

    def test_blocked_path_exercised(self, rng):
        # T=16 picks Tb>1 for small planes; assert equality through that path
        assert _pick_t_block(16, 4, 4, 8, 4) > 1
        x = jnp.asarray(rng.standard_normal((1, 16, 4, 4, 8)).astype(np.float32))
        got = overlap_pool_333(x, True, layout="plain")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(_ref_pool333(x)))

    def test_t_block_vmem_budget(self):
        # headline geometries: Tb stays within the VMEM budget heuristic
        for t, h, w, c in [(32, 28, 28, 192), (16, 14, 14, 480), (8, 7, 7, 832)]:
            tb = _pick_t_block(t, h, w, c, 2)
            assert t % tb == 0
        # huge plane falls back to the per-plane kernel
        assert _pick_t_block(32, 112, 112, 64, 4) == 1

    def test_supported_guard(self):
        assert overlap_pool_333_supported((1, 2, 7, 9, 3))
        assert not overlap_pool_333_supported((2, 7, 9, 3))

    def test_model_gate_routes_backward_unchanged(self, rng, monkeypatch):
        # with the gate ON but off-TPU, max_pool_same must keep the XLA path
        # (the gate requires default_backend() == 'tpu'); grads stay exact
        from flickering_adversarial_video_tpu.ops.maxpool import max_pool_same

        monkeypatch.setenv("FLICKER_POOL_PALLAS_S1", "1")
        x = jnp.asarray(rng.standard_normal((1, 4, 6, 6, 3)).astype(np.float32))
        w = jax.random.normal(jax.random.key(1), x.shape)
        got = jax.grad(lambda z: jnp.sum(max_pool_same(z, (3, 3, 3), (1, 1, 1)) * w))(x)
        ref = jax.grad(lambda z: jnp.sum(_ref_pool333(z) * w))(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


class TestStridedSpatialPoolConv:
    """(1,3,3)/(1,2,2) producer-layout Pallas forward vs reduce-window."""

    @pytest.mark.parametrize(
        "shape",
        [
            (2, 3, 8, 8, 4),     # basic even extents
            (1, 2, 12, 16, 3),   # rectangular
            (2, 4, 4, 4, 5),     # tiny planes, odd C
            (1, 1, 16, 8, 2),    # single plane
            (2, 2, 14, 14, 8),   # H'=7 odd -> hb=7 path
        ],
    )
    def test_forward_matches_xla(self, rng, shape):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        got = strided_spatial_pool_conv(x, True)  # interpret mode on CPU
        ref = nn.max_pool(x, (1, 3, 3), (1, 2, 2), "SAME")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_forward_bf16(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 4)), jnp.bfloat16)
        got = strided_spatial_pool_conv(x, True)
        ref = nn.max_pool(x, (1, 3, 3), (1, 2, 2), "SAME")
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(ref, np.float32)
        )

    def test_grad_matches_autodiff_with_ties(self, rng):
        # the backward is XLA's own select-and-scatter bound directly — the
        # gradients must agree with reduce-window autodiff bit for bit,
        # including on engineered window ties
        x = jnp.asarray((rng.integers(0, 3, (2, 3, 8, 8, 4)) * 0.5).astype(np.float32))
        w = jax.random.normal(jax.random.key(0), (2, 3, 4, 4, 4))
        got = jax.grad(lambda z: jnp.sum(strided_spatial_pool_conv(z, True) * w))(x)
        ref = jax.grad(
            lambda z: jnp.sum(nn.max_pool(z, (1, 3, 3), (1, 2, 2), "SAME") * w)
        )(x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_block_picker_budget(self):
        # pool2a geometry: C=64, BT=256 — blocks stay within the VMEM budget
        hb, wb = _pick_hw_blocks(56, 56, 64, 256, 2)
        assert 56 % hb == 0 and 56 % wb == 0
        assert 4 * hb * wb * 64 * 256 * 2 <= 3 * 1024 * 1024
        # pool3a geometry: C=192, BT=256
        hb, wb = _pick_hw_blocks(28, 28, 192, 256, 2)
        assert 28 % hb == 0 and 28 % wb == 0

    def test_supported_guard(self):
        assert strided_spatial_pool_conv_supported((1, 2, 8, 8, 3))
        assert not strided_spatial_pool_conv_supported((1, 2, 7, 8, 3))
        assert not strided_spatial_pool_conv_supported((1, 2, 8, 9, 3))

    @pytest.mark.parametrize("block", [(1, 1), (1, 2), (2, 1)])
    def test_forward_block_edges(self, rng, block):
        # HB/WB == 1 exercises the empty-slice guards in the kernel
        x = jnp.asarray(rng.standard_normal((2, 2, 8, 8, 3)).astype(np.float32))
        got = strided_spatial_pool_conv(x, True, block)
        ref = nn.max_pool(x, (1, 3, 3), (1, 2, 2), "SAME")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestStridedSpatialPoolPair:
    """Paired forward+argmax-index / index-routing backward vs XLA."""

    @pytest.mark.parametrize(
        "shape",
        [
            (2, 3, 8, 8, 4),
            (1, 2, 12, 16, 3),
            (1, 1, 16, 8, 2),
            (2, 2, 14, 14, 8),
        ],
    )
    def test_forward_matches_xla(self, rng, shape):
        from flickering_adversarial_video_tpu.ops.pallas_pool import (
            strided_spatial_pool_pair,
        )

        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        got = strided_spatial_pool_pair(x, True)
        ref = nn.max_pool(x, (1, 3, 3), (1, 2, 2), "SAME")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    @pytest.mark.parametrize("block", [1, 2, 4])
    def test_grad_matches_autodiff_with_ties(self, rng, block):
        # the index-routing backward must equal XLA's select-and-scatter
        # (GE first-match over row-major window order) bit for bit —
        # quantized values engineer exact window ties, and block=1
        # exercises the halo-row masking at j==0
        from flickering_adversarial_video_tpu.ops.pallas_pool import (
            strided_spatial_pool_pair,
        )

        x = jnp.asarray((rng.integers(0, 3, (2, 3, 8, 8, 4)) * 0.5).astype(np.float32))
        w = jax.random.normal(jax.random.key(0), (2, 3, 4, 4, 4))
        got = jax.grad(
            lambda z: jnp.sum(strided_spatial_pool_pair(z, True, block) * w)
        )(x)
        ref = jax.grad(
            lambda z: jnp.sum(nn.max_pool(z, (1, 3, 3), (1, 2, 2), "SAME") * w)
        )(x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_grad_bf16(self, rng):
        from flickering_adversarial_video_tpu.ops.pallas_pool import (
            strided_spatial_pool_pair,
        )

        x = jnp.asarray(rng.integers(0, 3, (1, 2, 8, 8, 4)) * 0.5, jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (1, 2, 4, 4, 4), jnp.bfloat16)
        got = jax.grad(
            lambda z: jnp.sum(
                strided_spatial_pool_pair(z, True).astype(jnp.float32)
                * w.astype(jnp.float32)
            )
        )(x)
        ref = jax.grad(
            lambda z: jnp.sum(
                nn.max_pool(z, (1, 3, 3), (1, 2, 2), "SAME").astype(jnp.float32)
                * w.astype(jnp.float32)
            )
        )(x)
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(ref, np.float32)
        )

    def test_view_backward_matches(self, rng, monkeypatch):
        # FLICKER_POOL_2A_BWD_VIEW=1 binds select-and-scatter on the
        # [H,W,C,BT] view — gradients must be identical, incl. ties
        monkeypatch.setenv("FLICKER_POOL_2A_BWD_VIEW", "1")
        x = jnp.asarray((rng.integers(0, 3, (2, 3, 8, 8, 4)) * 0.5).astype(np.float32))
        w = jax.random.normal(jax.random.key(2), (2, 3, 4, 4, 4))
        got = jax.grad(lambda z: jnp.sum(strided_spatial_pool_conv(z, True) * w))(x)
        ref = jax.grad(
            lambda z: jnp.sum(nn.max_pool(z, (1, 3, 3), (1, 2, 2), "SAME") * w)
        )(x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_gate_inert_off_tpu(self, rng):
        # FLICKER_POOL_PALLAS_2A defaults ON — off-TPU it must fall back to
        # the XLA path (values + grads identical to reduce-window autodiff)
        from flickering_adversarial_video_tpu.ops.maxpool import max_pool_same

        x = jnp.asarray(rng.standard_normal((2, 2, 8, 8, 3)).astype(np.float32))
        w = jax.random.normal(jax.random.key(3), (2, 2, 4, 4, 3))
        got = jax.grad(lambda z: jnp.sum(max_pool_same(z, (1, 3, 3), (1, 2, 2)) * w))(x)
        ref = jax.grad(
            lambda z: jnp.sum(nn.max_pool(z, (1, 3, 3), (1, 2, 2), "SAME") * w)
        )(x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
