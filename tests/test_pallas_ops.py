"""Pallas fused preprocess+perturb kernel: numeric parity vs the jnp path
(forward AND custom-VJP gradient), run in interpreter mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flickering_adversarial_video_tpu.ops.fused_apply import (
    _jnp_reference,
    _supported,
    fused_normalize_perturb,
)

# geometry with H*W*C % 128 == 0: 8x16x3 = 384 = 3*128
B, T, H, W, C = 2, 4, 8, 16, 3


@pytest.fixture
def data(rng):
    video = rng.integers(0, 255, (B, T, H, W, C), dtype=np.uint8)
    delta = (rng.normal(size=(T, 1, 1, C)) * 0.5).astype(np.float32)
    return jnp.asarray(video), jnp.asarray(delta)


def test_geometry_supported():
    assert _supported((B, T, H, W, C))
    assert _supported((8, 64, 224, 224, 3))
    assert _supported((8, 16, 112, 112, 3))


def test_forward_matches_jnp(data):
    video, delta = data
    got = fused_normalize_perturb(video, delta, jnp.float32(1.0))
    expected = _jnp_reference(video, delta, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)


def test_forward_adv_flag_zero(data):
    video, delta = data
    got = fused_normalize_perturb(video, delta, jnp.float32(0.0))
    expected = _jnp_reference(video, delta, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)


def test_gradient_matches_jnp(data):
    video, delta = data

    def loss_pallas(d):
        out = fused_normalize_perturb(video, d, jnp.float32(1.0))
        return jnp.sum(out * jnp.cos(out))  # nontrivial upstream gradient

    def loss_jnp(d):
        out = _jnp_reference(video, d, 1.0)
        return jnp.sum(out * jnp.cos(out))

    g_pallas = jax.grad(loss_pallas)(delta)
    g_jnp = jax.grad(loss_jnp)(delta)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_jnp), atol=1e-4)


def test_gradient_clip_mask(data):
    """Saturated pixels must contribute zero gradient."""
    video, _ = data
    delta = jnp.full((T, 1, 1, C), 5.0)  # everything clips to +1

    def loss(d):
        return jnp.sum(fused_normalize_perturb(video, d, jnp.float32(1.0)))

    g = jax.grad(loss)(delta)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_fallback_on_unsupported_geometry(rng):
    video = jnp.asarray(rng.integers(0, 255, (1, 3, 5, 5, 3), dtype=np.uint8))
    delta = jnp.zeros((3, 1, 1, 3))
    out = fused_normalize_perturb(video, delta, jnp.float32(1.0))
    expected = _jnp_reference(video, delta, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)


class TestPackedStemCustomBwd:
    """packed_stem_conv custom VJP must equal autodiff of the unrolled fwd."""

    def test_grad_parity(self, rng):
        from flickering_adversarial_video_tpu.ops.space_to_depth import (
            _stem_fwd_impl,
            pack_conv_spatiotemporal,
            pack_input,
            packed_stem_conv,
        )

        x = rng.normal(size=(2, 8, 16, 24, 3)).astype(np.float32)
        w = (rng.normal(size=(7, 7, 7, 3, 5)) * 0.1).astype(np.float32)
        xp = pack_input(jnp.asarray(x), axes=(1, 2, 3))
        pk, _ = pack_conv_spatiotemporal(jnp.asarray(w), (2, 2, 2))
        g = jnp.asarray(rng.normal(size=(2, 4, 8, 12, 5)).astype(np.float32))

        d_custom = jax.grad(lambda xp: jnp.sum(packed_stem_conv(xp, pk) * g))(xp)
        d_auto = jax.grad(lambda xp: jnp.sum(_stem_fwd_impl(xp, pk) * g))(xp)
        np.testing.assert_allclose(
            np.asarray(d_custom), np.asarray(d_auto), atol=1e-5
        )

    def test_forward_identical(self, rng):
        from flickering_adversarial_video_tpu.ops.space_to_depth import (
            _stem_fwd_impl,
            pack_conv_spatiotemporal,
            pack_input,
            packed_stem_conv,
        )

        x = rng.normal(size=(1, 4, 8, 8, 3)).astype(np.float32)
        w = (rng.normal(size=(7, 7, 7, 3, 4)) * 0.1).astype(np.float32)
        xp = pack_input(jnp.asarray(x), axes=(1, 2, 3))
        pk, _ = pack_conv_spatiotemporal(jnp.asarray(w), (2, 2, 2))
        np.testing.assert_array_equal(
            np.asarray(packed_stem_conv(xp, pk)), np.asarray(_stem_fwd_impl(xp, pk))
        )


class TestStemConvOnepass:
    """stem_conv_onepass: 3-D single-pass forward must equal the unrolled
    forward to float tolerance (different contraction order), its input grad
    must equal the unrolled autodiff exactly (same backward program)."""

    def _inputs(self, rng):
        from flickering_adversarial_video_tpu.ops.space_to_depth import (
            pack_conv_spatiotemporal,
            pack_input,
        )

        x = rng.normal(size=(2, 8, 16, 24, 3)).astype(np.float32)
        w = (rng.normal(size=(7, 7, 7, 3, 5)) * 0.1).astype(np.float32)
        xp = pack_input(jnp.asarray(x), axes=(1, 2, 3))
        pk, _ = pack_conv_spatiotemporal(jnp.asarray(w), (2, 2, 2))
        return xp, pk

    def test_forward_close(self, rng):
        from flickering_adversarial_video_tpu.ops.space_to_depth import (
            _stem_fwd_impl,
            stem_conv_onepass,
        )

        xp, pk = self._inputs(rng)
        got = np.asarray(stem_conv_onepass(xp, pk))
        ref = np.asarray(_stem_fwd_impl(xp, pk))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got / scale, ref / scale, atol=1e-6)

    def test_grad_equals_unrolled_autodiff(self, rng):
        from flickering_adversarial_video_tpu.ops.space_to_depth import (
            _stem_fwd_impl,
            stem_conv_onepass,
        )

        xp, pk = self._inputs(rng)
        g = jnp.asarray(rng.normal(size=(2, 4, 8, 12, 5)).astype(np.float32))
        d_one = jax.grad(lambda q: jnp.sum(stem_conv_onepass(q, pk) * g))(xp)
        d_auto = jax.grad(lambda q: jnp.sum(_stem_fwd_impl(q, pk) * g))(xp)
        np.testing.assert_array_equal(np.asarray(d_one), np.asarray(d_auto))

    def test_engine_env_toggle(self, rng, monkeypatch):
        """FLICKER_STEM_ONEPASS=1 swaps the stem forward inside the model;
        logits must stay equal to the default path to float tolerance."""
        from flickering_adversarial_video_tpu.models.i3d import (
            InceptionI3D,
            init_i3d_params,
        )

        variables = init_i3d_params(jax.random.key(0), num_classes=7, frames=8, size=16)
        model = InceptionI3D(num_classes=7, compute_dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(1, 8, 16, 16, 3)).astype(np.float32))
        base = np.asarray(model.apply(variables, x)[0])
        monkeypatch.setenv("FLICKER_STEM_ONEPASS", "1")
        one = np.asarray(model.apply(variables, x)[0])
        np.testing.assert_allclose(one, base, atol=1e-5)
