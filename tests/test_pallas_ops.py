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


class TestStemConvFusedBwd:
    """stem_conv_fused_bwd: identical unrolled forward, backward as ONE 3-D
    conv of g with the fully-flipped kernel — must equal the unrolled
    autodiff to float tolerance (different contraction order)."""

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

    def test_forward_identical(self, rng):
        from flickering_adversarial_video_tpu.ops.space_to_depth import (
            _stem_fwd_impl,
            stem_conv_fused_bwd,
        )

        xp, pk = self._inputs(rng)
        np.testing.assert_array_equal(
            np.asarray(stem_conv_fused_bwd(xp, pk)),
            np.asarray(_stem_fwd_impl(xp, pk)),
        )

    def test_grad_close_to_unrolled_autodiff(self, rng):
        from flickering_adversarial_video_tpu.ops.space_to_depth import (
            _stem_fwd_impl,
            stem_conv_fused_bwd,
        )

        xp, pk = self._inputs(rng)
        g = jnp.asarray(rng.normal(size=(2, 4, 8, 12, 5)).astype(np.float32))
        d_fused = jax.grad(lambda q: jnp.sum(stem_conv_fused_bwd(q, pk) * g))(xp)
        d_auto = jax.grad(lambda q: jnp.sum(_stem_fwd_impl(q, pk) * g))(xp)
        scale = np.abs(np.asarray(d_auto)).max()
        np.testing.assert_allclose(
            np.asarray(d_fused) / scale, np.asarray(d_auto) / scale, atol=1e-6
        )

    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_engine_env_toggle(self, rng, monkeypatch):
        """FLICKER_STEM_BWD3D=1 swaps the stem inside the model; logits and
        the delta-gradient of a loss must match the default path."""
        from flickering_adversarial_video_tpu.models.i3d import (
            InceptionI3D,
            init_i3d_params,
        )

        variables = init_i3d_params(jax.random.key(0), num_classes=7, frames=8, size=16)
        model = InceptionI3D(num_classes=7, compute_dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(1, 8, 16, 16, 3)).astype(np.float32))

        def loss(delta):
            return jnp.sum(model.apply(variables, x + delta)[0] ** 2)

        delta = jnp.zeros((8, 1, 1, 3), jnp.float32)
        base = np.asarray(model.apply(variables, x)[0])
        gbase = np.asarray(jax.grad(loss)(delta))
        monkeypatch.setenv("FLICKER_STEM_BWD3D", "1")
        fused = np.asarray(model.apply(variables, x)[0])
        gfused = np.asarray(jax.grad(loss)(delta))
        np.testing.assert_allclose(fused, base, atol=1e-5)
        scale = max(np.abs(gbase).max(), 1e-30)
        np.testing.assert_allclose(gfused / scale, gbase / scale, atol=1e-5)


class TestStemConvCatBwd:
    """stem_conv_catbwd (the default stem path): identical unrolled forward;
    backward = one concat-kernel transposed conv + temporal shift-add, must
    equal the unrolled autodiff to float tolerance."""

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

    def test_forward_identical(self, rng):
        from flickering_adversarial_video_tpu.ops.space_to_depth import (
            _stem_fwd_impl,
            stem_conv_catbwd,
        )

        xp, pk = self._inputs(rng)
        np.testing.assert_array_equal(
            np.asarray(stem_conv_catbwd(xp, pk)),
            np.asarray(_stem_fwd_impl(xp, pk)),
        )

    def test_grad_close_to_unrolled_autodiff(self, rng):
        from flickering_adversarial_video_tpu.ops.space_to_depth import (
            _stem_fwd_impl,
            stem_conv_catbwd,
        )

        xp, pk = self._inputs(rng)
        g = jnp.asarray(rng.normal(size=(2, 4, 8, 12, 5)).astype(np.float32))
        d_cat = jax.grad(lambda q: jnp.sum(stem_conv_catbwd(q, pk) * g))(xp)
        d_auto = jax.grad(lambda q: jnp.sum(_stem_fwd_impl(q, pk) * g))(xp)
        scale = np.abs(np.asarray(d_auto)).max()
        np.testing.assert_allclose(
            np.asarray(d_cat) / scale, np.asarray(d_auto) / scale, atol=1e-6
        )

    def test_autodiff_env_toggle(self, rng, monkeypatch):
        """FLICKER_STEM_AUTODIFF=1 restores the round-2 autodiff path; the
        default (catbwd) model must match it in logits and delta-gradient."""
        from flickering_adversarial_video_tpu.models.i3d import (
            InceptionI3D,
            init_i3d_params,
        )

        variables = init_i3d_params(jax.random.key(0), num_classes=7, frames=8, size=16)
        model = InceptionI3D(num_classes=7, compute_dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(1, 8, 16, 16, 3)).astype(np.float32))

        def loss(delta):
            return jnp.sum(model.apply(variables, x + delta)[0] ** 2)

        delta = jnp.zeros((8, 1, 1, 3), jnp.float32)
        base = np.asarray(model.apply(variables, x)[0])
        gbase = np.asarray(jax.grad(loss)(delta))
        monkeypatch.setenv("FLICKER_STEM_AUTODIFF", "1")
        auto = np.asarray(model.apply(variables, x)[0])
        gauto = np.asarray(jax.grad(loss)(delta))
        np.testing.assert_allclose(auto, base, atol=1e-5)
        scale = max(np.abs(gbase).max(), 1e-30)
        np.testing.assert_allclose(gauto / scale, gbase / scale, atol=1e-5)


class TestConvOutpack:
    """conv3x3s1_outpack: forward identical; stride-2-W pair-packed backward
    must equal XLA autodiff to float tolerance (4/3 MACs, full lanes)."""

    def test_forward_and_grad(self, rng):
        from flickering_adversarial_video_tpu.ops.conv_wpack import (
            _fwd_conv,
            conv3x3s1_outpack,
        )

        x = jnp.asarray(rng.normal(size=(2, 6, 10, 12, 8)).astype(np.float32))
        k = jnp.asarray((rng.normal(size=(3, 3, 3, 8, 16)) * 0.1).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(conv3x3s1_outpack(x, k)), np.asarray(_fwd_conv(x, k))
        )
        g = jnp.asarray(rng.normal(size=(2, 6, 10, 12, 16)).astype(np.float32))
        d0 = jax.grad(lambda q: jnp.sum(_fwd_conv(q, k) * g))(x)
        d1 = jax.grad(lambda q: jnp.sum(conv3x3s1_outpack(q, k) * g))(x)
        scale = np.abs(np.asarray(d0)).max()
        np.testing.assert_allclose(
            np.asarray(d1) / scale, np.asarray(d0) / scale, atol=1e-6
        )


class TestStemFusedBN:
    """stem_conv_bn_relu: conv+frozen-BN+relu fused op must match the
    separate stem-conv -> nn.BatchNorm -> relu chain in values and
    delta-gradient (FLICKER_STEM_FUSED_BN model toggle)."""

    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_model_env_toggle(self, rng, monkeypatch):
        from flickering_adversarial_video_tpu.models.i3d import (
            InceptionI3D,
            init_i3d_params,
        )
        from flickering_adversarial_video_tpu.ops.space_to_depth import pack_input

        variables = init_i3d_params(jax.random.key(0), num_classes=7, frames=8, size=32)
        m = InceptionI3D(
            num_classes=7, compute_dtype=jnp.float32, prepacked_stem_input=True
        )
        x = jnp.asarray(rng.normal(size=(1, 8, 32, 32, 3)).astype(np.float32))
        xp = pack_input(x, axes=(1, 2, 3))

        def loss(q):
            return jnp.sum(m.apply(variables, q)[0] ** 2)

        monkeypatch.setenv("FLICKER_STEM_FUSED_BN", "0")
        base = np.asarray(m.apply(variables, xp)[0])
        gbase = np.asarray(jax.grad(loss)(xp))
        monkeypatch.setenv("FLICKER_STEM_FUSED_BN", "1")
        v1 = init_i3d_params(jax.random.key(0), num_classes=7, frames=8, size=32)
        assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v1)
        fused = np.asarray(m.apply(variables, xp)[0])
        gfused = np.asarray(jax.grad(loss)(xp))
        np.testing.assert_allclose(fused, base, atol=1e-5)
        scale = max(np.abs(gbase).max(), 1e-30)
        np.testing.assert_allclose(gfused / scale, gbase / scale, atol=1e-5)


class TestConvWpack:
    """conv3x3s1_wpack: forward identical to the plain conv; the W-packed
    backward-input must equal XLA autodiff to float tolerance."""

    def test_forward_and_grad(self, rng):
        from flickering_adversarial_video_tpu.ops.conv_wpack import (
            _fwd_conv,
            conv3x3s1_wpack,
        )

        x = jnp.asarray(rng.normal(size=(2, 6, 10, 12, 8)).astype(np.float32))
        k = jnp.asarray((rng.normal(size=(3, 3, 3, 8, 16)) * 0.1).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(conv3x3s1_wpack(x, k)), np.asarray(_fwd_conv(x, k))
        )
        g = jnp.asarray(rng.normal(size=(2, 6, 10, 12, 16)).astype(np.float32))
        d0 = jax.grad(lambda q: jnp.sum(_fwd_conv(q, k) * g))(x)
        d1 = jax.grad(lambda q: jnp.sum(conv3x3s1_wpack(q, k) * g))(x)
        scale = np.abs(np.asarray(d0)).max()
        np.testing.assert_allclose(
            np.asarray(d1) / scale, np.asarray(d0) / scale, atol=1e-6
        )

    def test_model_env_toggle(self, rng, monkeypatch):
        """FLICKER_CONV2C_WPACK=1 swaps Conv3d_2c_3x3's conv inside the
        model; logits and delta-gradient must match the default path."""
        from flickering_adversarial_video_tpu.models.i3d import (
            InceptionI3D,
            init_i3d_params,
        )

        variables = init_i3d_params(jax.random.key(0), num_classes=7, frames=8, size=32)
        model = InceptionI3D(num_classes=7, compute_dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(1, 8, 32, 32, 3)).astype(np.float32))

        def loss(delta):
            return jnp.sum(model.apply(variables, x + delta)[0] ** 2)

        delta = jnp.zeros((8, 1, 1, 3), jnp.float32)
        base = np.asarray(model.apply(variables, x)[0])
        gbase = np.asarray(jax.grad(loss)(delta))
        monkeypatch.setenv("FLICKER_CONV2C_WPACK", "1")
        packed = np.asarray(model.apply(variables, x)[0])
        gpacked = np.asarray(jax.grad(loss)(delta))
        np.testing.assert_allclose(packed, base, atol=1e-5)
        scale = max(np.abs(gbase).max(), 1e-30)
        np.testing.assert_allclose(gpacked / scale, gbase / scale, atol=1e-5)


class TestConvS1OutpackGeneral:
    """conv_s1_outpack: the (kT,kH,3) generalization of the stride-2-W
    output-packed backward, for the video-ResNet spatial convs."""

    def test_133_forward_and_grad(self, rng):
        from flickering_adversarial_video_tpu.ops.conv_wpack import (
            _fwd_conv_sym,
            conv_s1_outpack,
        )

        x = jnp.asarray(rng.normal(size=(2, 5, 10, 12, 8)).astype(np.float32))
        k = jnp.asarray((rng.normal(size=(1, 3, 3, 8, 16)) * 0.1).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(conv_s1_outpack(x, k)), np.asarray(_fwd_conv_sym(x, k))
        )
        g = jnp.asarray(rng.normal(size=(2, 5, 10, 12, 16)).astype(np.float32))
        d0 = jax.grad(lambda q: jnp.sum(_fwd_conv_sym(q, k) * g))(x)
        d1 = jax.grad(lambda q: jnp.sum(conv_s1_outpack(q, k) * g))(x)
        scale = np.abs(np.asarray(d0)).max()
        np.testing.assert_allclose(
            np.asarray(d1) / scale, np.asarray(d0) / scale, atol=1e-6
        )

    def test_333_matches_same_variant(self, rng):
        from flickering_adversarial_video_tpu.ops.conv_wpack import (
            conv3x3s1_outpack,
            conv_s1_outpack,
        )

        x = jnp.asarray(rng.normal(size=(1, 4, 6, 8, 4)).astype(np.float32))
        k = jnp.asarray((rng.normal(size=(3, 3, 3, 4, 8)) * 0.1).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(1, 4, 6, 8, 8)).astype(np.float32))
        d0 = jax.grad(lambda q: jnp.sum(conv3x3s1_outpack(q, k) * g))(x)
        d1 = jax.grad(lambda q: jnp.sum(conv_s1_outpack(q, k) * g))(x)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-6)

    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_r2plus1d_model_env_toggle(self, rng, monkeypatch):
        """FLICKER_RESNET_OUTPACK=1 swaps the eligible layer convs inside
        r2plus1d_18; logits and delta-gradient must match, parameter tree
        identical."""
        from flickering_adversarial_video_tpu.models.video_resnet import r2plus1d_18

        model = r2plus1d_18(num_classes=7, compute_dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(1, 4, 16, 16, 3)).astype(np.float32))
        variables = jax.jit(model.init)(jax.random.key(0), x)

        def loss(delta):
            return jnp.sum(model.apply(variables, x + delta) ** 2)

        delta = jnp.zeros((4, 1, 1, 3), jnp.float32)
        base = np.asarray(model.apply(variables, x))
        gbase = np.asarray(jax.grad(loss)(delta))
        monkeypatch.setenv("FLICKER_RESNET_OUTPACK", "1")
        v1 = jax.jit(model.init)(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v1)
        packed = np.asarray(model.apply(variables, x))
        gpacked = np.asarray(jax.grad(loss)(delta))
        np.testing.assert_allclose(packed, base, atol=1e-5)
        scale = max(np.abs(gbase).max(), 1e-30)
        np.testing.assert_allclose(gpacked / scale, gbase / scale, atol=1e-5)
