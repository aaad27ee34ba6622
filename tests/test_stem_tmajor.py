"""T-major batch-in-lanes stem region (ops/stem_tmajor.py).

Exactness targets:
  * view round-trip and lane-order (t*B+b) invariants;
  * stem_bn_relu_tmajor values + input gradient == the b-major fused stem
    (ops/space_to_depth.stem_conv_bn_relu math) through the view transposes;
  * strided_pool_view: values == lax.reduce_window on the view (Pallas
    kernel exercised via interpret mode); gradient == the reduce-window
    autodiff bit for bit, including engineered ties (select-and-scatter
    first-match row-major rule);
  * FLICKER_STEM_TMAJOR=1 model toggle: logits, endpoint values and
    delta-gradient parity with the default prepacked path, identical
    parameter tree, inert off-gate;
  * engine trajectory parity on the 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flickering_adversarial_video_tpu.ops.stem_tmajor import (
    from_tmajor_view,
    stem_bn_relu_tmajor,
    strided_pool_view,
    to_tmajor_view,
)


@pytest.fixture
def rng():
    return np.random.default_rng(17)


class TestView:
    def test_roundtrip(self, rng):
        x = jnp.asarray(rng.normal(size=(3, 4, 5, 6, 7)).astype(np.float32))
        xv = to_tmajor_view(x)
        assert xv.shape == (5, 6, 7, 12)
        np.testing.assert_array_equal(
            np.asarray(from_tmajor_view(xv, 3)), np.asarray(x)
        )

    def test_lane_order_is_t_major(self, rng):
        """lane index == t*B + b: temporal taps are contiguous windows."""
        b, t = 3, 4
        x = jnp.asarray(rng.normal(size=(b, t, 2, 2, 5)).astype(np.float32))
        xv = np.asarray(to_tmajor_view(x))
        for ti in range(t):
            for bi in range(b):
                np.testing.assert_array_equal(
                    xv[..., ti * b + bi], np.asarray(x[bi, ti])
                )


def _ref_stem(xp, pk, mean, var, bias):
    from flickering_adversarial_video_tpu.ops.space_to_depth import (
        _stem_bn_relu_math,
    )

    return _stem_bn_relu_math(xp, pk, mean, var, bias, 1e-3)


class TestStemTmajor:
    def _inputs(self, rng, dtype=np.float32, b=2, t=4, hw=10, cin=6, cout=8):
        xp = jnp.asarray(rng.normal(size=(b, t, hw, hw, cin)).astype(dtype))
        pk = jnp.asarray(rng.normal(size=(4, 4, 4, cin, cout)).astype(dtype))
        mean = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        var = jnp.asarray(rng.uniform(0.5, 2.0, size=(cout,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        return xp, pk, mean, var, bias

    def test_forward_matches_bmajor(self, rng):
        xp, pk, mean, var, bias = self._inputs(rng)
        b = xp.shape[0]
        yv = stem_bn_relu_tmajor(to_tmajor_view(xp), pk, mean, var, bias, b)
        want = _ref_stem(xp, pk, mean, var, bias)
        np.testing.assert_allclose(
            np.asarray(from_tmajor_view(yv, b)), np.asarray(want), atol=1e-5
        )

    def test_input_gradient_matches_autodiff(self, rng):
        xp, pk, mean, var, bias = self._inputs(rng)
        b = xp.shape[0]
        g = jnp.asarray(
            rng.normal(size=_ref_stem(xp, pk, mean, var, bias).shape).astype(
                np.float32
            )
        )

        def loss_view(q):
            yv = stem_bn_relu_tmajor(to_tmajor_view(q), pk, mean, var, bias, b)
            return jnp.sum(from_tmajor_view(yv, b) * g)

        def loss_ref(q):
            return jnp.sum(_ref_stem(q, pk, mean, var, bias) * g)

        got = np.asarray(jax.grad(loss_view)(xp))
        want = np.asarray(jax.grad(loss_ref)(xp))
        scale = max(np.abs(want).max(), 1e-30)
        np.testing.assert_allclose(got / scale, want / scale, atol=1e-5)

    def test_frozen_victim_cotangents_zero(self, rng):
        xp, pk, mean, var, bias = self._inputs(rng)
        b = xp.shape[0]

        def loss(k, v):
            return jnp.sum(
                stem_bn_relu_tmajor(to_tmajor_view(xp), k, mean, v, bias, b)
            )

        dk, dv = jax.grad(loss, argnums=(0, 1))(pk, var)
        assert not np.asarray(dk).any() and not np.asarray(dv).any()

    def test_bf16(self, rng):
        xp, pk, mean, var, bias = self._inputs(rng, b=1, t=2, hw=8)
        xp16, pk16 = xp.astype(jnp.bfloat16), pk.astype(jnp.bfloat16)
        yv = stem_bn_relu_tmajor(to_tmajor_view(xp16), pk16, mean, var, bias, 1)
        assert yv.dtype == jnp.bfloat16
        want = _ref_stem(xp16, pk16, mean, var, bias)
        np.testing.assert_allclose(
            np.asarray(from_tmajor_view(yv, 1), dtype=np.float32),
            np.asarray(want, dtype=np.float32),
            atol=0.1,
        )


def _ref_pool_view(xv):
    from jax import lax

    return lax.reduce_window(
        xv,
        -jnp.inf,
        lax.max,
        (3, 3, 1, 1),
        (2, 2, 1, 1),
        ((0, 1), (0, 1), (0, 0), (0, 0)),
    )


class TestStridedPoolView:
    @pytest.mark.parametrize("shape", [(8, 8, 3, 5), (14, 10, 4, 6)])
    def test_forward_matches_reduce_window(self, rng, shape):
        xv = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        got = strided_pool_view(xv, True)  # interpret: exercise the kernel
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(_ref_pool_view(xv))
        )

    def test_offtpu_gate_without_interpret(self, rng):
        """On CPU the op silently uses reduce-window — the model gate is
        inert off-TPU."""
        xv = jnp.asarray(rng.normal(size=(8, 8, 3, 5)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(strided_pool_view(xv)), np.asarray(_ref_pool_view(xv))
        )

    def test_grad_matches_autodiff_with_ties(self, rng):
        # integer values: plenty of exact window ties; integer cotangents:
        # routed sums exact in f32 — bit-equality checks the ROUTING
        xv = jnp.asarray(rng.integers(0, 3, size=(12, 12, 3, 4)).astype(np.float32))
        g = jnp.asarray(rng.integers(-8, 9, size=(6, 6, 3, 4)).astype(np.float32))
        got = jax.grad(lambda q: jnp.sum(strided_pool_view(q, True) * g))(xv)
        want = jax.grad(lambda q: jnp.sum(_ref_pool_view(q) * g))(xv)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _ref_unit3d(x, kt, mean, var, bias, eps=1e-3):
    """The b-major Unit3D math: one 3-D SAME stride-1 conv + frozen BN +
    relu (what nn.Conv + nn.BatchNorm compute in f32)."""
    from jax import lax

    y = lax.conv_general_dilated(
        x, kt, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    y = (y - mean) * lax.rsqrt(var + eps) + bias
    return jax.nn.relu(y)


class TestConvBnReluTmajor:
    """conv_bn_relu_tmajor: the generic odd-kernel stride-1 Unit3D on the
    view (Conv3d_2b_1x1 KT=1 and Conv3d_2c_3x3 KT=3 in the 2BC extension)."""

    def _inputs(self, rng, kshape, cin=6, cout=10, b=2, t=4, hw=8):
        x = jnp.asarray(rng.normal(size=(b, t, hw, hw, cin)).astype(np.float32))
        kt = jnp.asarray(rng.normal(size=(*kshape, cin, cout)).astype(np.float32))
        mean = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        var = jnp.asarray(rng.uniform(0.5, 2.0, size=(cout,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        return x, kt, mean, var, bias

    @pytest.mark.parametrize("kshape", [(1, 1, 1), (3, 3, 3), (3, 1, 1)])
    def test_forward_matches_bmajor_unit(self, rng, kshape):
        from flickering_adversarial_video_tpu.ops.stem_tmajor import (
            conv_bn_relu_tmajor,
        )

        x, kt, mean, var, bias = self._inputs(rng, kshape)
        b = x.shape[0]
        yv = conv_bn_relu_tmajor(to_tmajor_view(x), kt, mean, var, bias, b)
        want = _ref_unit3d(x, kt, mean, var, bias)
        np.testing.assert_allclose(
            np.asarray(from_tmajor_view(yv, b)), np.asarray(want), atol=1e-5
        )

    @pytest.mark.parametrize("kshape", [(1, 1, 1), (3, 3, 3)])
    def test_input_gradient_matches_autodiff(self, rng, kshape):
        from flickering_adversarial_video_tpu.ops.stem_tmajor import (
            conv_bn_relu_tmajor,
        )

        x, kt, mean, var, bias = self._inputs(rng, kshape)
        b = x.shape[0]
        g = jnp.asarray(
            rng.normal(size=_ref_unit3d(x, kt, mean, var, bias).shape).astype(
                np.float32
            )
        )

        def loss_view(q):
            yv = conv_bn_relu_tmajor(to_tmajor_view(q), kt, mean, var, bias, b)
            return jnp.sum(from_tmajor_view(yv, b) * g)

        def loss_ref(q):
            return jnp.sum(_ref_unit3d(q, kt, mean, var, bias) * g)

        got = np.asarray(jax.grad(loss_view)(x))
        want = np.asarray(jax.grad(loss_ref)(x))
        scale = max(np.abs(want).max(), 1e-30)
        np.testing.assert_allclose(got / scale, want / scale, atol=1e-5)

    def test_frozen_victim_cotangents_zero(self, rng):
        from flickering_adversarial_video_tpu.ops.stem_tmajor import (
            conv_bn_relu_tmajor,
        )

        x, kt, mean, var, bias = self._inputs(rng, (3, 3, 3))
        b = x.shape[0]

        def loss(k, v):
            return jnp.sum(
                conv_bn_relu_tmajor(to_tmajor_view(x), k, mean, v, bias, b)
            )

        dk, dv = jax.grad(loss, argnums=(0, 1))(kt, var)
        assert not np.asarray(dk).any() and not np.asarray(dv).any()


class Test2bcExtension:
    """FLICKER_TMAJOR_2BC: the view region extended through Conv3d_2b_1x1 /
    Conv3d_2c_3x3 / MaxPool3d_3a_3x3 (models/i3d.py)."""

    def _setup(self, rng, size=16, frames=8, k=7):
        from flickering_adversarial_video_tpu.models.i3d import (
            InceptionI3D,
            init_i3d_params,
        )
        from flickering_adversarial_video_tpu.ops.space_to_depth import pack_input

        variables = init_i3d_params(
            jax.random.key(0), num_classes=k, frames=frames, size=size
        )
        m = InceptionI3D(
            num_classes=k, compute_dtype=jnp.float32, prepacked_stem_input=True
        )
        x = jnp.asarray(
            rng.normal(size=(2, frames, size, size, 3)).astype(np.float32)
        )
        return m, variables, pack_input(x, axes=(1, 2, 3))

    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_region_endpoints_and_grad_match_bmajor(self, rng, monkeypatch):
        m, variables, xp = self._setup(rng)

        def loss(q):
            return jnp.sum(m.apply(variables, q)[0] ** 2)

        monkeypatch.setenv("FLICKER_STEM_TMAJOR", "0")
        base, ep_base = m.apply(variables, xp)
        gbase = np.asarray(jax.grad(loss)(xp))
        monkeypatch.setenv("FLICKER_STEM_TMAJOR", "1")
        monkeypatch.setenv("FLICKER_TMAJOR_2BC", "1")
        got, ep_got = m.apply(variables, xp)
        ggot = np.asarray(jax.grad(loss)(xp))
        for name in ("Conv3d_2b_1x1", "Conv3d_2c_3x3", "MaxPool3d_3a_3x3"):
            np.testing.assert_allclose(
                np.asarray(ep_got[name]), np.asarray(ep_base[name]), atol=1e-5,
                err_msg=name,
            )
        np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-5)
        scale = max(np.abs(gbase).max(), 1e-30)
        np.testing.assert_allclose(ggot / scale, gbase / scale, atol=1e-5)

    def test_off_gate_keeps_bmajor_region(self, rng, monkeypatch):
        """FLICKER_TMAJOR_2BC=0 with the T-major stem on: identical values
        (the region falls back to the b-major Unit3D path after unview)."""
        m, variables, xp = self._setup(rng)
        monkeypatch.setenv("FLICKER_STEM_TMAJOR", "1")
        monkeypatch.setenv("FLICKER_TMAJOR_2BC", "1")
        on, _ = m.apply(variables, xp)
        monkeypatch.setenv("FLICKER_TMAJOR_2BC", "0")
        off, _ = m.apply(variables, xp)
        np.testing.assert_allclose(np.asarray(on), np.asarray(off), atol=1e-5)

    def test_odd_pool2a_output_falls_back(self, rng, monkeypatch):
        """size=12 -> pool2a output is 3x3 (odd): the 2BC gate must decline
        (pool3a in the view needs even extents) and still match b-major."""
        m, variables, xp = self._setup(rng, size=12)
        monkeypatch.setenv("FLICKER_STEM_TMAJOR", "0")
        base, _ = m.apply(variables, xp)
        monkeypatch.setenv("FLICKER_STEM_TMAJOR", "1")
        monkeypatch.setenv("FLICKER_TMAJOR_2BC", "1")
        got, _ = m.apply(variables, xp)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-5)


def _ref_pool3d_view(xv, b, window, strides):
    """reduce_window on the unviewed tensor, viewed back — the tie oracle."""
    from jax import lax

    x = from_tmajor_view(xv, b)
    y = lax.reduce_window(
        x, -jnp.inf, lax.max, (1, *window, 1), (1, *strides, 1), "SAME"
    )
    return to_tmajor_view(y)


class TestViewPools:
    """The Mixed-region view pools (stride1_pool333_view, temporal_pool_view,
    pool4a_view, pool5a_view): values == reduce_window through the view
    transposes, gradients == reduce_window autodiff BIT FOR BIT on engineered
    integer ties (the select-and-scatter first-match rule, axis order T,H,W)."""

    def _tie_inputs(self, rng, b=2, t=4, h=8, w=8, c=3):
        xv = to_tmajor_view(
            jnp.asarray(rng.integers(0, 3, size=(b, t, h, w, c)).astype(np.float32))
        )
        return xv, b

    @pytest.mark.parametrize(
        "op_window_strides",
        [
            ("s1", (3, 3, 3), (1, 1, 1)),
            ("4a", (3, 3, 3), (2, 2, 2)),
            ("5a", (2, 2, 2), (2, 2, 2)),
        ],
    )
    def test_values_and_tie_grads_match_reduce_window(
        self, rng, op_window_strides
    ):
        from flickering_adversarial_video_tpu.ops.stem_tmajor import (
            pool4a_view,
            pool5a_view,
            stride1_pool333_view,
        )

        kind, window, strides = op_window_strides
        op = {
            "s1": stride1_pool333_view,
            "4a": pool4a_view,
            "5a": pool5a_view,
        }[kind]
        xv, b = self._tie_inputs(rng)
        got = op(xv, b)
        want = _ref_pool3d_view(xv, b, window, strides)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        g = jnp.asarray(
            rng.integers(-8, 9, size=want.shape).astype(np.float32)
        )
        dgot = jax.grad(lambda q: jnp.sum(op(q, b) * g))(xv)
        dwant = jax.grad(
            lambda q: jnp.sum(_ref_pool3d_view(q, b, window, strides) * g)
        )(xv)
        np.testing.assert_array_equal(np.asarray(dgot), np.asarray(dwant))

    def test_temporal_pool_window3_odd_free(self, rng):
        """temporal window 3 crosses parity blocks — exercise t not a
        multiple of 4 (parity needs only even T')."""
        from flickering_adversarial_video_tpu.ops.stem_tmajor import (
            temporal_pool_view,
        )

        xv, b = self._tie_inputs(rng, t=6)
        got = temporal_pool_view(xv, b, 3)
        want = _ref_pool3d_view(xv, b, (3, 1, 1), (2, 1, 1))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        g = jnp.asarray(rng.integers(-8, 9, size=want.shape).astype(np.float32))
        dgot = jax.grad(lambda q: jnp.sum(temporal_pool_view(q, b, 3) * g))(xv)
        dwant = jax.grad(
            lambda q: jnp.sum(_ref_pool3d_view(q, b, (3, 1, 1), (2, 1, 1)) * g)
        )(xv)
        np.testing.assert_array_equal(np.asarray(dgot), np.asarray(dwant))


class TestViewDepth:
    """FLICKER_TMAJOR_DEPTH: the view region extended through the Mixed
    blocks and strided pools (models/i3d.py vdepth)."""

    def _setup(self, rng, size=16, frames=8, k=7):
        from flickering_adversarial_video_tpu.models.i3d import (
            InceptionI3D,
            init_i3d_params,
        )
        from flickering_adversarial_video_tpu.ops.space_to_depth import pack_input

        variables = init_i3d_params(
            jax.random.key(0), num_classes=k, frames=frames, size=size
        )
        m = InceptionI3D(
            num_classes=k, compute_dtype=jnp.float32, prepacked_stem_input=True
        )
        x = jnp.asarray(
            rng.normal(size=(2, frames, size, size, 3)).astype(np.float32)
        )
        return m, variables, pack_input(x, axes=(1, 2, 3))

    @pytest.mark.parametrize("depth", ["4a", "5a", "5c"])
    def test_depth_logits_endpoints_grads_match_bmajor(
        self, rng, depth, monkeypatch
    ):
        m, variables, xp = self._setup(rng)

        def loss(q):
            return jnp.sum(m.apply(variables, q)[0] ** 2)

        monkeypatch.setenv("FLICKER_STEM_TMAJOR", "0")
        base, ep_base = m.apply(variables, xp)
        gbase = np.asarray(jax.grad(loss)(xp))
        monkeypatch.setenv("FLICKER_STEM_TMAJOR", "1")
        monkeypatch.setenv("FLICKER_TMAJOR_2BC", "1")
        monkeypatch.setenv("FLICKER_TMAJOR_DEPTH", depth)
        got, ep_got = m.apply(variables, xp)
        ggot = np.asarray(jax.grad(loss)(xp))
        checked = {
            "4a": ("Mixed_3b", "Mixed_3c", "MaxPool3d_4a_3x3"),
            "5a": ("Mixed_4b", "Mixed_4f", "MaxPool3d_5a_2x2"),
            "5c": ("Mixed_5b", "Mixed_5c"),
        }[depth]
        for name in checked:
            np.testing.assert_allclose(
                np.asarray(ep_got[name]), np.asarray(ep_base[name]), atol=1e-5,
                err_msg=name,
            )
        np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-5)
        scale = max(np.abs(gbase).max(), 1e-30)
        np.testing.assert_allclose(ggot / scale, gbase / scale, atol=1e-5)

    def test_ineligible_geometry_clamps_depth(self, rng, monkeypatch):
        """frames=4 -> T'=2 at pool3a: depth 5a needs T'%4==0, so it must
        clamp to 4a (not crash) and still match b-major."""
        m, variables, xp = self._setup(rng, frames=4)
        monkeypatch.setenv("FLICKER_STEM_TMAJOR", "0")
        base, _ = m.apply(variables, xp)
        monkeypatch.setenv("FLICKER_STEM_TMAJOR", "1")
        monkeypatch.setenv("FLICKER_TMAJOR_DEPTH", "5c")
        got, _ = m.apply(variables, xp)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-5)


class TestModelToggle:
    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_model_env_toggle(self, rng, monkeypatch):
        """FLICKER_STEM_TMAJOR=1: logits, endpoint values and input-gradient
        parity with the default prepacked-stem path."""
        from flickering_adversarial_video_tpu.models.i3d import (
            InceptionI3D,
            init_i3d_params,
        )
        from flickering_adversarial_video_tpu.ops.space_to_depth import pack_input

        variables = init_i3d_params(jax.random.key(0), num_classes=7, frames=8, size=32)
        m = InceptionI3D(
            num_classes=7, compute_dtype=jnp.float32, prepacked_stem_input=True
        )
        # B=2: the B==1 default would take the outpack fused-stem path
        x = jnp.asarray(rng.normal(size=(2, 8, 32, 32, 3)).astype(np.float32))
        xp = pack_input(x, axes=(1, 2, 3))

        def loss(q):
            return jnp.sum(m.apply(variables, q)[0] ** 2)

        base, ep_base = m.apply(variables, xp)
        gbase = np.asarray(jax.grad(loss)(xp))
        monkeypatch.setenv("FLICKER_STEM_TMAJOR", "1")
        v1 = init_i3d_params(jax.random.key(0), num_classes=7, frames=8, size=32)
        assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v1)
        got, ep_got = m.apply(variables, xp)
        ggot = np.asarray(jax.grad(loss)(xp))
        for name in ("Conv3d_1a_7x7", "MaxPool3d_2a_3x3"):
            np.testing.assert_allclose(
                np.asarray(ep_got[name]), np.asarray(ep_base[name]), atol=1e-5
            )
        np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-5)
        scale = max(np.abs(gbase).max(), 1e-30)
        np.testing.assert_allclose(ggot / scale, gbase / scale, atol=1e-5)


class TestFusedTmajorHead:
    """flicker_stem_tmajor: preprocess (u8 normalize + delta + clip) AND the
    T-major stem conv+BN+relu as one custom-VJP op whose backward reduces the
    masked cotangent straight to d(delta) — the f32 d(adv) tensor never
    materializes."""

    def _inputs(self, rng, b=2, t=4, hw=8, c=3, cout=16):
        u8 = jnp.asarray(rng.integers(0, 256, (b, t, hw, hw, 8 * c), dtype=np.uint8))
        # channel 0 delta EXACTLY zero: every u8==0 pixel in channel 0 hits
        # pre == -1.0 == input_min exactly — the clip-boundary 0.5-gradient
        # tie case is exercised, not just documented
        delta = rng.uniform(-0.2, 0.2, (2 * t, 1, 1, c)).astype(np.float32)
        delta[..., 0] = 0.0
        pk = jnp.asarray(rng.normal(size=(4, 4, 4, 8 * c, cout)).astype(np.float32))
        mean = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        var = jnp.asarray(rng.uniform(0.5, 2.0, size=(cout,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        assert (np.asarray(u8)[..., :1] == 0).any(), "no engineered boundary hit"
        return u8, jnp.asarray(delta), pk, mean, var, bias

    @staticmethod
    def _ref(u8, d, flag, pk, mean, var, bias):
        """the composed reference: jnp.clip autodiff defines the boundary
        semantics the fused op must reproduce."""
        from flickering_adversarial_video_tpu.ops.packed_apply import (
            pack_flicker_delta,
        )

        dpk = pack_flicker_delta(d)
        x32 = u8.astype(jnp.float32) / 128.0 - 1.0
        adv = jnp.clip(x32 + flag * dpk[None], -1.0, 1.0)
        return _ref_stem(adv, pk, mean, var, bias)

    def test_value_and_grads_match_composed_reference(self, rng):
        from flickering_adversarial_video_tpu.ops.stem_tmajor import (
            flicker_stem_tmajor,
        )

        u8, delta, pk, mean, var, bias = self._inputs(rng)
        b, t = u8.shape[:2]
        g = jnp.asarray(
            rng.normal(size=self._ref(u8, delta, 1.0, pk, mean, var, bias).shape)
            .astype(np.float32)
        )

        def loss_fused(d, flag):
            y = flicker_stem_tmajor(
                u8, d, flag, pk, mean, var, bias, -1.0, 1.0, jnp.float32
            )
            # [H,W,Cout,T',B] -> [B,T',H,W,Cout]
            return jnp.sum(jnp.transpose(y, (4, 3, 0, 1, 2)) * g)

        def loss_ref(d, flag):
            return jnp.sum(self._ref(u8, d, flag, pk, mean, var, bias) * g)

        flag = jnp.float32(1.0)
        np.testing.assert_allclose(
            float(loss_fused(delta, flag)), float(loss_ref(delta, flag)), rtol=1e-6
        )
        gd, gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(delta, flag)
        wd, wf = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(delta, flag)
        scale = max(np.abs(np.asarray(wd)).max(), 1e-30)
        np.testing.assert_allclose(
            np.asarray(gd) / scale, np.asarray(wd) / scale, atol=1e-5
        )
        np.testing.assert_allclose(float(gf), float(wf), rtol=1e-4)

    def test_frozen_victim_cotangents_zero(self, rng):
        from flickering_adversarial_video_tpu.ops.stem_tmajor import (
            flicker_stem_tmajor,
        )

        u8, delta, pk, mean, var, bias = self._inputs(rng)

        def loss(k, v):
            return jnp.sum(
                flicker_stem_tmajor(
                    u8, delta, jnp.float32(1.0), k, mean, v, bias, -1.0, 1.0,
                    jnp.float32,
                )
            )

        dk, dv = jax.grad(loss, argnums=(0, 1))(pk, var)
        assert not np.asarray(dk).any() and not np.asarray(dv).any()

    def test_engine_head_trajectory_matches(self, rng, monkeypatch):
        """AttackEngine with the T-major StemHead (FLICKER_TMAJOR_HEAD=1
        forces eligibility on the multi-device CPU test mesh): delta
        trajectory, clean logits, and eval counters match the plain
        prepacked path."""
        monkeypatch.setenv("FLICKER_TMAJOR_HEAD", "1")
        from flickering_adversarial_video_tpu.attack import FlickerSpec
        from flickering_adversarial_video_tpu.data.packing import pack_video_np
        from flickering_adversarial_video_tpu.engine import (
            AttackConfig,
            AttackEngine,
            RuntimeFlags,
        )
        from flickering_adversarial_video_tpu.models.i3d import (
            InceptionI3D,
            build_stem_head,
            init_i3d_params,
        )

        frames, size, k = 8, 16, 7
        model = InceptionI3D(num_classes=k, compute_dtype=jnp.float32)
        packed_model = InceptionI3D(
            num_classes=k, compute_dtype=jnp.float32, prepacked_stem_input=True
        )
        variables = init_i3d_params(
            jax.random.key(2), num_classes=k, frames=frames, size=size
        )
        spec = FlickerSpec(frames=frames)

        def mk(stem_head):
            return AttackEngine(
                lambda v, x: model.apply(v, x)[0],
                variables,
                spec,
                AttackConfig(),
                apply_packed_fn=lambda v, xp: packed_model.apply(v, xp)[0],
                stem_head=stem_head,
            )

        e0 = mk(None)
        e1 = mk(
            build_stem_head(
                variables, num_classes=k, compute_dtype=jnp.float32, tmajor=True
            )
        )
        assert e1.stem_head.tmajor
        video = rng.integers(0, 256, (2, frames, size, size, 3), dtype=np.uint8)
        batch = {
            "video_packed": jnp.asarray(pack_video_np(video)),
            "labels": jnp.asarray(rng.integers(0, k, (2,))),
        }
        flags = RuntimeFlags()
        key = jax.random.key(0)
        s0, s1 = e0.init_state(), e1.init_state()
        for _ in range(3):
            s0, m0 = e0.train_step(s0, batch, flags, key)
            s1, m1 = e1.train_step(s1, batch, flags, key)
            assert float(m1["total_loss"]) == pytest.approx(
                float(m0["total_loss"]), rel=1e-6
            )
        np.testing.assert_allclose(
            np.asarray(s1.delta), np.asarray(s0.delta), rtol=1e-5, atol=1e-8
        )
        l0 = np.asarray(
            e0._packed_logits(None, batch["video_packed"], flags, prepacked=True)
        )
        l1 = np.asarray(
            e1._packed_logits(None, batch["video_packed"], flags, prepacked=True)
        )
        np.testing.assert_allclose(l1, l0, atol=1e-5)
        delta = jnp.asarray(
            rng.uniform(-0.3, 0.3, (frames, 1, 1, 3)).astype(np.float32)
        )
        ev0 = e0.eval_step(delta, batch, flags, key)
        ev1 = e1.eval_step(delta, batch, flags, key)
        assert int(ev0["miss"]) == int(ev1["miss"])
        assert int(ev0["valid"]) == int(ev1["valid"])

    def test_ineligible_geometry_falls_back(self, rng, monkeypatch):
        """Without the env force, a multi-device process (the CPU test mesh)
        is ineligible — the engine must silently use the plain prepacked
        path, not crash or change numerics."""
        monkeypatch.delenv("FLICKER_TMAJOR_HEAD", raising=False)
        from flickering_adversarial_video_tpu.attack import FlickerSpec
        from flickering_adversarial_video_tpu.data.packing import pack_video_np
        from flickering_adversarial_video_tpu.engine import (
            AttackConfig,
            AttackEngine,
            RuntimeFlags,
        )
        from flickering_adversarial_video_tpu.models.i3d import (
            InceptionI3D,
            build_stem_head,
            init_i3d_params,
        )

        assert jax.device_count() > 1
        frames, size, k = 8, 16, 5
        model = InceptionI3D(num_classes=k, compute_dtype=jnp.float32)
        packed_model = InceptionI3D(
            num_classes=k, compute_dtype=jnp.float32, prepacked_stem_input=True
        )
        variables = init_i3d_params(
            jax.random.key(0), num_classes=k, frames=frames, size=size
        )
        engine = AttackEngine(
            lambda v, x: model.apply(v, x)[0],
            variables,
            FlickerSpec(frames=frames),
            AttackConfig(),
            apply_packed_fn=lambda v, xp: packed_model.apply(v, xp)[0],
            stem_head=build_stem_head(
                variables, num_classes=k, compute_dtype=jnp.float32, tmajor=True
            ),
        )
        video = rng.integers(0, 256, (2, frames, size, size, 3), dtype=np.uint8)
        batch = {
            "video_packed": jnp.asarray(pack_video_np(video)),
            "labels": jnp.asarray(rng.integers(0, k, (2,))),
        }
        state, m = engine.train_step(
            engine.init_state(), batch, RuntimeFlags(), jax.random.key(0)
        )
        assert np.isfinite(float(m["total_loss"]))


class TestMeshParityTmajor:
    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_sharded_step_matches_single_device(self, rng, monkeypatch):
        """The T-major stem path under the 8-device data mesh must produce
        the same delta trajectory as single-device."""
        monkeypatch.setenv("FLICKER_STEM_TMAJOR", "1")
        from flickering_adversarial_video_tpu.attack import FlickerSpec
        from flickering_adversarial_video_tpu.data.packing import pack_video_np
        from flickering_adversarial_video_tpu.engine import (
            AttackConfig,
            AttackEngine,
            RuntimeFlags,
        )
        from flickering_adversarial_video_tpu.models.i3d import (
            InceptionI3D,
            init_i3d_params,
        )
        from flickering_adversarial_video_tpu.parallel import make_mesh

        assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
        frames, size = 8, 32
        variables = init_i3d_params(
            jax.random.key(0), num_classes=11, frames=frames, size=size
        )
        model = InceptionI3D(num_classes=11, compute_dtype=jnp.float32)
        packed_model = InceptionI3D(
            num_classes=11, compute_dtype=jnp.float32, prepacked_stem_input=True
        )
        mk = lambda mesh: AttackEngine(
            lambda v, x: model.apply(v, x)[0],
            variables,
            FlickerSpec(frames=frames),
            AttackConfig(),
            mesh=mesh,
            apply_packed_fn=lambda v, xp: packed_model.apply(v, xp)[0],
        )
        video = rng.integers(0, 255, (8, frames, size, size, 3), dtype=np.uint8)
        batch = {
            "video_packed": jnp.asarray(pack_video_np(video)),
            "labels": jnp.asarray(rng.integers(0, 11, (8,))),
        }
        flags = RuntimeFlags()
        single, multi = mk(None), mk(make_mesh())
        s_state, m_state = single.init_state(), multi.init_state()
        m_batch = multi.shard(batch)
        for i in range(3):
            k = jax.random.key(i)
            s_state, s_m = single.train_step(s_state, batch, flags, k)
            m_state, m_m = multi.train_step(m_state, m_batch, flags, k)
        np.testing.assert_allclose(
            np.asarray(s_state.delta), np.asarray(m_state.delta), atol=1e-6
        )
        np.testing.assert_allclose(
            float(s_m["total_loss"]), float(m_m["total_loss"]), rtol=1e-5
        )


class TestEmitTmajor:
    """emit_tmajor: the Pallas one-pass u8 -> (advT, 2x clip mask) emitter.
    Mosaic crashes lowering it on the current toolchain (recorded negative,
    gate FLICKER_TMAJOR_EMIT defaults off) — interpret mode pins the kernel's
    semantics bit-for-bit against the composed reference so a future
    toolchain can flip it on with confidence."""

    def _inputs(self, rng, b=2, t=4, h=6, w=8, c=24):
        u8 = np.asarray(
            rng.integers(0, 256, (b, t, h, w, c), dtype=np.uint8)
        )
        # engineered clip-boundary hits: u8==0 with dl==0 gives pre == -1.0
        # == lo exactly (mask value 1); u8==255 stays strictly inside hi
        u8[0, 0, 0, 0, 0] = 0
        dl = rng.uniform(-0.3, 0.3, (c, t * b)).astype(np.float32)
        dl[0] = 0.0
        return jnp.asarray(u8), jnp.asarray(dl)

    @staticmethod
    def _ref(u8, dl, lo, hi, out_dtype):
        from flickering_adversarial_video_tpu.ops.stem_tmajor import (
            _clip_grad_mask2,
            to_tmajor_view,
        )

        pre = to_tmajor_view(u8.astype(jnp.float32) / 128.0 - 1.0)
        pre = pre + dl[None, None]
        adv = jnp.clip(pre, lo, hi).astype(out_dtype)
        return adv, _clip_grad_mask2(pre, lo, hi)

    @pytest.mark.parametrize("out_dtype", [jnp.float32, jnp.bfloat16])
    def test_interpret_bit_equality(self, rng, out_dtype):
        from flickering_adversarial_video_tpu.ops.stem_tmajor import (
            emit_tmajor,
        )

        u8, dl = self._inputs(rng)
        adv, mask = emit_tmajor(u8, dl, -1.0, 1.0, out_dtype, interpret=True)
        want_adv, want_mask = self._ref(u8, dl, -1.0, 1.0, out_dtype)
        assert adv.dtype == out_dtype and mask.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(adv), np.asarray(want_adv))
        np.testing.assert_array_equal(np.asarray(mask), np.asarray(want_mask))
        # the engineered boundary tie actually landed
        assert (np.asarray(want_mask) == 1).any()

    def test_gate_is_inert_off_tpu(self, rng, monkeypatch):
        """FLICKER_TMAJOR_EMIT=1 on a non-TPU backend must take the plain
        path (the gate requires backend == tpu), so the fused head still
        matches the composed reference."""
        monkeypatch.setenv("FLICKER_TMAJOR_EMIT", "1")
        from flickering_adversarial_video_tpu.ops.stem_tmajor import (
            flicker_stem_tmajor,
        )

        th = TestFusedTmajorHead()
        u8, delta, pk, mean, var, bias = th._inputs(rng)
        y = flicker_stem_tmajor(
            u8, delta, jnp.float32(1.0), pk, mean, var, bias, -1.0, 1.0,
            jnp.float32,
        )
        want = th._ref(u8, delta, 1.0, pk, mean, var, bias)
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(y, (4, 3, 0, 1, 2))),
            np.asarray(want),
            atol=1e-5,
        )


class TestS1TLanesGate:
    """FLICKER_TMAJOR_S1T_LANES=1: branch_3 pool's temporal stage as
    merged-lane shifts (recorded chip negative, 60.42 -> 63.74 ms; default
    stays the 5-D form).  The gated path must be exact: values and
    first-match tie grads equal to reduce_window through the view."""

    def test_values_and_tie_grads_match(self, rng, monkeypatch):
        monkeypatch.setenv("FLICKER_TMAJOR_S1T_LANES", "1")
        from flickering_adversarial_video_tpu.ops.stem_tmajor import (
            stride1_pool333_view,
        )

        b, t = 2, 4
        xv = to_tmajor_view(
            jnp.asarray(
                rng.integers(0, 3, size=(b, t, 8, 8, 3)).astype(np.float32)
            )
        )
        got = stride1_pool333_view(xv, b)
        want = _ref_pool3d_view(xv, b, (3, 3, 3), (1, 1, 1))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        g = jnp.asarray(rng.integers(-8, 9, size=want.shape).astype(np.float32))
        dgot = jax.grad(lambda q: jnp.sum(stride1_pool333_view(q, b) * g))(xv)
        dwant = jax.grad(
            lambda q: jnp.sum(_ref_pool3d_view(q, b, (3, 3, 3), (1, 1, 1)) * g)
        )(xv)
        np.testing.assert_array_equal(np.asarray(dgot), np.asarray(dwant))


class TestU8FirstGate:
    """FLICKER_TMAJOR_U8FIRST (default on): the head transposes the u8 batch
    into the view BEFORE normalize+delta+clip.  Bit-identical to the
    b-major-first order — same per-element op sequence, transpose is
    value-preserving."""

    def test_bit_equal_to_bmajor_first(self, rng, monkeypatch):
        from flickering_adversarial_video_tpu.ops.stem_tmajor import (
            flicker_stem_tmajor,
        )

        th = TestFusedTmajorHead()
        u8, delta, pk, mean, var, bias = th._inputs(rng)

        def run():
            def loss(d):
                y = flicker_stem_tmajor(
                    u8, d, jnp.float32(1.0), pk, mean, var, bias, -1.0, 1.0,
                    jnp.float32,
                )
                return jnp.sum(y * y), y

            (val, y), gd = jax.value_and_grad(loss, has_aux=True)(delta)
            return np.asarray(y), np.asarray(gd)

        monkeypatch.setenv("FLICKER_TMAJOR_U8FIRST", "0")
        y0, g0 = run()
        monkeypatch.setenv("FLICKER_TMAJOR_U8FIRST", "1")
        y1, g1 = run()
        np.testing.assert_array_equal(y0, y1)
        np.testing.assert_array_equal(g0, g1)


class TestViewHead:
    """flicker_stem_tmajor_view + the engine's 'video_view' batch mode: a
    HOST view-prepacked [H,W,8C,T'B] batch drives the step with zero
    device-side layout crossings.  Outputs and gradients must equal the
    b-major head bit for bit (same per-element op order)."""

    def test_op_bit_equal_to_bmajor_head(self, rng):
        from flickering_adversarial_video_tpu.ops.stem_tmajor import (
            flicker_stem_tmajor,
            flicker_stem_tmajor_view,
            to_tmajor_view,
        )

        th = TestFusedTmajorHead()
        u8, delta, pk, mean, var, bias = th._inputs(rng)
        b = u8.shape[0]
        u8v = to_tmajor_view(u8)

        def loss_b(d, flag):
            y = flicker_stem_tmajor(
                u8, d, flag, pk, mean, var, bias, -1.0, 1.0, jnp.float32
            )
            return jnp.sum(y * y), y

        def loss_v(d, flag):
            y = flicker_stem_tmajor_view(
                u8v, d, flag, pk, mean, var, bias, -1.0, 1.0, jnp.float32, b
            )
            return jnp.sum(y * y), y

        flag = jnp.float32(1.0)
        (lb, yb), (gb, fb) = (
            jax.value_and_grad(loss_b, argnums=(0, 1), has_aux=True)(delta, flag)
        )
        (lv, yv), (gv, fv) = (
            jax.value_and_grad(loss_v, argnums=(0, 1), has_aux=True)(delta, flag)
        )
        np.testing.assert_array_equal(np.asarray(yv), np.asarray(yb))
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(gb))
        np.testing.assert_array_equal(float(fv), float(fb))

    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_engine_view_batch_matches_prepacked(self, rng, monkeypatch):
        """AttackEngine driven by a 'video_view' batch: delta trajectory,
        losses, and fooling counters equal the 'video_packed' path (which
        itself is pinned to the generic path by other tests)."""
        monkeypatch.setenv("FLICKER_TMAJOR_HEAD", "1")
        from flickering_adversarial_video_tpu.attack import FlickerSpec
        from flickering_adversarial_video_tpu.data.packing import (
            batch_to_view_np,
            pack_video_np,
        )
        from flickering_adversarial_video_tpu.engine import (
            AttackConfig,
            AttackEngine,
            RuntimeFlags,
        )
        from flickering_adversarial_video_tpu.models.i3d import (
            InceptionI3D,
            build_stem_head,
            init_i3d_params,
        )

        frames, size, k = 8, 16, 7
        model = InceptionI3D(num_classes=k, compute_dtype=jnp.float32)
        packed_model = InceptionI3D(
            num_classes=k, compute_dtype=jnp.float32, prepacked_stem_input=True
        )
        variables = init_i3d_params(
            jax.random.key(2), num_classes=k, frames=frames, size=size
        )
        mk = lambda: AttackEngine(
            lambda v, x: model.apply(v, x)[0],
            variables,
            FlickerSpec(frames=frames),
            AttackConfig(),
            apply_packed_fn=lambda v, xp: packed_model.apply(v, xp)[0],
            stem_head=build_stem_head(
                variables, num_classes=k, compute_dtype=jnp.float32, tmajor=True
            ),
            track_probs=True,
        )
        video = rng.integers(0, 256, (2, frames, size, size, 3), dtype=np.uint8)
        packed = pack_video_np(video)
        labels = jnp.asarray(rng.integers(0, k, (2,)))
        b_packed = {"video_packed": jnp.asarray(packed), "labels": labels}
        b_view = {
            "video_view": jnp.asarray(batch_to_view_np(packed)),
            "labels": labels,
        }
        flags = RuntimeFlags()
        key = jax.random.key(0)
        ep, ev = mk(), mk()
        sp, sv = ep.init_state(), ev.init_state()
        for _ in range(3):
            sp, mp = ep.train_eval_step(sp, b_packed, flags, key)
            sv, mv = ev.train_eval_step(sv, b_view, flags, key)
            np.testing.assert_allclose(
                float(mv["total_loss"]), float(mp["total_loss"]), rtol=1e-6
            )
            assert int(mv["miss"]) == int(mp["miss"])
            assert int(mv["valid"]) == int(mp["valid"])
        np.testing.assert_allclose(
            np.asarray(sv.delta), np.asarray(sp.delta), rtol=1e-5, atol=1e-8
        )
        d = jnp.asarray(
            rng.uniform(-0.3, 0.3, (frames, 1, 1, 3)).astype(np.float32)
        )
        evp = ep.eval_step(d, b_packed, flags, key)
        evv = ev.eval_step(d, b_view, flags, key)
        assert int(evp["miss"]) == int(evv["miss"])
        assert int(evp["valid"]) == int(evv["valid"])

    def test_view_batch_without_tmajor_head_raises(self, rng):
        from flickering_adversarial_video_tpu.attack import FlickerSpec
        from flickering_adversarial_video_tpu.engine import (
            AttackConfig,
            AttackEngine,
            RuntimeFlags,
        )
        from flickering_adversarial_video_tpu.models.i3d import (
            InceptionI3D,
            init_i3d_params,
        )

        frames, size, k = 8, 16, 5
        model = InceptionI3D(num_classes=k, compute_dtype=jnp.float32)
        packed_model = InceptionI3D(
            num_classes=k, compute_dtype=jnp.float32, prepacked_stem_input=True
        )
        variables = init_i3d_params(
            jax.random.key(0), num_classes=k, frames=frames, size=size
        )
        engine = AttackEngine(
            lambda v, x: model.apply(v, x)[0],
            variables,
            FlickerSpec(frames=frames),
            AttackConfig(),
            apply_packed_fn=lambda v, xp: packed_model.apply(v, xp)[0],
        )
        batch = {
            "video_view": jnp.zeros((size // 2, size // 2, 24, frames), jnp.uint8),
            "labels": jnp.zeros((2,), jnp.int32),
        }
        with pytest.raises(ValueError, match="T-major stem head"):
            engine.train_step(
                engine.init_state(), batch, RuntimeFlags(), jax.random.key(0)
            )

    def test_view_batch_under_mesh_shard_raises(self, rng):
        from flickering_adversarial_video_tpu.attack import FlickerSpec
        from flickering_adversarial_video_tpu.engine import (
            AttackConfig,
            AttackEngine,
        )
        from flickering_adversarial_video_tpu.models.i3d import (
            InceptionI3D,
            init_i3d_params,
        )
        from flickering_adversarial_video_tpu.parallel import make_mesh

        frames, size, k = 8, 16, 5
        model = InceptionI3D(num_classes=k, compute_dtype=jnp.float32)
        variables = init_i3d_params(
            jax.random.key(0), num_classes=k, frames=frames, size=size
        )
        engine = AttackEngine(
            lambda v, x: model.apply(v, x)[0],
            variables,
            FlickerSpec(frames=frames),
            AttackConfig(),
            mesh=make_mesh(),
        )
        batch = {
            "video_view": jnp.zeros((size // 2, size // 2, 24, frames), jnp.uint8),
            "labels": jnp.zeros((8,), jnp.int32),
        }
        with pytest.raises(ValueError, match="single-device only"):
            engine.shard(batch)
