"""Outpacked stem + channel-space MaxPool2a fusion (ops/stem_pool.py).

Exactness targets:
  * pool helpers: values == lax.reduce_window SAME (1,3,3)/(1,2,2); routing
    backward == XLA select-and-scatter bit for bit, including engineered ties
    (the reference pools with tf.nn.max_pool3d — first-match row-major rule);
  * the full custom-VJP op == packed-stem conv -> BN -> relu -> pool chain in
    values and input gradient;
  * FLICKER_STEM_OUTPACK=1 model toggle: logits + delta-gradient parity with
    the default prepacked path, identical parameter tree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from flickering_adversarial_video_tpu.ops.stem_pool import (
    _blocks,
    pack_stem_kernel_outpack,
    pool2a_bwd_to_blocks,
    pool2a_fwd_from_blocks,
    stem_pool_outpack,
)


def _pack_hw(y):
    """Natural [B,T,H,W,C] -> channel blocks [B,T,H/2,W/2,4C], (s_h,s_w,C)."""
    return jnp.concatenate(
        [y[:, :, sh::2, sw::2, :] for sh in range(2) for sw in range(2)], axis=-1
    )


def _ref_pool(y):
    return lax.reduce_window(
        y, -jnp.inf, lax.max, (1, 1, 3, 3, 1), (1, 1, 2, 2, 1), "SAME"
    )


class TestPoolChannelSpace:
    def _check(self, y, g):
        yp = _pack_hw(y)
        m0, m1, out = pool2a_fwd_from_blocks(*_blocks(yp))
        want = _ref_pool(y)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))

        dy_ref = jax.grad(lambda q: jnp.sum(_ref_pool(q) * g))(y)
        dyp = pool2a_bwd_to_blocks(g, *_blocks(yp), m0, m1, out)
        np.testing.assert_array_equal(
            np.asarray(dyp), np.asarray(_pack_hw(dy_ref))
        )

    def _int_g(self, rng, shape):
        # integer cotangents: sums of several routed contributions are exact
        # in f32, so bit-equality checks the ROUTING, not float reassociation
        return jnp.asarray(rng.integers(-8, 9, size=shape).astype(np.float32))

    def test_random_values(self, rng):
        y = jnp.asarray(rng.normal(size=(2, 3, 8, 10, 5)).astype(np.float32))
        self._check(y, self._int_g(rng, (2, 3, 4, 5, 5)))

    def test_engineered_ties(self, rng):
        # few distinct integer values -> every window has ties; exactly
        # representable, so the first-match rule is the ONLY disambiguator
        y = jnp.asarray(
            rng.integers(0, 3, size=(2, 2, 12, 8, 3)).astype(np.float32)
        )
        self._check(y, self._int_g(rng, (2, 2, 6, 4, 3)))

    def test_all_equal_windows(self, rng):
        y = jnp.ones((1, 1, 8, 8, 4), jnp.float32)
        self._check(y, self._int_g(rng, (1, 1, 4, 4, 4)))


class TestStemPoolOutpack:
    def _natural(self, xp, pk, mean, var, bias):
        from flickering_adversarial_video_tpu.ops.space_to_depth import (
            _stem_bn_relu_math,
        )

        return _ref_pool(_stem_bn_relu_math(xp, pk, mean, var, bias, 1e-3))

    @pytest.fixture
    def problem(self, rng):
        xp = jnp.asarray(rng.normal(size=(2, 5, 8, 12, 8)).astype(np.float32))
        pk = jnp.asarray((rng.normal(size=(4, 4, 4, 8, 6)) * 0.2).astype(np.float32))
        mean = jnp.asarray(rng.normal(size=(6,)).astype(np.float32) * 0.1)
        var = jnp.asarray((rng.uniform(0.5, 2.0, size=(6,))).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(6,)).astype(np.float32) * 0.1)
        return xp, pk, mean, var, bias

    def test_forward_matches_natural(self, problem):
        xp, pk, mean, var, bias = problem
        pko = pack_stem_kernel_outpack(pk)
        got = stem_pool_outpack(xp, pk, pko, mean, var, bias)
        want = self._natural(xp, pk, mean, var, bias)
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_input_grad_matches_autodiff(self, problem, rng):
        xp, pk, mean, var, bias = problem
        pko = pack_stem_kernel_outpack(pk)
        g = jnp.asarray(rng.normal(size=(2, 5, 4, 6, 6)).astype(np.float32))

        d_fused = jax.grad(
            lambda q: jnp.sum(stem_pool_outpack(q, pk, pko, mean, var, bias) * g)
        )(xp)
        d_nat = jax.grad(
            lambda q: jnp.sum(self._natural(q, pk, mean, var, bias) * g)
        )(xp)
        scale = max(np.abs(np.asarray(d_nat)).max(), 1e-30)
        np.testing.assert_allclose(
            np.asarray(d_fused) / scale, np.asarray(d_nat) / scale, atol=1e-5
        )

    def test_frozen_cotangents_zero(self, problem):
        xp, pk, mean, var, bias = problem
        pko = pack_stem_kernel_outpack(pk)
        dk = jax.grad(
            lambda k: jnp.sum(stem_pool_outpack(xp, k, pko, mean, var, bias))
        )(pk)
        assert not np.asarray(dk).any()


class TestModelToggle:
    def test_model_env_toggle(self, rng, monkeypatch):
        """FLICKER_STEM_OUTPACK=1: logits, MaxPool3d_2a endpoint value and
        delta-gradient parity with the default prepacked-stem path."""
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

        base, ep_base = m.apply(variables, xp)
        gbase = np.asarray(jax.grad(loss)(xp))
        monkeypatch.setenv("FLICKER_STEM_OUTPACK", "1")
        v1 = init_i3d_params(jax.random.key(0), num_classes=7, frames=8, size=32)
        assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v1)
        fused, ep_fused = m.apply(variables, xp)
        gfused = np.asarray(jax.grad(loss)(xp))
        assert "Conv3d_1a_7x7" not in ep_fused  # never materialized
        np.testing.assert_allclose(
            np.asarray(ep_fused["MaxPool3d_2a_3x3"]),
            np.asarray(ep_base["MaxPool3d_2a_3x3"]),
            atol=1e-5,
        )
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=1e-5)
        scale = max(np.abs(gbase).max(), 1e-30)
        np.testing.assert_allclose(gfused / scale, gbase / scale, atol=1e-5)


class TestMeshParityOutpack:
    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_sharded_fused_step_matches_single_device(self, rng, monkeypatch):
        """The fused stem+pool path under the 8-device data mesh must produce
        the same delta trajectory as single-device (psum-over-ICI gradient of
        the custom VJP), on the real prepacked I3D at test scale."""
        monkeypatch.setenv("FLICKER_STEM_OUTPACK", "1")
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


class TestBF16:
    def test_bf16_matches_natural_bf16(self, rng):
        """The fused op in bfloat16 (the TPU compute dtype) against the
        natural bf16 chain — catches dtype bugs (-inf fills, tiled f32
        stats promotion) before chip time."""
        from flickering_adversarial_video_tpu.ops.space_to_depth import (
            _stem_bn_relu_math,
        )

        xp = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 8)) * 0.3, jnp.bfloat16)
        pk = jnp.asarray(rng.normal(size=(4, 4, 4, 8, 6)) * 0.2, jnp.bfloat16)
        mean = jnp.asarray(rng.normal(size=(6,)) * 0.1, jnp.float32)
        var = jnp.asarray(rng.uniform(0.5, 2.0, size=(6,)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(6,)) * 0.1, jnp.float32)
        pko = pack_stem_kernel_outpack(pk)

        got = stem_pool_outpack(xp, pk, pko, mean, var, bias)
        want = _ref_pool(_stem_bn_relu_math(xp, pk, mean, var, bias, 1e-3))
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(want, np.float32),
            atol=0.05, rtol=0.05,  # bf16 summation-order slack
        )
        g = jnp.asarray(rng.normal(size=got.shape), jnp.bfloat16)
        d = jax.grad(
            lambda q: jnp.sum(
                (stem_pool_outpack(q, pk, pko, mean, var, bias) * g).astype(jnp.float32)
            )
        )(xp)
        assert d.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(d, np.float32)).all()
