"""Exactness of the merged 1x1 branch conv in TmajorInceptionMixed
(FLICKER_MIXED_MERGE11): one channel-concatenated conv+BN+relu must equal
the three separate branch convs — values and the delta-path gradient —
on the same parameter tree (the merge declares params through the same
module names, so converted checkpoints are unaffected)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flickering_adversarial_video_tpu.models.i3d import TmajorInceptionMixed
from flickering_adversarial_video_tpu.ops.stem_tmajor import to_tmajor_view


CHANNELS = (16, 24, 32, 8, 16, 8)  # (c0, c1a, c1b, c2a, c2b, c3)


def _build(rng, b=2, t=4, h=8, w=8, cin=16, dtype=jnp.float32):
    x = rng.standard_normal((b, t, h, w, cin)).astype(np.float32)
    xv = to_tmajor_view(jnp.asarray(x)).astype(dtype)
    mod = TmajorInceptionMixed(CHANNELS, compute_dtype=dtype)
    variables = mod.init(jax.random.PRNGKey(3), xv, b)
    return mod, variables, xv


class TestMixedMerge11:
    def test_param_tree_identical(self, rng, monkeypatch):
        mod, v_off, xv = _build(rng)
        monkeypatch.setenv("FLICKER_MIXED_MERGE11", "1")
        v_on = TmajorInceptionMixed(CHANNELS).init(jax.random.PRNGKey(3), xv, 2)
        off_paths = jax.tree_util.tree_structure(v_off)
        on_paths = jax.tree_util.tree_structure(v_on)
        assert off_paths == on_paths
        for (pa, a), (pb, bb) in zip(
            jax.tree_util.tree_leaves_with_path(v_off),
            jax.tree_util.tree_leaves_with_path(v_on),
        ):
            assert pa == pb and a.shape == bb.shape

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_forward_matches(self, rng, monkeypatch, dtype):
        mod, variables, xv = _build(rng, dtype=dtype)
        y_off = mod.apply(variables, xv, 2)
        monkeypatch.setenv("FLICKER_MIXED_MERGE11", "1")
        y_on = mod.apply(variables, xv, 2)
        np.testing.assert_allclose(
            np.asarray(y_on, np.float32),
            np.asarray(y_off, np.float32),
            rtol=1e-5 if dtype == jnp.float32 else 2e-2,
            atol=1e-5 if dtype == jnp.float32 else 2e-2,
        )

    def test_input_grad_matches(self, rng, monkeypatch):
        mod, variables, xv = _build(rng)
        dy = jnp.asarray(
            rng.standard_normal(
                (8, 8, sum(CHANNELS[i] for i in (0, 2, 4, 5)), 8)
            ).astype(np.float32)
        )

        def loss(q):
            return jnp.sum(mod.apply(variables, q, 2) * dy)

        g_off = jax.grad(loss)(xv)
        monkeypatch.setenv("FLICKER_MIXED_MERGE11", "1")
        g_on = jax.grad(loss)(xv)
        np.testing.assert_allclose(
            np.asarray(g_on), np.asarray(g_off), rtol=1e-5, atol=1e-5
        )

    def test_integer_grid_bit_equal(self, rng, monkeypatch):
        """Small-integer inputs/params: the merged contraction sums the
        same Cin terms per output channel, so values are exact."""
        mod, variables, xv = _build(rng)
        irng = np.random.default_rng(5)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(irng.integers(-2, 3, a.shape), a.dtype),
            variables["params"],
        )
        # integer means/zero bias, var pinned at 1 so rsqrt(1+eps) is a
        # common exact factor on both paths
        stats = jax.tree_util.tree_map(
            jnp.ones_like, variables["batch_stats"]
        )
        variables = {"params": params, "batch_stats": stats}
        xv = jnp.asarray(
            np.random.default_rng(6).integers(-3, 4, xv.shape), xv.dtype
        )
        y_off = mod.apply(variables, xv, 2)
        monkeypatch.setenv("FLICKER_MIXED_MERGE11", "1")
        y_on = mod.apply(variables, xv, 2)
        np.testing.assert_allclose(
            np.asarray(y_on), np.asarray(y_off), rtol=0, atol=0
        )
