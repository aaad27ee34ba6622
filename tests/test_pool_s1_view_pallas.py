"""Exactness of the fused Pallas stride-1 (3,3,3) view pool
(ops/pool_s1_view_pallas.py) against the stem_tmajor chain — values and
first-match tie gradients BIT FOR BIT, in interpret mode on CPU.

The chain itself is pinned against reduce_window autodiff (and therefore
XLA's select-and-scatter tie rule) in tests/test_stem_tmajor.py; equality
with the chain is equality with the reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flickering_adversarial_video_tpu.ops.pool_s1_view_pallas import (
    _bwd_impl,
    _fwd_impl,
    _pick_blocks,
    eligible,
    s1_pool333_view_pallas,
)
from flickering_adversarial_video_tpu.ops.stem_tmajor import (
    _stride1_pool333_view_chain,
    to_tmajor_view,
)


def _tie_grid(rng, b, t, h, w, c, lo=0, hi=3):
    """Small-integer grids force massive tie populations — every routing
    decision is exercised."""
    x = rng.integers(lo, hi, size=(b, t, h, w, c)).astype(np.float32)
    return to_tmajor_view(jnp.asarray(x))


# geometries: divisor-edge H (hb=2 and hb=7/8 paths), multiple C tiles,
# plus the real Mixed_3b/4b shapes scaled down in N only
GEOMS = [
    (2, 4, 8, 8, 16),     # hb=8 whole-H block (single block: both edge masks)
    (2, 4, 14, 14, 32),   # hb=7
    (2, 8, 4, 6, 16),     # hb=4/2, wide T
    (4, 4, 28, 28, 16),   # real 3b H/W
]


class TestFusedViewPool:
    @pytest.mark.parametrize("geom", GEOMS)
    def test_forward_bit_equal(self, rng, geom):
        b, t, h, w, c = geom
        xv = _tie_grid(rng, b, t, h, w, c)
        got = _fwd_impl(xv, b, interpret=True)
        want = _stride1_pool333_view_chain(xv, b)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.parametrize("geom", GEOMS)
    def test_backward_bit_equal(self, rng, geom):
        b, t, h, w, c = geom
        xv = _tie_grid(rng, b, t, h, w, c)
        dy = jnp.asarray(
            rng.integers(-8, 9, size=xv.shape).astype(np.float32)
        )
        got = _bwd_impl(xv, dy, b, interpret=True)
        want = jax.grad(
            lambda q: jnp.sum(_stride1_pool333_view_chain(q, b) * dy)
        )(xv)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_custom_vjp_roundtrip(self, rng):
        """grad through the public op (interpret) == grad through the chain,
        including the chain-forward + Pallas-backward hybrid default."""
        b, t, h, w, c = 2, 4, 8, 8, 16
        xv = _tie_grid(rng, b, t, h, w, c)
        dy = jnp.asarray(rng.integers(-8, 9, size=xv.shape).astype(np.float32))

        got_y = s1_pool333_view_pallas(xv, b, True)
        want_y = _stride1_pool333_view_chain(xv, b)
        np.testing.assert_array_equal(np.asarray(got_y), np.asarray(want_y))

        dgot = jax.grad(
            lambda q: jnp.sum(s1_pool333_view_pallas(q, b, True) * dy)
        )(xv)
        dwant = jax.grad(
            lambda q: jnp.sum(_stride1_pool333_view_chain(q, b) * dy)
        )(xv)
        np.testing.assert_array_equal(np.asarray(dgot), np.asarray(dwant))

    def test_bfloat16_accumulation_rounds_identically(self, rng):
        """The routing adds stay in the cotangent dtype (bf16) so the
        up-to-3-way accumulations round exactly as the chain's."""
        b, t, h, w, c = 2, 4, 8, 8, 16
        xv = _tie_grid(rng, b, t, h, w, c).astype(jnp.bfloat16)
        dy = jnp.asarray(
            rng.integers(-8, 9, size=xv.shape).astype(np.float32)
        ).astype(jnp.bfloat16)
        got = _bwd_impl(xv, dy, b, interpret=True)
        assert got.dtype == jnp.bfloat16
        want = jax.grad(
            lambda q: jnp.sum(
                (_stride1_pool333_view_chain(q, b) * dy).astype(jnp.float32)
            )
        )(xv)
        np.testing.assert_array_equal(
            np.asarray(got.astype(jnp.float32)),
            np.asarray(want.astype(jnp.float32)),
        )
        yg = _fwd_impl(xv, b, interpret=True)
        yw = _stride1_pool333_view_chain(xv, b)
        np.testing.assert_array_equal(
            np.asarray(yg.astype(jnp.float32)),
            np.asarray(yw.astype(jnp.float32)),
        )

    def test_eligibility_gate(self):
        # real Mixed geometries at the headline T=64 B=8
        assert eligible((28, 28, 192, 256), 8)
        assert eligible((28, 28, 256, 256), 8)
        assert eligible((14, 14, 480, 128), 8)
        assert eligible((14, 14, 528, 128), 8)
        # Mixed_5b/5c: T'B = 64 lanes — excluded
        assert not eligible((7, 7, 832, 64), 8)
        # lane count not a multiple of B
        assert not eligible((28, 28, 192, 256), 3)
        # channel not sublane-aligned
        assert not eligible((28, 28, 100, 256), 8)

    def test_block_picker_covers_real_geometries(self):
        for h, w, c, n in [
            (28, 28, 192, 256),
            (28, 28, 256, 256),
            (14, 14, 480, 128),
            (14, 14, 512, 128),
            (14, 14, 528, 128),
        ]:
            hb, ct = _pick_blocks(h, w, c, n, 2)
            assert h % hb == 0 and c % ct == 0 and ct % 16 == 0
            # padded block stays under the (env-tunable) VMEM budget
            assert (hb + 4) * w * ct * n * 2 <= 8 * 2**20

    def test_off_gate_is_inert_on_cpu(self, rng, monkeypatch):
        """On CPU the dispatcher must keep the chain even with the env gate
        forced on (the kernels are TPU-only outside interpret mode)."""
        monkeypatch.setenv("FLICKER_S1V_PALLAS", "1")
        from flickering_adversarial_video_tpu.ops.stem_tmajor import (
            stride1_pool333_view,
        )

        b, t, h, w, c = 2, 4, 8, 8, 16
        xv = _tie_grid(rng, b, t, h, w, c)
        got = stride1_pool333_view(xv, b)
        want = _stride1_pool333_view_chain(xv, b)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
