"""Exactness of the one-pass Pallas routing backward for the STRIDED
(3,3)/(2,2) SAME view pool (ops/pool_s2_view_pallas.py) against the
select-and-scatter reference (reduce_window autodiff over
stem_tmajor._pool_view_ref_fwd), in interpret mode on CPU.

Contract (module docstring): integer grids bit-equal (every tie decision and
every multi-window accumulation is exact); float grads to reassociation
(an input cell selected by up to four windows accumulates H-then-W here vs
window-scan order in select-and-scatter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flickering_adversarial_video_tpu.ops.pool_s2_view_pallas import (
    _pick_blocks,
    eligible,
    s2_pool_view_bwd_pallas,
)
from flickering_adversarial_video_tpu.ops.stem_tmajor import (
    _pool_view_ref_fwd,
)


def _ref_bwd(xv, dy):
    _, pullback = jax.vjp(_pool_view_ref_fwd, xv)
    return pullback(dy)[0]


def _tie_grid(rng, h, w, c, n, lo=0, hi=3):
    """Small-integer grids force massive tie populations — every first-match
    branch and every multi-window accumulation is exercised exactly."""
    return jnp.asarray(rng.integers(lo, hi, size=(h, w, c, n)).astype(np.float32))


# geometries: the real strided view pools at the headline T=64 B=8 scaled
# down in N, plus divisor-edge blocks (hb=1 whole-pool and multi-block H)
GEOMS = [
    (8, 8, 16, 128),      # hb covers ho in one block: both edge masks live
    (16, 16, 32, 128),    # multi-block H, 2 channel tiles
    (28, 28, 16, 128),    # pool4a spatial H/W (ho=14 -> hb=7)
    (12, 8, 16, 128),     # H != W
]


class TestS2ViewRoutingBwd:
    @pytest.mark.parametrize("geom", GEOMS)
    def test_integer_ties_bit_equal(self, rng, geom):
        h, w, c, n = geom
        xv = _tie_grid(rng, h, w, c, n)
        dy = jnp.asarray(
            rng.integers(-8, 9, size=(h // 2, w // 2, c, n)).astype(np.float32)
        )
        got = s2_pool_view_bwd_pallas(xv, dy, interpret=True)
        want = _ref_bwd(xv, dy)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.parametrize("geom", GEOMS[:2])
    def test_float_grads_close(self, rng, geom):
        h, w, c, n = geom
        xv = jnp.asarray(rng.standard_normal((h, w, c, n)).astype(np.float32))
        dy = jnp.asarray(
            rng.standard_normal((h // 2, w // 2, c, n)).astype(np.float32)
        )
        got = s2_pool_view_bwd_pallas(xv, dy, interpret=True)
        want = _ref_bwd(xv, dy)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
        )

    def test_bfloat16_io(self, rng):
        """bf16 operands: values compared exactly on an integer grid (small
        ints are exact in bf16; sums stay in the cotangent dtype)."""
        h, w, c, n = 8, 8, 16, 128
        xv = _tie_grid(rng, h, w, c, n).astype(jnp.bfloat16)
        dy = jnp.asarray(
            rng.integers(-4, 5, size=(h // 2, w // 2, c, n)).astype(np.float32)
        ).astype(jnp.bfloat16)
        got = s2_pool_view_bwd_pallas(xv, dy, interpret=True)
        assert got.dtype == jnp.bfloat16
        want = _ref_bwd(xv.astype(jnp.float32), dy.astype(jnp.float32))
        np.testing.assert_array_equal(
            np.asarray(got.astype(jnp.float32)), np.asarray(want)
        )

    def test_eligibility_gate(self):
        # the real strided view pools at T=64 B=8 (T''B=128 after pool4a).
        # At the default 4 MB block budget (the round-5 measured best, see
        # _pick_blocks) the pool2a geometry no longer fits a block and
        # falls back to select-and-scatter — by measurement the kernel's
        # loss was concentrated exactly there; the old 8 MB budget restores
        # it for re-A/B.
        assert not eligible((112, 112, 64, 256))
        import os
        from unittest import mock

        with mock.patch.dict(os.environ, {"FLICKER_S2V_BLOCK_MB": "8"}):
            assert eligible((112, 112, 64, 256))
        assert eligible((56, 56, 192, 256))
        assert eligible((28, 28, 480, 128))
        # odd spatial extents (no strided view pool has them) are excluded
        assert not eligible((7, 7, 832, 64))
        assert not eligible((113, 112, 64, 256))
        # lane / sublane misalignment
        assert not eligible((112, 112, 64, 100))
        assert not eligible((112, 112, 100, 256))

    def test_block_picker_covers_real_geometries(self):
        import os
        from unittest import mock

        # pool2a needs the 8 MB budget (see test_eligibility_gate); the
        # smaller view-pool shapes fit the 4 MB default
        with mock.patch.dict(os.environ, {"FLICKER_S2V_BLOCK_MB": "8"}):
            for h, w, c, n in [
                (112, 112, 64, 256),
                (56, 56, 192, 256),
                (28, 28, 480, 128),
            ]:
                hb, ct = _pick_blocks(h, w, c, n, 2)
                assert (h // 2) % hb == 0 and c % ct == 0 and ct % 16 == 0
                assert (2 * hb + 3) * w * ct * n * 2 <= 8 * 2**20
        for h, w, c, n in [(56, 56, 192, 256), (28, 28, 480, 128)]:
            hb, ct = _pick_blocks(h, w, c, n, 2)
            assert (2 * hb + 3) * w * ct * n * 2 <= 4 * 2**20

    def test_off_gate_is_inert_on_cpu(self, rng, monkeypatch):
        """On CPU the VJP must keep the select-and-scatter reference even
        with the env gate forced on (the kernel is TPU-only outside
        interpret mode)."""
        monkeypatch.setenv("FLICKER_S2V_PALLAS", "1")
        from flickering_adversarial_video_tpu.ops.stem_tmajor import (
            strided_pool_view,
        )

        h, w, c, n = 8, 8, 16, 128
        xv = _tie_grid(rng, h, w, c, n)
        dy = jnp.asarray(
            rng.integers(-8, 9, size=(h // 2, w // 2, c, n)).astype(np.float32)
        )
        got = jax.grad(
            lambda q: jnp.sum(strided_pool_view(q) * dy)
        )(xv)
        want = _ref_bwd(xv, dy)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
