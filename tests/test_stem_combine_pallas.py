"""One-pass catbwd lane-combine kernel (ops/stem_combine_pallas.py).

Bit-equality with the XLA pad/slice/add chain it replaces: same ascending-m
add association in the same dtype, lane shifts exact (f32 roll embeds bf16
exactly), zero fill past the temporal edge.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flickering_adversarial_video_tpu.ops.stem_combine_pallas import (
    catbwd_lane_combine_pallas,
    eligible,
)


def chain_reference(part, b, cin, t_plo):
    """The XLA spelling from stem_tmajor._catbwd_lane_combine."""
    from flickering_adversarial_video_tpu.ops.stem_tmajor import _lane_shift

    n_taps = part.shape[2] // cin
    acc = None
    for m in range(n_taps):
        blk = jax.lax.slice_in_dim(part, m * cin, (m + 1) * cin, axis=2)
        sl = _lane_shift(blk, (t_plo - m) * b, 0)
        acc = sl if acc is None else acc + sl
    return acc


class TestCombineKernel:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    @pytest.mark.parametrize("t_plo", [1])
    def test_bit_equal_with_chain(self, dtype, t_plo):
        rng = np.random.default_rng(0)
        h, w, cin, n_taps, b = 8, 6, 8, 4, 8
        n = 256
        part = jnp.asarray(
            rng.standard_normal((h, w, n_taps * cin, n)), dtype
        )
        ref = np.asarray(chain_reference(part, b, cin, t_plo))
        got = np.asarray(
            catbwd_lane_combine_pallas(part, b, cin, t_plo, interpret=True)
        )
        np.testing.assert_array_equal(ref, got)

    def test_edge_lanes_zero_filled(self):
        # all-ones input: edge lanes of shifted taps must drop out exactly
        h, w, cin, b, n = 4, 4, 8, 8, 128
        part = jnp.ones((h, w, 4 * cin, n), jnp.float32)
        ref = np.asarray(chain_reference(part, b, cin, 1))
        got = np.asarray(
            catbwd_lane_combine_pallas(part, b, cin, 1, interpret=True)
        )
        np.testing.assert_array_equal(ref, got)
        # interior lanes sum all 4 taps; the outermost B lanes fewer
        assert got[0, 0, 0, n // 2] == 4.0
        assert got[0, 0, 0, 0] < 4.0

    def test_eligibility_gate(self):
        assert eligible((8, 8, 96, 256), 24, 8)
        assert not eligible((8, 8, 96, 250), 24, 8)  # lanes not 128-aligned
        assert not eligible((8, 8, 100, 256), 24, 8)  # not a tap multiple
        assert not eligible((8, 8, 96), 24, 8)

    def test_records_accounting(self):
        from flickering_adversarial_video_tpu.ops import accounting

        part = jax.ShapeDtypeStruct((8, 6, 32, 256), jnp.bfloat16)
        with accounting.recording() as tally:
            jax.eval_shape(
                lambda p: catbwd_lane_combine_pallas(p, 8, 8, 1), part
            )
        assert tally.hbm_bytes == 8 * 6 * 32 * 256 * 2 + 8 * 6 * 8 * 256 * 2
