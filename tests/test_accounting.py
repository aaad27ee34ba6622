"""Custom-call FLOP/byte accounting (ops/accounting.py).

bench.py's published flops_per_step / hbm_bytes_per_step add a trace-time
tally of every Pallas kernel's analytic cost (XLA's cost model reports
nothing for custom calls).  These tests pin the mechanism and the formulas
on CPU: `jax.eval_shape` traces the kernel wrappers without executing them,
so the `record()` calls fire exactly as they do under bench.py's
`.lower()` on the chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flickering_adversarial_video_tpu.ops import accounting


class TestTally:
    def test_record_outside_context_is_noop(self):
        accounting.record("x", flops=1.0, hbm_bytes=2.0)  # must not raise

    def test_nested_recording(self):
        with accounting.recording() as outer:
            accounting.record("a", flops=1.0, hbm_bytes=10.0)
            with accounting.recording() as inner:
                accounting.record("b", flops=2.0, hbm_bytes=20.0)
            accounting.record("c", flops=4.0, hbm_bytes=40.0)
        assert outer.flops == 7.0 and outer.hbm_bytes == 70.0
        assert inner.flops == 2.0 and inner.hbm_bytes == 20.0
        assert [c[0] for c in outer.calls] == ["a", "b", "c"]


class TestStemKernelAccounting:
    def test_stem_im2col_records_flops_and_bytes(self):
        from flickering_adversarial_video_tpu.ops.stem_conv_pallas import (
            _pick_hb,
            stem_conv_bn_relu_view_pallas,
        )

        h = w = 16
        cin, cout, b = 24, 64, 8
        n = 256  # T'B lanes
        xv = jax.ShapeDtypeStruct((h, w, cin, n), jnp.bfloat16)
        pk = jax.ShapeDtypeStruct((4, 4, 4, cin, cout), jnp.float32)
        vec = jax.ShapeDtypeStruct((cout,), jnp.float32)

        with accounting.recording() as tally:
            jax.eval_shape(
                lambda x, k, m, v, bias: stem_conv_bn_relu_view_pallas(
                    x, k, m, v, bias, b
                ),
                xv, pk, vec, vec, vec,
            )
        assert [c[0] for c in tally.calls] == ["stem_im2col_fwd"]
        assert tally.flops == 2.0 * h * w * n * (16 * cin) * (4 * cout)
        hb = _pick_hb(h)
        expect = (
            (h // hb) * (hb + 3) * w * cin * n * 2
            + h * w * cout * n * 2
            + 4 * cout * 16 * cin * 2
            + 3 * cout * 4
        )
        assert tally.hbm_bytes == expect

    def test_interpret_mode_records_nothing(self):
        from flickering_adversarial_video_tpu.ops.stem_conv_pallas import (
            stem_conv_bn_relu_view_pallas,
        )

        h = w = 16
        cin, cout, b, n = 24, 64, 8, 256
        xv = jax.ShapeDtypeStruct((h, w, cin, n), jnp.bfloat16)
        pk = jax.ShapeDtypeStruct((4, 4, 4, cin, cout), jnp.float32)
        vec = jax.ShapeDtypeStruct((cout,), jnp.float32)
        with accounting.recording() as tally:
            jax.eval_shape(
                lambda x, k, m, v, bias: stem_conv_bn_relu_view_pallas(
                    x, k, m, v, bias, b, interpret=True
                ),
                xv, pk, vec, vec, vec,
            )
        assert tally.calls == []


class TestS1VAccounting:
    def test_fwd_and_bwd_bytes(self):
        from flickering_adversarial_video_tpu.ops.pool_s1_view_pallas import (
            _bwd_impl,
            _fwd_impl,
            _pick_blocks,
        )

        h = w = 28
        c, n, b = 192, 256, 8
        xv = jax.ShapeDtypeStruct((h, w, c, n), jnp.bfloat16)
        hb, _ct = _pick_blocks(h, w, c, n, 2)

        with accounting.recording() as tally:
            jax.eval_shape(lambda x: _fwd_impl(x, b, False), xv)
        assert tally.hbm_bytes == (
            (h // hb) * (hb + 2) * w * c * n * 2 + h * w * c * n * 2
        )

        with accounting.recording() as tally:
            jax.eval_shape(lambda x, g: _bwd_impl(x, g, b, False), xv, xv)
        assert tally.hbm_bytes == (
            (h // hb) * (hb + 4) * w * c * n * 2
            + (h // hb) * (hb + 2) * w * c * n * 2
            + h * w * c * n * 2
        )


class TestBenchIntegration:
    def test_step_cost_analysis_adds_tally(self, monkeypatch):
        """bench.step_cost_analysis must fold the trace-time tally into the
        cost-model numbers.  Uses a stub engine whose lower() records."""
        import bench

        class StubCompiled:
            def cost_analysis(self):
                return {"flops": 100.0, "bytes accessed": 1000.0}

        class StubLowered:
            def compile(self):
                return StubCompiled()

        class StubJit:
            def lower(self, *a, **k):
                accounting.record("stub_kernel", flops=7.0, hbm_bytes=13.0)
                return StubLowered()

        class StubEngine:
            _train_step = StubJit()

            def init_state(self):
                return None

        flops, bytes_accessed = bench.step_cost_analysis(
            StubEngine(), {"labels": np.zeros((1,), np.int64)}
        )
        assert flops == 107.0
        assert bytes_accessed == 1013.0
