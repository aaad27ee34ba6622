"""Observability plumbing: TensorBoard tag parity, JSONL fallback, timers,
system introspection (SURVEY.md sections 5.1/5.5).

The reference publishes scalars under exact tag names
(i3d_adversarial_main_universal.py:176-201); runners construct ScalarWriter
in every e2e test but nothing previously asserted the tags themselves.  Here
the written event files are read back with TF's summary_iterator (TF is
already the repo's numerical oracle) and the tag set is pinned.
"""

import json
import os
import sys
import types

import numpy as np
import pytest

from flickering_adversarial_video_tpu.utils.profiling import Timer, trace_steps
from flickering_adversarial_video_tpu.utils.system import (
    db_num_workers,
    num_devices,
    system_info,
)
from flickering_adversarial_video_tpu.viz.tensorboard import ScalarWriter

# The full scalar set of i3d_adversarial_main_universal.py:176-193.  The '%'
# in the thickness/roughness tags is sanitized to '_' by every TensorBoard
# writer backend (TF1 did the same to the reference's own 'thickness_%%'); the
# JSONL fallback stores the canonical tag verbatim.
REFERENCE_TAGS = {
    "Loss/total",
    "Loss/adversarial_loss",
    "Loss/regularizer_loss",
    "Loss/regularizer_loss_weighted",
    "Loss/thickness",
    "Loss/L12",
    "Loss/first_order_temporal_diff",
    "Loss/second_order_temporal_diff",
    "Perturbation/thickness_%",
    "Perturbation/roughness_%",
    "Perturbation/max",
    "Perturbation/min",
    "Probability/prob_to_min",
    "Probability/prob_to_max",
}

METRICS = {
    "total_loss": 1.5,
    "adv_loss": 1.0,
    "reg_loss": 0.5,
    "weighted_reg": 0.25,
    "l12": 0.4,
    "norm_reg": 0.25,
    "diff_norm_reg": 0.125,
    "laplacian_norm_reg": 0.0625,
    "thickness": 0.02,
    "roughness": 0.01,
    "delta_max": 0.3,
    "delta_min": -0.2,
    "prob_to_min": 0.7,
    "prob_to_max": 0.2,
}


class TestScalarWriter:
    def test_reference_tag_parity(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        log_dir = str(tmp_path / "tb")
        w = ScalarWriter(log_dir)
        if w._impl is None:  # pragma: no cover - no TB backend in env
            pytest.skip("no SummaryWriter backend available")
        w.attack_step_scalars(METRICS, step=3)
        w.close()
        events = []
        for root, _, files in os.walk(log_dir):
            for f in files:
                if "tfevents" in f:
                    for e in tf.compat.v1.train.summary_iterator(
                        os.path.join(root, f)
                    ):
                        for v in e.summary.value:
                            events.append((v.tag, e.step))
        tags = {t for t, _ in events}
        expected = {t.replace("%", "_") for t in REFERENCE_TAGS}
        assert tags == expected, tags ^ expected
        assert all(s == 3 for _, s in events)

    def test_thickness_percent_scaling(self, tmp_path, monkeypatch):
        # force the JSONL fallback (both TB imports fail) and pin the /2*100
        # percent conversion (kinetics_i3d_utils.py:194-200 metric scale)
        monkeypatch.setitem(
            sys.modules, "tensorboardX", types.ModuleType("tensorboardX")
        )
        monkeypatch.setitem(
            sys.modules,
            "torch.utils.tensorboard",
            types.ModuleType("torch.utils.tensorboard"),
        )
        log_dir = str(tmp_path / "jl")
        w = ScalarWriter(log_dir)
        assert w._impl is None and w._jsonl is not None
        w.attack_step_scalars(METRICS, step=7)
        w.close()
        rows = [
            json.loads(line)
            for line in open(os.path.join(log_dir, "scalars.jsonl"))
        ]
        by_tag = {r["tag"]: r for r in rows}
        assert set(by_tag) == REFERENCE_TAGS
        assert by_tag["Perturbation/thickness_%"]["value"] == pytest.approx(1.0)
        assert by_tag["Perturbation/roughness_%"]["value"] == pytest.approx(0.5)
        assert all(r["step"] == 7 for r in rows)

    def test_probability_tags_optional(self, tmp_path, monkeypatch):
        monkeypatch.setitem(
            sys.modules, "tensorboardX", types.ModuleType("tensorboardX")
        )
        monkeypatch.setitem(
            sys.modules,
            "torch.utils.tensorboard",
            types.ModuleType("torch.utils.tensorboard"),
        )
        w = ScalarWriter(str(tmp_path / "jl2"))
        m = {k: v for k, v in METRICS.items() if not k.startswith("prob_")}
        w.attack_step_scalars(m, step=0)
        w.close()
        rows = [
            json.loads(line)
            for line in open(os.path.join(str(tmp_path / "jl2"), "scalars.jsonl"))
        ]
        assert {r["tag"] for r in rows} == REFERENCE_TAGS - {
            "Probability/prob_to_min",
            "Probability/prob_to_max",
        }


class TestProfiling:
    def test_timer_accumulates_sections(self):
        t = Timer()
        with t.section("a"):
            pass
        with t.section("a"):
            pass
        with t.section("b"):
            pass
        assert set(t.sections) == {"a", "b"}
        assert t.sections["a"] >= 0.0

    def test_trace_steps_writes_profile(self, tmp_path):
        import jax
        import jax.numpy as jnp

        log_dir = str(tmp_path / "trace")
        with trace_steps(log_dir):
            jnp.square(jnp.arange(16.0)).block_until_ready()
        found = []
        for root, _, files in os.walk(log_dir):
            found.extend(files)
        assert found, "jax.profiler trace produced no files"


class TestSystem:
    def test_num_devices_virtual_mesh(self):
        assert num_devices() == 8  # conftest pins 8 virtual CPU devices

    def test_db_num_workers_capped_by_cpu(self):
        assert 1 <= db_num_workers() <= max(os.cpu_count() or 1, 16)
        assert db_num_workers(non_windows=2) <= 2

    def test_system_info_keys(self):
        info = system_info()
        for key in (
            "python",
            "platform",
            "jax",
            "backend",
            "devices",
            "process_index",
            "process_count",
            "cpu_count",
        ):
            assert key in info
        assert info["backend"] == "cpu"
        assert len(info["devices"]) == 8
