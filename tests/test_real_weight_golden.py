"""Recorded-logits goldens against REAL victim weights (convert/golden.py).

These tests are inert until an egress-capable environment has run:

    sh scripts/download_assets.sh          # fetch DeepMind I3D + torchvision
    sh scripts/real_weight_parity.sh       # convert + dump goldens

which leaves `data/golden/<model>.npz` (+ the converted .msgpack weights
alongside).  From then on, every test run recomputes the canonical-clip
logits from the converted weights and compares them to the recorded values,
pinning converter + model numerics against the real checkpoints forever
(VERDICT round 1, item 2).

Also contains a self-contained round-trip check (random weights) so the
dump/verify machinery itself is exercised in every environment.
"""

import glob
import os

import numpy as np
import pytest

import jax

from flickering_adversarial_video_tpu.convert.cli import save_variables
from flickering_adversarial_video_tpu.convert.golden import (
    GOLDEN_GEOMETRY,
    canonical_clip,
    dump_golden,
    verify_golden,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.environ.get("FLICKER_GOLDEN_DIR", os.path.join(REPO, "data", "golden"))
GOLDEN_FILES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.npz")))


class TestGoldenMachinery:
    def test_canonical_clip_deterministic(self):
        a = canonical_clip("tanh", 4, 8)
        b = canonical_clip("tanh", 4, 8)
        np.testing.assert_array_equal(a, b)
        assert a.min() >= -1.0 and a.max() <= 1.0
        c = canonical_clip("meanstd", 4, 8)
        assert c.shape == (1, 4, 8, 8, 3)

    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_dump_then_verify_roundtrip(self, tmp_path, monkeypatch):
        # random "real" weights: dump a golden, then verify it end-to-end
        from flickering_adversarial_video_tpu.models.i3d import init_i3d_params

        monkeypatch.setitem(GOLDEN_GEOMETRY, "tanh", (4, 16))  # keep CPU-fast
        variables = init_i3d_params(
            jax.random.key(5), num_classes=9, frames=4, size=16
        )
        weights = tmp_path / "fake_i3d.msgpack"
        save_variables(variables, str(weights))
        npz = tmp_path / "fake_i3d.npz"
        payload = dump_golden("i3d", variables, str(npz), str(weights), num_classes=9)
        assert payload["logits"].shape == (1, 9)
        report = verify_golden(str(npz))
        assert report["max_abs_diff"] < 5e-3
        assert report["top5_recorded"] == report["top5_recomputed"]

    def test_verify_detects_drift(self, tmp_path, monkeypatch):
        from flickering_adversarial_video_tpu.models.i3d import init_i3d_params

        monkeypatch.setitem(GOLDEN_GEOMETRY, "tanh", (4, 16))
        variables = init_i3d_params(
            jax.random.key(5), num_classes=9, frames=4, size=16
        )
        weights = tmp_path / "w.msgpack"
        save_variables(variables, str(weights))
        npz = tmp_path / "g.npz"
        dump_golden("i3d", variables, str(npz), str(weights), num_classes=9)
        # corrupt the recorded logits -> verify must fail
        z = dict(np.load(str(npz), allow_pickle=False))
        z["logits"] = z["logits"] + 1.0
        np.savez_compressed(str(npz), **z)
        with pytest.raises(AssertionError):
            verify_golden(str(npz))


@pytest.mark.skipif(
    not GOLDEN_FILES,
    reason=f"no real-weight goldens under {GOLDEN_DIR} "
    "(run scripts/real_weight_parity.sh where egress exists)",
)
class TestRealWeightGoldens:
    @pytest.mark.parametrize("npz", GOLDEN_FILES, ids=[os.path.basename(f) for f in GOLDEN_FILES])
    def test_golden(self, npz):
        report = verify_golden(npz)
        assert report["top5_recorded"] == report["top5_recomputed"], report
