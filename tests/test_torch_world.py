"""Torch-world (mean/std) stack tests: clip sampling, per-video sweep with
escalation + ledger, epoch fit schema + resume."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flickering_adversarial_video_tpu.attack import TorchStyleFlickerSpec
from flickering_adversarial_video_tpu.data.video_dataset import (
    DEFAULT_MEAN,
    DEFAULT_STD,
    VideoDataset,
    VideoRecord,
    sample_clip_indices,
)
from flickering_adversarial_video_tpu.engine import (
    AttackConfig,
    AttackEngine,
    RuntimeFlags,
)
from flickering_adversarial_video_tpu.engine.epoch_fit import (
    find_resume,
    fit_universal_epochs,
    step_lr,
)
from flickering_adversarial_video_tpu.engine.sweep import (
    fit_many_videos,
    fit_single_video,
    result_path_for,
    should_skip,
)

FRAMES, SIZE = 4, 8


def meanstd_victim():
    w = jax.random.normal(jax.random.key(11), (3, 40)) * 3.0

    def apply_fn(variables, x):
        return jnp.mean(x, axis=(1, 2, 3)) @ variables["w"]

    return apply_fn, {"w": w}


def make_engine(track_probs=False):
    apply_fn, variables = meanstd_victim()
    spec = TorchStyleFlickerSpec(frames=FRAMES, max_norm=0.2)
    cfg = AttackConfig(norm_world="meanstd", reg_weighting="torch")
    return AttackEngine(apply_fn, variables, spec, cfg, track_probs=track_probs)


def self_labeled_batch(rng, engine, b=1):
    video = rng.integers(0, 255, (b, FRAMES, SIZE, SIZE, 3), dtype=np.uint8)
    probs = engine.forward(
        engine.init_state(jax.random.key(0)).delta,
        {"video": jnp.asarray(video), "labels": jnp.zeros((b,), jnp.int64)},
        RuntimeFlags(max_norm=0.2),
        jax.random.key(0),
        adversarial=False,
    )
    labels = np.asarray(jnp.argmax(probs, -1))
    return {"video": video, "labels": labels, "paths": [f"v{i}.mp4" for i in range(b)]}


class TestClipSampling:
    def test_uniform_center(self):
        idx = sample_clip_indices(10, 4, random_offset=False)
        np.testing.assert_array_equal(idx, [3, 4, 5, 6])

    def test_random_within_bounds(self, rng):
        g = np.random.default_rng(3)
        for _ in range(10):
            idx = sample_clip_indices(10, 4, random_offset=True, rng=g)
            assert idx.min() >= 0 and idx.max() < 10
            np.testing.assert_array_equal(np.diff(idx), 1)

    def test_pad_by_repeat(self):
        idx = sample_clip_indices(3, 8, random_offset=False)
        np.testing.assert_array_equal(idx, [0, 1, 2, 0, 1, 2, 0, 1])

    def test_dataset_batches_with_fake_decoder(self, rng, monkeypatch):
        records = [VideoRecord(f"v{i}.mp4", i % 3) for i in range(5)]
        ds = VideoDataset(
            records, sample_length=FRAMES, input_size=SIZE, im_scale=SIZE + 2
        )
        fake = {
            r.path: rng.integers(0, 255, (6, 20, 30, 3), dtype=np.uint8)
            for r in records
        }
        monkeypatch.setattr(ds, "_decode", lambda path: fake[path])
        batches = list(ds.batches(2))
        assert len(batches) == 2
        assert batches[0]["video"].shape == (2, FRAMES, SIZE, SIZE, 3)
        assert batches[0]["video"].dtype == np.uint8


class TestPerVideoSweep:
    def test_single_video_fools(self, rng):
        engine = make_engine()
        batch = self_labeled_batch(rng, engine)
        res = fit_single_video(
            engine, batch, RuntimeFlags(max_norm=0.2), n_iter=150, max_norm=0.2
        )
        assert res is not None
        assert np.asarray(res["is_adversarial"]).any()
        for k in (
            "loss/total", "loss/adv_loss", "loss/reg_loss",
            "perturbation/thickness", "perturbation/roughness",
            "perturbation/inf_norm", "perturbation", "prob_clean_input",
            "label", "is_adversarial",
        ):
            assert k in res, k
        assert res["perturbation/inf_norm"] <= res["final_max_norm"] + 1e-6

    def test_misclassified_returns_none(self, rng):
        engine = make_engine()
        batch = self_labeled_batch(rng, engine)
        batch["labels"] = (batch["labels"] + 1) % 40
        res = fit_single_video(engine, batch, RuntimeFlags(max_norm=0.2), n_iter=10)
        assert res is None

    def test_escalation_caps_at_four_chances(self, rng):
        """A victim that can never be fooled must stop after 4 escalations
        with max_norm * 1.3^4."""
        w = jnp.zeros((3, 40)).at[:, 0].set(100.0)  # always predicts class 0

        def apply_fn(variables, x):
            return jnp.mean(x, axis=(1, 2, 3)) @ variables["w"]

        spec = TorchStyleFlickerSpec(frames=FRAMES, max_norm=0.05)
        engine = AttackEngine(
            apply_fn, {"w": w}, spec, AttackConfig(norm_world="meanstd", reg_weighting="torch")
        )
        video = rng.integers(0, 255, (1, FRAMES, SIZE, SIZE, 3), dtype=np.uint8)
        batch = {"video": video, "labels": np.asarray([0])}
        res = fit_single_video(
            engine, batch, RuntimeFlags(max_norm=0.05), n_iter=5, max_norm=0.05
        )
        assert res is not None
        assert res["escalations"] == 4
        np.testing.assert_allclose(res["final_max_norm"], 0.05 * 1.3**4, rtol=1e-6)
        assert not np.asarray(res["is_adversarial"]).any()

    def test_ledger_skip(self, rng, tmp_path):
        engine = make_engine()
        labels = [f"class {i}" for i in range(40)]
        batch = self_labeled_batch(rng, engine)
        model_dir = str(tmp_path)

        out1 = fit_many_videos(
            engine, [batch], RuntimeFlags(max_norm=0.2), model_dir=model_dir,
            label_names=labels, n_iter=150, max_norm=0.2,
        )
        assert out1["attacked"] == 1
        dest = result_path_for(model_dir, "v0.mp4", labels[int(batch["labels"][0])])
        assert os.path.exists(dest)
        assert should_skip(dest)

        out2 = fit_many_videos(
            engine, [batch], RuntimeFlags(max_norm=0.2), model_dir=model_dir,
            label_names=labels, n_iter=150, max_norm=0.2,
        )
        assert out2["skipped_existing"] == 1 and out2["attacked"] == 0


class TestEpochFit:
    def test_train_eval_step_counts_match_separate(self, rng):
        import jax.numpy as jnp
        engine = make_engine(track_probs=True)
        batch = self_labeled_batch(rng, engine, b=2)
        sharded = {k: jnp.asarray(v) for k, v in batch.items() if k != "paths"}
        flags = RuntimeFlags(max_norm=0.2)
        key = jax.random.key(0)
        s1 = engine.init_state(jax.random.key(1))
        s1b, m = engine.train_eval_step(s1, sharded, flags, key)
        assert int(m["valid"]) == 2  # self-labeled batch: all valid
        assert 0 <= int(m["miss"]) <= 2
        # the fused step's update must equal the plain step's
        s2 = engine.init_state(jax.random.key(1))
        s2b, _ = engine.train_step(s2, sharded, flags, key)
        np.testing.assert_allclose(np.asarray(s1b.delta), np.asarray(s2b.delta), atol=1e-6)

    def test_schema_and_resume(self, rng, tmp_path):
        engine = make_engine()
        batch = self_labeled_batch(rng, engine, b=2)
        model_dir = str(tmp_path)
        results = fit_universal_epochs(
            engine,
            lambda: iter([batch]),
            lambda: iter([batch]),
            RuntimeFlags(max_norm=0.2),
            epochs=2,
            lr=1e-2,
            model_dir=model_dir,
            model_name="r2plus1d_18",
        )
        assert len(results) == 2
        for k in (
            "train/time", "train/loss", "train/fooling_ratio",
            "train/pert_thickness", "train/pert_roughness", "train/inf_norm",
            "train/perturbation", "valid/fooling_ratio", "valid/perturbation",
        ):
            assert k in results[0], k
        assert os.path.exists(os.path.join(model_dir, "r2plus1d_18_002.npy"))

        delta, epoch = find_resume(model_dir, "r2plus1d_18")
        assert epoch == 2
        np.testing.assert_array_equal(delta, results[-1]["valid/perturbation"])

    def test_step_lr(self):
        assert step_lr(1e-3, 1, 10) == 1e-3
        assert step_lr(1e-3, 11, 10) == pytest.approx(1e-4)
        assert step_lr(1e-3, 21, 10) == pytest.approx(1e-5)


class TestOneCycleLR:
    """one_cycle_lr must reproduce torch.optim.lr_scheduler.OneCycleLR as the
    reference constructs it (model.py:559-567: total_steps=epochs,
    pct_start=warmup_pct, cosine anneal, stepped once per epoch)."""

    @pytest.mark.parametrize("epochs,pct", [(22, 0.3), (10, 0.3), (8, 0.5)])
    def test_matches_torch_oracle(self, epochs, pct):
        import torch

        from flickering_adversarial_video_tpu.engine.epoch_fit import one_cycle_lr

        lr = 1e-3
        opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))], lr=lr)
        sched = torch.optim.lr_scheduler.OneCycleLR(
            opt, max_lr=lr, total_steps=epochs, pct_start=pct
        )
        for epoch in range(1, epochs + 1):
            want = opt.param_groups[0]["lr"]  # lr consumed during this epoch
            got = one_cycle_lr(lr, epoch, epochs, pct_start=pct)
            assert got == pytest.approx(want, rel=1e-6), (epoch, want, got)
            if epoch < epochs:
                sched.step()

    def test_shape(self):
        from flickering_adversarial_video_tpu.engine.epoch_fit import one_cycle_lr

        lr = 1e-2
        vals = [one_cycle_lr(lr, e, 20, pct_start=0.3) for e in range(1, 21)]
        peak = int(np.argmax(vals))
        assert vals[0] == pytest.approx(lr / 25.0)          # warmup start
        assert vals[peak] == pytest.approx(lr, rel=1e-3)    # reaches max_lr
        assert 3 <= peak <= 7                               # ~30% warmup
        assert vals[-1] < lr / 1000                         # anneals way down
        assert all(b > a for a, b in zip(vals[:peak], vals[1 : peak + 1]))
        assert all(b < a for a, b in zip(vals[peak:-1], vals[peak + 1 :]))

    def test_fit_uses_one_cycle(self, rng):
        """fit_universal_epochs(use_one_cycle_policy=True) must feed the
        one-cycle rate through the runtime LR flag each epoch."""
        import jax.numpy as jnp

        from flickering_adversarial_video_tpu.attack import TorchStyleFlickerSpec
        from flickering_adversarial_video_tpu.engine import (
            AttackConfig,
            AttackEngine,
            RuntimeFlags,
        )
        from flickering_adversarial_video_tpu.engine.epoch_fit import (
            fit_universal_epochs,
            one_cycle_lr,
        )

        apply_fn = lambda v, x: jnp.mean(x, axis=(1, 2, 3)) @ v["w"]
        variables = {"w": jnp.asarray(rng.normal(size=(3, 5)), jnp.float32) * 3}
        spec = TorchStyleFlickerSpec(frames=4, max_norm=0.2)
        engine = AttackEngine(
            apply_fn,
            variables,
            spec,
            AttackConfig(norm_world="meanstd", reg_weighting="torch"),
        )
        seen = []
        orig = engine.train_eval_step

        def spy(state, batch, flags, key):
            seen.append(float(jnp.asarray(flags.learning_rate)))
            return orig(state, batch, flags, key)

        engine.train_eval_step = spy

        def batches():
            v = rng.uniform(0, 1, (2, 4, 8, 8, 3)).astype(np.float32)
            yield {"video": v, "labels": np.array([0, 1])}

        epochs = 4
        fit_universal_epochs(
            engine,
            batches,
            batches,
            RuntimeFlags(max_norm=0.2),
            epochs=epochs,
            lr=1e-3,
            model_dir="/tmp/one_cycle_test",
            model_name="m",
            use_one_cycle_policy=True,
            save=False,
        )
        want = [one_cycle_lr(1e-3, e, epochs) for e in range(1, epochs + 1)]
        assert seen == pytest.approx(want)
