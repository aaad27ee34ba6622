"""End-to-end runner tests.

Drives the real drivers (runners/single_video.py, runners/universal.py,
runners/class_gen.py) over synthetic npy clips / tfrecord shards with a tiny
injected victim (CPU-fast), asserting the full path: config -> data ->
fused steps -> eval -> checkpoints -> result artifacts, including resume.
"""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flickering_adversarial_video_tpu.data import TFRecordWriter, make_uint8_example
from flickering_adversarial_video_tpu.utils.config import default_config
from flickering_adversarial_video_tpu.utils.labels import kinetics400_labels

FRAMES = 4
SIZE = 16


@pytest.fixture
def tiny_victim(monkeypatch):
    """Replace the I3D victim with a fast linear model for loop tests."""
    key = jax.random.key(5)
    w = jax.random.normal(key, (3, 400)) * 4.0

    def fake_build_victim(model_name, ckpt_path, compute_dtype, frames, size, **kw):
        def apply_fn(variables, x):
            return jnp.mean(x, axis=(1, 2, 3)) @ variables["w"]

        return apply_fn, {"w": w}

    from flickering_adversarial_video_tpu.runners import common

    monkeypatch.setattr(common, "build_victim", fake_build_victim)

    def predict(clip_u8):
        x = clip_u8.astype(np.float32) / 128.0 - 1.0
        return np.asarray(jnp.mean(jnp.asarray(x), axis=(1, 2, 3)) @ w)

    return predict


def _clip(rng):
    return rng.integers(0, 255, (FRAMES, SIZE, SIZE, 3), dtype=np.uint8)


def _self_labeled_clips(rng, predict, n):
    """(clip, label) pairs whose label IS the clean prediction, so every video
    is 'valid' under exclude-misclassified accounting."""
    out = []
    for _ in range(n):
        c = _clip(rng)
        label = int(predict(c[None]).argmax())
        out.append((c, label))
    return out


class TestSingleVideoRunner:
    def test_attack_and_pkl_schema(self, rng, tiny_victim, tmp_path, monkeypatch):
        from flickering_adversarial_video_tpu.runners import single_video

        labels = kinetics400_labels()
        npy_dir = tmp_path / "npy"
        npy_dir.mkdir()
        clips = _self_labeled_clips(rng, tiny_victim, 2)
        for i, (clip, label) in enumerate(clips):
            name = f"rgb_vid{i}@{labels[label].replace(' ', '_')}.npy"
            f32 = clip.astype(np.float32) / 128.0 - 1.0
            np.save(npy_dir / name, f32[None])

        cfg = default_config()
        cfg.SINGLE_VIDEO_ATTACK.NPY_PATH = str(npy_dir)
        cfg.SINGLE_VIDEO_ATTACK.PKL_RESULT_PATH = str(tmp_path / "res")
        cfg.SINGLE_VIDEO_ATTACK.MAX_NUM_STEP = 400
        cfg.SINGLE_VIDEO_ATTACK.COMPUTE_DTYPE = "float32"

        written = single_video.run(cfg, frames=FRAMES, stop_rule="early")
        assert len(written) >= 1
        with open(written[0], "rb") as f:
            res = pickle.load(f)
        for k in (
            "correct_cls", "correct_cls_id", "correct_cls_prob", "softmax_init",
            "rgb_sample", "total_loss_l", "adv_loss_l", "reg_loss_l",
            "norm_reg_loss_l", "diff_norm_reg_loss_l", "perturbation",
            "adv_video", "softmax", "total_steps", "beta_0", "beta_1",
            "beta_2", "beta_3", "fatness", "smoothness",
        ):
            assert k in res, k
        assert res["is_adversarial"]
        assert len(res["perturbation"]) == len(res["total_loss_l"])
        # filename metric encoding
        assert "_th_" in written[0] and "%_rg_" in written[0]

    def test_vectorized_slots_matches_sequential(
        self, rng, tiny_victim, tmp_path
    ):
        """--slots N drives the same clips through the vectorized sweep and
        must reproduce the sequential run's pkl contents."""
        from flickering_adversarial_video_tpu.runners import single_video

        labels = kinetics400_labels()
        npy_dir = tmp_path / "npy"
        npy_dir.mkdir()
        clips = _self_labeled_clips(rng, tiny_victim, 2)
        for i, (clip, label) in enumerate(clips):
            name = f"rgb_vid{i}@{labels[label].replace(' ', '_')}.npy"
            f32 = clip.astype(np.float32) / 128.0 - 1.0
            np.save(npy_dir / name, f32[None])

        cfg = default_config()
        cfg.SINGLE_VIDEO_ATTACK.NPY_PATH = str(npy_dir)
        cfg.SINGLE_VIDEO_ATTACK.MAX_NUM_STEP = 5
        cfg.SINGLE_VIDEO_ATTACK.COMPUTE_DTYPE = "float32"

        cfg.SINGLE_VIDEO_ATTACK.PKL_RESULT_PATH = str(tmp_path / "seq")
        seq = single_video.run(cfg, frames=FRAMES)
        cfg.SINGLE_VIDEO_ATTACK.PKL_RESULT_PATH = str(tmp_path / "vec")
        vec = single_video.run(cfg, frames=FRAMES, slots=2)
        assert len(seq) == len(vec) >= 1
        for sp, vp in zip(sorted(seq), sorted(vec)):
            with open(sp, "rb") as f:
                s = pickle.load(f)
            with open(vp, "rb") as f:
                v = pickle.load(f)
            assert s["total_steps"] == v["total_steps"]
            assert s["correct_cls"] == v["correct_cls"]
            np.testing.assert_allclose(
                s["total_loss_l"], v["total_loss_l"], atol=2e-5, rtol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(s["final_delta"]),
                np.asarray(v["final_delta"]),
                atol=1e-4,
            )

    def test_skips_misclassified(self, rng, tiny_victim, tmp_path):
        from flickering_adversarial_video_tpu.runners import single_video

        labels = kinetics400_labels()
        npy_dir = tmp_path / "npy"
        npy_dir.mkdir()
        clip, label = _self_labeled_clips(rng, tiny_victim, 1)[0]
        wrong = (label + 1) % 400
        f32 = clip.astype(np.float32) / 128.0 - 1.0
        np.save(npy_dir / f"rgb_v@{labels[wrong].replace(' ', '_')}.npy", f32[None])

        cfg = default_config()
        cfg.SINGLE_VIDEO_ATTACK.NPY_PATH = str(npy_dir)
        cfg.SINGLE_VIDEO_ATTACK.PKL_RESULT_PATH = str(tmp_path / "res")
        written = single_video.run(cfg, frames=FRAMES, stop_rule="early")
        assert written == []


def _write_shards(tmp_path, rng, predict, n_shards=2, per_shard=4):
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir(exist_ok=True)
    for s in range(n_shards):
        with TFRecordWriter(str(shard_dir / f"shard{s}.tfrecords")) as w:
            for clip, label in _self_labeled_clips(rng, predict, per_shard):
                w.write(make_uint8_example(clip, label))
    return str(shard_dir)


class TestUniversalRunner:
    def test_train_eval_checkpoint_resume(self, rng, tiny_victim, tmp_path, monkeypatch):
        from flickering_adversarial_video_tpu.runners import universal

        # geometry: runner parses with 224 default; patch batches to SIZE
        import flickering_adversarial_video_tpu.runners.universal as u
        from flickering_adversarial_video_tpu.data.tfrecord import tfrecord_batches

        def batches(shards, bs, frames=None, **kw):
            kw.update(height=SIZE, width=SIZE, use_native=False)
            return tfrecord_batches(shards, bs, frames=frames, **kw)

        monkeypatch.setattr(u, "tfrecord_batches", batches)

        shard_dir = _write_shards(tmp_path, rng, tiny_victim)
        cfg = default_config()
        ac = cfg.UNIVERSAL_ATTACK
        ac.TF_RECORDS_TRAIN_PATH = [shard_dir]
        ac.TF_RECORDS_VAL_PATH = [shard_dir]
        ac.NUM_OF_TRAIN_TF_RECORDS = 2
        ac.NUM_OF_VAL_TF_RECORDS = 2
        ac.BATCH_SIZE = 4
        ac.PKL_RESULT_PATH = str(tmp_path / "out")
        ac.COMPUTE_DTYPE = "float32"
        ac.MAX_NUM_STEP = 6

        out = universal.run(cfg, frames=FRAMES)
        assert out["steps"] == 6
        model_dir = universal.model_dir_name(ac)
        assert os.path.exists(os.path.join(model_dir, "res.pkl"))
        assert 0.0 <= out["final_eval"]["miss_rate"] <= 1.0
        assert out["final_eval"]["total_valid_videos"] == 8  # self-labeled

        # resume: second run continues from the checkpoint
        ac.MAX_NUM_STEP = 10
        out2 = universal.run(cfg, frames=FRAMES)
        assert int(out2["state"].step) == 10

    def test_eval_every_steps_cadence(self, rng, tiny_victim, tmp_path, monkeypatch):
        """EVAL_EVERY_STEPS restores the estimator's step-throttled eval
        (i3d_adversarial_main_universal.py:314-331,373-380): evals land every
        N optimizer steps instead of at epoch boundaries."""
        from flickering_adversarial_video_tpu.runners import universal
        import flickering_adversarial_video_tpu.runners.universal as u
        from flickering_adversarial_video_tpu.data.tfrecord import tfrecord_batches

        monkeypatch.setattr(
            u,
            "tfrecord_batches",
            lambda shards, bs, frames=None, **kw: tfrecord_batches(
                shards, bs, frames=frames,
                **{**kw, "height": SIZE, "width": SIZE, "use_native": False},
            ),
        )
        shard_dir = _write_shards(tmp_path, rng, tiny_victim)
        cfg = default_config()
        ac = cfg.UNIVERSAL_ATTACK
        ac.TF_RECORDS_TRAIN_PATH = [shard_dir]
        ac.TF_RECORDS_VAL_PATH = [shard_dir]
        ac.NUM_OF_TRAIN_TF_RECORDS = 2
        ac.NUM_OF_VAL_TF_RECORDS = 2
        ac.BATCH_SIZE = 4
        ac.PKL_RESULT_PATH = str(tmp_path / "cadence_out")
        ac.COMPUTE_DTYPE = "float32"
        ac.MAX_NUM_STEP = 6
        ac.EVAL_EVERY_STEPS = 2

        out = universal.run(cfg, frames=FRAMES)
        steps = out["history"]["fool_rate_steps"]
        # initial eval at step 0, then every 2 steps, then the final eval
        assert steps[:4] == [0, 2, 4, 6], steps
        # epoch-boundary evals are superseded: every recorded eval step is on
        # the throttle grid
        assert all(s % 2 == 0 for s in steps), steps

    def test_sparse_variant(self, rng, tiny_victim, tmp_path, monkeypatch):
        from flickering_adversarial_video_tpu.runners import universal
        import flickering_adversarial_video_tpu.runners.universal as u
        from flickering_adversarial_video_tpu.data.tfrecord import tfrecord_batches

        monkeypatch.setattr(
            u,
            "tfrecord_batches",
            lambda shards, bs, frames=None, **kw: tfrecord_batches(
                shards, bs, frames=frames,
                **{**kw, "height": SIZE, "width": SIZE, "use_native": False},
            ),
        )
        shard_dir = _write_shards(tmp_path, rng, tiny_victim, n_shards=1, per_shard=4)
        cfg = default_config()
        ac = cfg.UNIVERSAL_ATTACK
        ac.FLICKERING_ATTACK = False  # L1,2 sparse attack path
        ac.TF_RECORDS_TRAIN_PATH = [shard_dir]
        ac.TF_RECORDS_VAL_PATH = [shard_dir]
        ac.NUM_OF_TRAIN_TF_RECORDS = 1
        ac.NUM_OF_VAL_TF_RECORDS = 1
        ac.BATCH_SIZE = 4
        ac.PKL_RESULT_PATH = str(tmp_path / "sparse_out")
        ac.COMPUTE_DTYPE = "float32"
        ac.MAX_NUM_STEP = 3

        # sparse spec must get the real spatial size
        out = universal.run(cfg, frames=FRAMES, size=SIZE)
        assert out["steps"] == 3


class TestClassGenRunner:
    def test_epoch_loop(self, rng, tiny_victim, tmp_path, monkeypatch):
        from flickering_adversarial_video_tpu.runners import class_gen
        import flickering_adversarial_video_tpu.runners.class_gen as cgm
        from flickering_adversarial_video_tpu.data.tfrecord import tfrecord_batches

        monkeypatch.setattr(
            cgm,
            "tfrecord_batches",
            lambda shards, bs, frames=None, **kw: tfrecord_batches(
                shards, bs, frames=frames,
                **{**kw, "height": SIZE, "width": SIZE, "use_native": False},
            ),
        )
        shard_dir = _write_shards(tmp_path, rng, tiny_victim, n_shards=1, per_shard=4)
        cfg = default_config()
        ac = cfg.CLASS_GEN_ATTACK
        ac.TF_RECORDS_TRAIN_PATH = [shard_dir]
        ac.TF_RECORDS_VAL_PATH = [shard_dir]
        ac.NUM_OF_TRAIN_TF_RECORDS = 1
        ac.NUM_OF_VAL_TF_RECORDS = 1
        ac.BATCH_SIZE = 4
        ac.PKL_RESULT_PATH = str(tmp_path / "cg") + "/"
        ac.COMPUTE_DTYPE = "float32"
        ac.MAX_NUM_STEP = 4

        out = class_gen.run(cfg, frames=FRAMES)
        assert out["steps"] == 4
        res_path = os.path.join(ac.PKL_RESULT_PATH, "res.pkl")
        assert os.path.exists(res_path)
        with open(res_path, "rb") as f:
            res = pickle.load(f)
        for k in ("total_loss_l", "perturbation", "fool_rate", "fatness", "smoothness"):
            assert k in res, k


class TestBuildEngineConfigMapping:
    def test_targeted_and_sparse_and_flags(self, tiny_victim):
        from flickering_adversarial_video_tpu.runners.common import build_engine
        from flickering_adversarial_video_tpu.utils.config import default_config
        from flickering_adversarial_video_tpu.utils.labels import kinetics400_labels

        cfg = default_config()
        ac = cfg.UNIVERSAL_ATTACK
        ac.TARGETED_ATTACK = True
        ac.TARGETED_CLASS = "welding"
        ac.USE_LOGITS = True
        ac.IMPROVE_ADV_LOSS = False
        ac.CYCLIC_ATTACK = True
        ac.PROB_MARGIN = 0.1
        engine, labels = build_engine(
            ac, cfg.MODEL, frames=4, size=16, attack_kind="sparse", use_mesh=False
        )
        assert engine.config.targeted
        assert engine.config.target_class == kinetics400_labels().index("welding")
        assert engine.config.use_logits
        assert not engine.config.improve_loss
        assert engine.config.enable_cyclic
        assert engine.config.attack_kind == "sparse"
        assert engine.config.margin == 0.1
        # sparse spec gets the full spatial geometry
        assert engine.spec.shape == (4, 16, 16, 3)

    def test_rgb600_end_to_end(self, rng, tmp_path):
        """Kinetics-600 path e2e: a synthetic rgb600 checkpoint (prefix-less
        variable names, kinetics_i3d_utils.py:47-56) on disk -> EVAL_TYPE
        'rgb600' in the MODEL section -> a 600-way I3D whose targeted class
        resolves from the vendored K600 label map."""
        tf = pytest.importorskip("tensorflow")
        from flickering_adversarial_video_tpu.models.i3d import init_i3d_params
        from flickering_adversarial_video_tpu.runners.common import build_engine
        from flickering_adversarial_video_tpu.utils.labels import kinetics600_labels
        from test_convert_i3d import flax_tree_to_ckpt_names

        variables = init_i3d_params(
            jax.random.key(0), num_classes=600, frames=FRAMES, size=SIZE
        )
        var_map = flax_tree_to_ckpt_names(variables, rng)
        bare = {k[len("RGB/inception_i3d/"):]: v for k, v in var_map.items()}
        ckpt_prefix = str(tmp_path / "rgb600" / "model.ckpt")
        os.makedirs(os.path.dirname(ckpt_prefix))
        g = tf.Graph()
        with g.as_default():
            tf_vars = [
                tf.compat.v1.get_variable(n, initializer=v) for n, v in bare.items()
            ]
            with tf.compat.v1.Session(graph=g) as sess:
                sess.run(tf.compat.v1.global_variables_initializer())
                tf.compat.v1.train.Saver(var_list=tf_vars).save(sess, ckpt_prefix)

        cfg = default_config()
        cfg.MODEL.CKPT_PATH = ckpt_prefix
        cfg.MODEL.EVAL_TYPE = "rgb600"
        ac = cfg.SINGLE_VIDEO_ATTACK
        ac.TARGETED_ATTACK = True
        # a class that exists ONLY in Kinetics-600
        ac.TARGETED_CLASS = "acting in play"
        ac.COMPUTE_DTYPE = "float32"
        engine, labels = build_engine(
            ac, cfg.MODEL, frames=FRAMES, size=SIZE, use_mesh=False
        )
        assert len(labels) == 600
        assert engine.config.target_class == kinetics600_labels().index(
            "acting in play"
        )
        batch = {
            "video": jnp.asarray(_clip(rng)[None]),
            "labels": jnp.asarray([3]),
        }
        from flickering_adversarial_video_tpu.engine import RuntimeFlags

        probs = engine.forward(
            engine.init_state().delta, batch, RuntimeFlags(), jax.random.key(0)
        )
        assert probs.shape == (1, 600)
        assert np.isfinite(np.asarray(probs)).all()

    @pytest.mark.parametrize("num_classes", [359, 487])
    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_ig65m_end_to_end(self, rng, tmp_path, num_classes, capsys):
        """ig65m path e2e, mirroring test_rgb600_end_to_end: a synthetic
        torch.hub-layout r2plus1d_34 .pth with a 359/487-way head
        (utils_cv/action_recognition/model.py:402-441) on disk -> the real
        converter via build_victim -> head width inferred from the checkpoint
        (not the registry default) -> one fused attack step runs -> the
        placeholder label names are declared loudly."""
        pytest.importorskip("torch")
        from flickering_adversarial_video_tpu.attack import TorchStyleFlickerSpec
        from flickering_adversarial_video_tpu.convert.fake_assets import (
            write_torchvision_pth,
        )
        from flickering_adversarial_video_tpu.engine import (
            AttackConfig,
            AttackEngine,
            RuntimeFlags,
        )
        from flickering_adversarial_video_tpu.runners.common import (
            build_victim,
            infer_num_classes,
            make_victim_packed_fn,
        )
        from flickering_adversarial_video_tpu.utils.labels import (
            load_label_map,
            warn_if_placeholder,
        )

        pth = write_torchvision_pth(
            str(tmp_path / "r2plus1d_34_ig65m.pth"), "r2plus1d_34",
            num_classes=num_classes,
        )
        apply_fn, variables = build_victim(
            "r2plus1d_34", pth, jnp.float32, FRAMES, SIZE,
            num_classes=num_classes,
        )
        assert infer_num_classes(variables, "r2plus1d_34") == num_classes

        spec = TorchStyleFlickerSpec(frames=FRAMES, max_norm=0.1)
        engine = AttackEngine(
            apply_fn,
            variables,
            spec,
            AttackConfig(norm_world="meanstd", reg_weighting="torch"),
            track_probs=False,
            apply_packed_fn=make_victim_packed_fn(
                "r2plus1d_34", variables,
                infer_num_classes(variables, "r2plus1d_34"), jnp.float32,
            ),
        )
        batch = {
            "video": jnp.asarray(_clip(rng)[None]),
            "labels": jnp.asarray([num_classes - 1]),
        }
        state, metrics = engine.train_step(
            engine.init_state(), batch, RuntimeFlags(max_norm=0.1),
            jax.random.key(0),
        )
        assert int(state.step) == 1
        assert np.isfinite(float(metrics["total_loss"]))
        probs = engine.forward(state.delta, batch, RuntimeFlags(), jax.random.key(0))
        assert probs.shape == (1, num_classes)

        labels = load_label_map(None, num_classes=num_classes)
        assert len(labels) == num_classes
        assert warn_if_placeholder(labels)
        assert "placeholder" in capsys.readouterr().out

    def test_frame_window_knob(self, tiny_victim):
        from flickering_adversarial_video_tpu.runners.common import build_engine
        from flickering_adversarial_video_tpu.utils.config import default_config

        cfg = default_config()
        ac = cfg.SINGLE_VIDEO_ATTACK
        ac.ATTACK_FRAME_WINDOW = [1, 2]
        engine, _ = build_engine(ac, cfg.MODEL, frames=4, size=16, use_mesh=False)
        assert engine.config.frame_window == (1, 2)
        import numpy as np

        mask = np.asarray(engine._mask).reshape(-1)
        np.testing.assert_array_equal(mask, [0.0, 1.0, 1.0, 0.0])


class TestRunnerCLIs:
    """argparse smoke tests: every driver's --help must work (catches typos
    in flag wiring without running attacks)."""

    @pytest.mark.parametrize(
        "module",
        [
            "flickering_adversarial_video_tpu.runners.torch_universal",
            "flickering_adversarial_video_tpu.runners.torch_per_video",
            "flickering_adversarial_video_tpu.viz.stats_plots",
            "flickering_adversarial_video_tpu.viz.aggregate",
            "flickering_adversarial_video_tpu.data.write_tfrecords",
            "flickering_adversarial_video_tpu.data.kinetics_download",
            "flickering_adversarial_video_tpu.convert.cli",
        ],
    )
    def test_help(self, module):
        import importlib

        mod = importlib.import_module(module)
        with pytest.raises(SystemExit) as e:
            mod.main(["--help"])
        assert e.value.code == 0
