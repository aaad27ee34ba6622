"""Tests for viz (animation, aggregate plots), inference wrapper, tfrecord
writers over real mp4 files, and the downloader's offline pieces."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestStatsPlots:
    @pytest.fixture
    def res(self, rng):
        T = 6
        delta = (rng.normal(size=(T, 1, 1, 3)) * 0.05).astype(np.float32)
        clean = rng.uniform(-1, 1, (1, T, 16, 16, 3)).astype(np.float32)
        return {
            "correct_cls": "juggling balls",
            "rgb_sample": clean,
            "adv_video": np.clip(clean + delta[None], -1, 1),
            "perturbation": [delta],
            "fatness": [1.5],
            "smoothness": [0.8],
        }

    def test_extract_videos(self, res):
        from flickering_adversarial_video_tpu.viz.stats_plots import extract_videos

        clean, delta_vid, adv = extract_videos(res)
        assert clean.shape == adv.shape == delta_vid.shape == (6, 16, 16, 3)
        assert clean.dtype == np.uint8

    def test_animate_saves_gif(self, res, tmp_path):
        from flickering_adversarial_video_tpu.viz.stats_plots import animate

        out = animate(res, save=str(tmp_path / "a.gif"), fps=5, show=False)
        assert os.path.exists(out) and os.path.getsize(out) > 0

    def test_select_writer_logic(self):
        """Writer selection (reference stats_plots.py:209-219 mp4 export):
        gif -> pillow always; mp4 -> ffmpeg iff available, else a loud gif
        fallback next to the requested path — never a deep matplotlib crash."""
        from matplotlib import animation

        from flickering_adversarial_video_tpu.viz.stats_plots import select_writer

        assert select_writer("x.gif") == ("pillow", "x.gif")
        writer, path = select_writer("out/clip.mp4")
        if animation.writers.is_available("ffmpeg"):
            assert (writer, path) == ("ffmpeg", "out/clip.mp4")
        else:
            assert (writer, path) == ("pillow", "out/clip.gif")

    def test_animate_mp4_target(self, res, tmp_path, capsys):
        """--save out.mp4 end-to-end: writes mp4 when ffmpeg exists, else
        falls back to gif with a message — either way a playable file."""
        from matplotlib import animation

        from flickering_adversarial_video_tpu.viz.stats_plots import animate

        out = animate(res, save=str(tmp_path / "clip.mp4"), fps=5, show=False)
        assert os.path.exists(out) and os.path.getsize(out) > 0
        if animation.writers.is_available("ffmpeg"):
            assert out.endswith(".mp4")
        else:
            assert out.endswith(".gif")
            assert "falling back" in capsys.readouterr().out


class TestAggregate:
    def test_best_epoch_selection(self):
        from flickering_adversarial_video_tpu.viz.aggregate import best_epoch_stats

        results = [
            {"valid/fooling_ratio": 0.5, "valid/pert_thickness": 0.01, "valid/pert_roughness": 0.01},
            {"valid/fooling_ratio": 0.9, "valid/pert_thickness": 0.05, "valid/pert_roughness": 0.02},
            {"valid/fooling_ratio": 0.85, "valid/pert_thickness": 0.03, "valid/pert_roughness": 0.02},
        ]
        s = best_epoch_stats(results, fooling_threshold=0.8)
        assert s["epoch"] == 3  # min thickness among fooling >= 0.8
        s2 = best_epoch_stats(results, fooling_threshold=0.99)
        assert s2["epoch"] == 2  # fallback: max fooling

    def test_collect_and_plot(self, tmp_path):
        from flickering_adversarial_video_tpu.viz.aggregate import (
            collect_experiments,
            plot_sweep,
        )

        for n in (100, 1000):
            d = tmp_path / f"r3d_18_t{n}"
            d.mkdir()
            results = [
                {
                    "valid/fooling_ratio": 0.9,
                    "valid/pert_thickness": 0.02,
                    "valid/pert_roughness": 0.01,
                }
            ]
            np.save(d / "r3d_18_001.npy", results)
        exps = collect_experiments(str(tmp_path))
        assert [n for n, _ in exps["r3d_18"]] == [100, 1000]
        out = plot_sweep(exps, save=str(tmp_path / "sweep.png"))
        assert os.path.exists(out)


class TestInferenceWrapper:
    def test_adv_flag_switches_delta(self, rng):
        from flickering_adversarial_video_tpu.attack import FlickerSpec
        from flickering_adversarial_video_tpu.engine import AttackConfig, AttackEngine
        from flickering_adversarial_video_tpu.engine.inference import InferenceModel

        w = jax.random.normal(jax.random.key(2), (3, 10))

        def apply_fn(variables, x):
            return jnp.mean(x, axis=(1, 2, 3)) @ variables["w"]

        engine = AttackEngine(apply_fn, {"w": w}, FlickerSpec(frames=4), AttackConfig())
        infer = InferenceModel(engine)
        clip = rng.uniform(-1, 1, (1, 4, 8, 8, 3)).astype(np.float32)
        p_clean = infer(clip, adv_flag=0)
        infer.load_perturbation(np.full((4, 1, 1, 3), 0.3, np.float32))
        p_adv = infer(clip, adv_flag=1)
        p_off = infer(clip, adv_flag=0)
        assert not np.allclose(p_clean, p_adv)
        np.testing.assert_allclose(p_clean, p_off, atol=1e-6)

    def test_evaluate_inference_statistics(self, rng, capsys):
        """Per-video inference-time statistics (model.py:1267-1319): timing
        list, video-level (summed clip outputs) and clip-level predictions,
        both accuracies."""
        from flickering_adversarial_video_tpu.attack import FlickerSpec
        from flickering_adversarial_video_tpu.engine import AttackConfig, AttackEngine
        from flickering_adversarial_video_tpu.engine.inference import InferenceModel

        w = jax.random.normal(jax.random.key(2), (3, 10))

        def apply_fn(variables, x):
            return jnp.mean(x, axis=(1, 2, 3)) @ variables["w"]

        engine = AttackEngine(apply_fn, {"w": w}, FlickerSpec(frames=4), AttackConfig())
        infer = InferenceModel(engine)

        def samples():
            for _ in range(3):
                clips = rng.uniform(-1, 1, (2, 4, 8, 8, 3)).astype(np.float32)
                # label = the model's own video-level prediction -> acc 1.0
                probs = infer(clips, adv_flag=0)
                yield clips, int(probs.sum(axis=0).argmax())

        ret = infer.evaluate(samples())
        assert len(ret["infer_times"]) == 3
        assert all(t > 0 for t in ret["infer_times"])
        assert len(ret["video_preds"]) == len(ret["video_trues"]) == 3
        assert len(ret["clip_preds"]) == len(ret["clip_trues"]) == 6
        assert ret["video_accuracy"] == 1.0
        out = capsys.readouterr().out
        assert "Avg. inference time per video" in out
        assert "Video prediction accuracy" in out


def _write_mp4(path, frames):
    import cv2

    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 25, (w, h)
    )
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()


class TestVideoToTFRecord:
    def test_mp4_roundtrip_and_class_shards(self, rng, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from flickering_adversarial_video_tpu.data.tfrecord import (
            parse_example_uint8,
            read_records,
        )
        from flickering_adversarial_video_tpu.data.video import video_to_frames
        from flickering_adversarial_video_tpu.data.write_tfrecords import (
            write_class_shards,
        )

        class_dir = tmp_path / "vids"
        class_dir.mkdir()
        frames = [
            rng.integers(0, 255, (240, 320, 3), dtype=np.uint8) for _ in range(12)
        ]
        _write_mp4(class_dir / "a.mp4", frames)
        # a too-short clip must be skipped
        _write_mp4(class_dir / "short.mp4", frames[:2])

        clip = video_to_frames(str(class_dir / "a.mp4"), n_steps=8)
        assert clip is not None and clip.shape == (1, 8, 224, 224, 3)
        assert clip.min() >= -1.0 and clip.max() <= 1.0

        out = tmp_path / "shards"
        shards = write_class_shards(
            str(class_dir), 7, str(out), frames=8, per_shard=100
        )
        assert len(shards) == 1
        recs = list(read_records(shards[0]))
        assert len(recs) == 1  # short clip skipped
        video, label = parse_example_uint8(recs[0])
        assert label == 7 and video.shape == (8, 224, 224, 3)


class TestDownloaderOffline:
    def test_csv_and_report_summary(self, tmp_path):
        from flickering_adversarial_video_tpu.data.kinetics_download import (
            read_kinetics_csv,
            summarize_report,
        )

        csv_path = tmp_path / "ann.csv"
        csv_path.write_text(
            "label,youtube_id,time_start,time_end,split\n"
            "juggling balls,abc123,0,10,val\n"
        )
        rows = read_kinetics_csv(str(csv_path))
        assert rows[0]["youtube_id"] == "abc123"

        report = {"a": "ok", "b": "Video unavailable", "c": "timeout", "d": "weird"}
        rp = tmp_path / "report.json"
        rp.write_text(json.dumps(report))
        s = summarize_report(str(rp))
        assert s == {"ok": 1, "unavailable": 1, "timeout": 1, "other": 1}

    def test_vendored_annotation_samples(self):
        """Every manifest entry has a vendored 100-row sample with the
        reference CSV schema (data/kinetics/data/*.csv: label, youtube_id,
        time_start, time_end, split), so the downloader runs from in-repo
        assets (VERDICT r4 item 6)."""
        from flickering_adversarial_video_tpu.data.kinetics_download import (
            ANNOTATION_MANIFEST,
            annotation_sample_path,
            read_kinetics_csv,
        )

        assert set(ANNOTATION_MANIFEST) == {
            "kinetics-400_val",
            "kinetics-400_test",
            "kinetics-600_val",
            "kinetics-600_test",
        }
        for name, entry in ANNOTATION_MANIFEST.items():
            assert len(entry["sha256"]) == 64
            assert str(entry["url"]).startswith("https://")
            rows = read_kinetics_csv(annotation_sample_path(name))
            assert len(rows) == 100
            # kinetics-600_test is the unlabeled test split (no label col)
            keys = ("youtube_id", "time_start", "time_end", "split")
            if name != "kinetics-600_test":
                keys += ("label",)
            for key in keys:
                assert key in rows[0], (name, key)
            float(rows[0]["time_start"]); float(rows[0]["time_end"])

    def test_resolve_annotation_prefers_verified_full_csv(self, tmp_path):
        from flickering_adversarial_video_tpu.data.kinetics_download import (
            annotation_sample_path,
            resolve_annotation_csv,
        )

        name = "kinetics-400_val"
        # no search dir -> vendored sample
        assert resolve_annotation_csv(name) == annotation_sample_path(name)
        # a full CSV with the WRONG checksum is ignored (sample wins)
        bad = tmp_path / f"{name}.csv"
        bad.write_text("label,youtube_id,time_start,time_end,split\n")
        assert (
            resolve_annotation_csv(name, str(tmp_path))
            == annotation_sample_path(name)
        )
        with pytest.raises(FileNotFoundError):
            resolve_annotation_csv("not-a-manifest-name")

    def test_fetch_annotation_verifies_checksum(self, tmp_path, monkeypatch):
        """fetch_annotation writes the payload and verifies it against the
        manifest sha256 — a tampered payload must raise, a matching one
        must return the path, and an already-valid file is not re-fetched."""
        import hashlib
        import io

        from flickering_adversarial_video_tpu.data import kinetics_download as kd

        name = "kinetics-400_val"
        good = b"label,youtube_id,time_start,time_end,split\na,b,0,1,val\n"
        entry = dict(kd.ANNOTATION_MANIFEST[name])
        entry["sha256"] = hashlib.sha256(good).hexdigest()
        monkeypatch.setitem(kd.ANNOTATION_MANIFEST, name, entry)

        calls = []

        class FakeResponse(io.BytesIO):
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        def fake_urlopen(url, timeout=0):
            calls.append(url)
            return FakeResponse(good)

        monkeypatch.setattr(
            "urllib.request.urlopen", fake_urlopen
        )
        dest = kd.fetch_annotation(name, str(tmp_path))
        assert dest.endswith(f"{name}.csv") and len(calls) == 1
        # already-valid file: no second fetch
        assert kd.fetch_annotation(name, str(tmp_path)) == dest
        assert len(calls) == 1
        # tampered payload -> checksum mismatch raises
        monkeypatch.setattr(
            "urllib.request.urlopen",
            lambda url, timeout=0: FakeResponse(good + b"tampered"),
        )
        (tmp_path / f"{name}.csv").unlink()
        with pytest.raises(ValueError, match="checksum mismatch"):
            kd.fetch_annotation(name, str(tmp_path))

    def test_downloader_runs_from_vendored_sample_to_ytdlp_boundary(
        self, tmp_path, monkeypatch
    ):
        """End-to-end from in-repo assets: the downloader consumes the
        vendored sample and reaches the yt-dlp/ffmpeg boundary (absent
        binaries -> every row reported 'missing yt-dlp/ffmpeg', report
        written, summary classifies them)."""
        from flickering_adversarial_video_tpu.data import kinetics_download as kd

        monkeypatch.setattr(kd, "_downloader_binary", lambda: None)
        out = tmp_path / "out"
        report = kd.download_dataset(
            kd.resolve_annotation_csv("kinetics-400_val"), str(out), limit=5
        )
        assert len(report) == 5
        assert all(v == "missing yt-dlp/ffmpeg" for v in report.values())
        s = kd.summarize_report(str(out / "download_report.json"))
        assert s == {"missing tools": 5}


class TestVerifiedNpySet:
    def test_build_verified_set(self, rng, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from flickering_adversarial_video_tpu.data.npy import (
            build_verified_npy_set,
            load_npy_clip,
            parse_label_from_filename,
        )

        classes = ["class a", "class b"]
        root = tmp_path / "videos"
        for c in classes:
            d = root / c.replace(" ", "_")
            d.mkdir(parents=True)
            frames = [
                rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
                for _ in range(10)
            ]
            _write_mp4(d / "v.mp4", frames)

        # predictor that always says class index 0: only 'class a' verifies
        def predict(clip):
            p = np.zeros((1, 2))
            p[0, 0] = 1.0
            return p

        written = build_verified_npy_set(
            str(root), n_frames=6, num_of_vid=2, dest_folder=str(tmp_path / "npy"),
            predict_fn=predict, class_names=classes,
        )
        assert len(written) == 1
        assert parse_label_from_filename(written[0]) == "class a"
        clip = load_npy_clip(written[0], frames=6)
        assert clip.shape == (1, 6, 224, 224, 3)


class TestLiveDashboard:
    def test_updates_and_saves(self, tmp_path):
        from flickering_adversarial_video_tpu.viz.live import LiveDashboard

        dash = LiveDashboard(refresh_every=5, save_path=str(tmp_path / "dash.png"))
        for step in range(11):
            dash.update(step, {
                "total_loss": 1.0 / (step + 1), "adv_loss": 0.5 / (step + 1),
                "reg_loss": 0.1, "norm_reg": 0.05, "diff_norm_reg": 0.02,
                "laplacian_norm_reg": 0.01, "thickness": 0.02, "roughness": 0.01,
                "prob_to_min": 0.4, "prob_to_max": 0.3,
            })
        dash.add_fooling(10, 0.5)
        dash.render()
        dash.close()
        assert os.path.getsize(tmp_path / "dash.png") > 0


class TestSplitListFloatWriter:
    def test_float_schema_split_writer(self, rng, tmp_path):
        pytest.importorskip("cv2")
        from flickering_adversarial_video_tpu.data.tfrecord import (
            parse_example_float,
            read_records,
        )
        from flickering_adversarial_video_tpu.data.write_tfrecords import (
            write_split_list_shard,
        )

        root = tmp_path / "ucf"
        (root / "ApplyEyeMakeup").mkdir(parents=True)
        frames = [rng.integers(0, 255, (240, 320, 3), dtype=np.uint8) for _ in range(10)]
        _write_mp4(root / "ApplyEyeMakeup" / "v1.mp4", frames)
        split = tmp_path / "testlist.txt"
        split.write_text("ApplyEyeMakeup/ApplyEyeMakeup/v1.mp4\n")
        out = str(tmp_path / "out.tfrecords")
        n = write_split_list_shard(
            str(split), str(root), out, ["ApplyEyeMakeup", "Other"], frames=6
        )
        assert n == 1
        recs = list(read_records(out))
        video, label = parse_example_float(recs[0])
        assert label == 0 and video.shape == (6, 224, 224, 3)
        assert -1.0 <= video.min() and video.max() <= 1.0


class TestLabelMaps:
    """Vendored label maps: Kinetics-400 (embedded), Kinetics-600 and UCF-101
    (reference assets data/label_map_600.txt, data/label_map_ucf_101.txt)."""

    def test_sizes_and_spot_values(self):
        from flickering_adversarial_video_tpu.utils.labels import (
            kinetics400_labels,
            kinetics600_labels,
            ucf101_labels,
        )

        k4, k6, ucf = kinetics400_labels(), kinetics600_labels(), ucf101_labels()
        assert len(k4) == 400 and len(k6) == 600 and len(ucf) == 101
        assert k4[0] == "abseiling" and k6[0] == "abseiling"
        assert "acting in play" in k6 and "acting in play" not in k4
        assert ucf[0] == "ApplyEyeMakeup" and ucf[-1] == "YoYo"
        assert len(set(k6)) == 600 and len(set(ucf)) == 101

    def test_labels_for_num_classes(self):
        from flickering_adversarial_video_tpu.utils.labels import (
            labels_for_num_classes,
            load_label_map,
        )

        assert len(labels_for_num_classes(600)) == 600
        assert len(labels_for_num_classes(101)) == 101
        assert len(labels_for_num_classes(400)) == 400
        # path overrides; missing path falls back by num_classes
        assert len(load_label_map(None, num_classes=600)) == 600
        assert len(load_label_map("/nonexistent/x.txt", num_classes=101)) == 101
