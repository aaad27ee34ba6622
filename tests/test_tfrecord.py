"""Data-layer tests: proto codec, tfrecord framing, native reader, pipelines.

Binary compatibility matters: records written by this framework must parse
with TF's own parser (the reference's pipelines, pre_process_rgb_flow.py:
211-236) and vice versa — both directions are asserted here.
"""

import numpy as np
import pytest

from flickering_adversarial_video_tpu.data import (
    TFRecordWriter,
    list_shards,
    make_float_example,
    make_uint8_example,
    parse_example_float,
    parse_example_uint8,
    read_records,
    tfrecord_batches,
)
from flickering_adversarial_video_tpu.data import example_proto

tf = pytest.importorskip("tensorflow")


def random_clip(rng, t=4, h=6, w=6):
    return rng.integers(0, 255, (t, h, w, 3), dtype=np.uint8)


class TestExampleProto:
    def test_roundtrip_uint8(self, rng):
        clip = random_clip(rng)
        rec = make_uint8_example(clip, 123)
        video, label = parse_example_uint8(rec, height=6, width=6)
        assert label == 123
        np.testing.assert_array_equal(video, clip)

    def test_roundtrip_float(self, rng):
        clip = rng.normal(size=(3, 6, 6, 3)).astype(np.float32)
        rec = make_float_example(clip, 7)
        video, label = parse_example_float(rec, height=6, width=6)
        assert label == 7
        np.testing.assert_allclose(video, clip, rtol=1e-6)

    def test_tf_can_parse_our_records(self, rng):
        """Records we write parse with tf.io.parse_example — the reference's
        reader works unchanged on our shards."""
        clip = random_clip(rng)
        rec = make_uint8_example(clip, 55)
        feats = tf.io.parse_single_example(
            rec,
            {
                "train/label": tf.io.FixedLenFeature((), tf.int64),
                "train/video": tf.io.FixedLenFeature([], tf.string),
            },
        )
        assert int(feats["train/label"].numpy()) == 55
        video = tf.io.decode_raw(feats["train/video"], tf.uint8).numpy()
        np.testing.assert_array_equal(video.reshape(clip.shape), clip)

    def test_we_can_parse_tf_records(self, rng):
        """Records written by tf.train.Example (the reference writers'
        path, kinetics_to_tf_record_uint8.py:88-95) parse with our codec."""
        clip = random_clip(rng)
        example = tf.train.Example(
            features=tf.train.Features(
                feature={
                    "train/label": tf.train.Feature(
                        int64_list=tf.train.Int64List(value=[99])
                    ),
                    "train/video": tf.train.Feature(
                        bytes_list=tf.train.BytesList(value=[clip.tobytes()])
                    ),
                }
            )
        )
        video, label = parse_example_uint8(example.SerializeToString(), height=6, width=6)
        assert label == 99
        np.testing.assert_array_equal(video, clip)


class TestFraming:
    def test_writer_reader_roundtrip(self, rng, tmp_path):
        path = str(tmp_path / "a.tfrecords")
        clips = [random_clip(rng) for _ in range(5)]
        with TFRecordWriter(path) as w:
            for i, c in enumerate(clips):
                w.write(make_uint8_example(c, i))
        got = list(read_records(path, verify_crc=True))
        assert len(got) == 5
        for i, rec in enumerate(got):
            video, label = parse_example_uint8(rec, height=6, width=6)
            assert label == i
            np.testing.assert_array_equal(video, clips[i])

    def test_tf_reads_our_file(self, rng, tmp_path):
        path = str(tmp_path / "b.tfrecords")
        clip = random_clip(rng)
        with TFRecordWriter(path) as w:
            w.write(make_uint8_example(clip, 3))
        ds = tf.data.TFRecordDataset([path])
        records = [r.numpy() for r in ds]
        assert len(records) == 1
        video, label = parse_example_uint8(records[0], height=6, width=6)
        assert label == 3

    def test_our_reader_reads_tf_file(self, rng, tmp_path):
        path = str(tmp_path / "c.tfrecords")
        clip = random_clip(rng)
        with tf.io.TFRecordWriter(path) as w:
            w.write(make_uint8_example(clip, 4))
        recs = list(read_records(path, verify_crc=True))
        video, label = parse_example_uint8(recs[0], height=6, width=6)
        assert label == 4
        np.testing.assert_array_equal(video, clip)


class TestNativeReader:
    @pytest.fixture
    def shard(self, rng, tmp_path):
        path = str(tmp_path / "n.tfrecords")
        clips = [random_clip(rng, t=5) for _ in range(4)]
        with TFRecordWriter(path) as w:
            for i, c in enumerate(clips):
                w.write(make_uint8_example(c, i * 10))
        return path, clips

    def test_streaming(self, shard):
        from flickering_adversarial_video_tpu.data.native_reader import (
            NativeTFRecordReader,
        )

        path, clips = shard
        reader = NativeTFRecordReader(height=6, width=6, verify_crc=True)
        got = list(reader.read_parsed(path))
        assert len(got) == 4
        for i, (video, label) in enumerate(got):
            assert label == i * 10
            np.testing.assert_array_equal(video, clips[i])

    def test_bulk_batch_trailing_frames(self, shard):
        from flickering_adversarial_video_tpu.data.native_reader import (
            NativeTFRecordReader,
        )

        path, clips = shard
        reader = NativeTFRecordReader(height=6, width=6)
        videos, labels = reader.read_batch_into(path, frames=3, count=4)
        assert videos.shape == (4, 3, 6, 6, 3)
        for i in range(4):
            np.testing.assert_array_equal(videos[i], clips[i][-3:])  # last-N


class TestPipeline:
    def test_batches(self, rng, tmp_path):
        paths = []
        for s in range(2):
            p = str(tmp_path / f"s{s}.tfrecords")
            with TFRecordWriter(p) as w:
                for i in range(3):
                    w.write(make_uint8_example(random_clip(rng, t=5), s * 3 + i))
            paths.append(p)
        shards = list_shards(str(tmp_path))
        assert shards == sorted(paths)
        batches = list(
            tfrecord_batches(shards, batch_size=2, frames=4, height=6, width=6, use_native=False)
        )
        assert len(batches) == 3
        assert batches[0]["video"].shape == (2, 4, 6, 6, 3)
        assert batches[0]["video"].dtype == np.uint8
        all_labels = np.concatenate([b["labels"] for b in batches])
        np.testing.assert_array_equal(np.sort(all_labels), np.arange(6))

    def test_host_sharding(self, rng, tmp_path):
        paths = []
        for s in range(4):
            p = str(tmp_path / f"h{s}.tfrecords")
            with TFRecordWriter(p) as w:
                w.write(make_uint8_example(random_clip(rng, t=2), s))
            paths.append(p)
        b0 = list(tfrecord_batches(paths, 1, height=6, width=6, host_id=0, num_hosts=2, use_native=False))
        b1 = list(tfrecord_batches(paths, 1, height=6, width=6, host_id=1, num_hosts=2, use_native=False))
        l0 = {int(b["labels"][0]) for b in b0}
        l1 = {int(b["labels"][0]) for b in b1}
        assert l0 == {0, 2} and l1 == {1, 3}

    def test_tf_dataset_pipeline(self, rng, tmp_path):
        from flickering_adversarial_video_tpu.data.tfrecord import make_tf_dataset

        p = str(tmp_path / "tfp.tfrecords")
        clip = rng.integers(0, 255, (5, 224, 224, 3), dtype=np.uint8)
        with TFRecordWriter(p) as w:
            for i in range(4):
                w.write(make_uint8_example(clip, i))
        ds = make_tf_dataset([p], batch_size=2)
        videos, labels = next(iter(ds))
        assert videos.shape == (2, 5, 224, 224, 3)
        assert videos.dtype == tf.uint8


class TestGrainPipeline:
    def test_grain_batches(self, rng, tmp_path):
        pytest.importorskip("grain")
        from flickering_adversarial_video_tpu.data.grain_pipeline import (
            build_record_index,
            grain_batches,
        )

        paths = []
        for s in range(2):
            p = str(tmp_path / f"g{s}.tfrecords")
            with TFRecordWriter(p) as w:
                for i in range(3):
                    w.write(make_uint8_example(random_clip(rng, t=5), s * 3 + i))
            paths.append(p)

        index = build_record_index(paths)
        assert len(index) == 6

        batches = list(
            grain_batches(paths, 2, frames=4, height=6, width=6, shuffle=False)
        )
        assert len(batches) == 3
        assert batches[0]["video"].shape == (2, 4, 6, 6, 3)
        assert batches[0]["video"].dtype == np.uint8
        all_labels = sorted(int(l) for b in batches for l in b["labels"])
        assert all_labels == list(range(6))

    def test_grain_shuffle_deterministic(self, rng, tmp_path):
        pytest.importorskip("grain")
        from flickering_adversarial_video_tpu.data.grain_pipeline import grain_batches

        p = str(tmp_path / "gs.tfrecords")
        with TFRecordWriter(p) as w:
            for i in range(8):
                w.write(make_uint8_example(random_clip(rng, t=2), i))
        order1 = [int(l) for b in grain_batches([p], 2, height=6, width=6, seed=3) for l in b["labels"]]
        order2 = [int(l) for b in grain_batches([p], 2, height=6, width=6, seed=3) for l in b["labels"]]
        assert order1 == order2
        assert sorted(order1) == list(range(8))

    def test_grain_epoch_loader_exact_epochs(self, rng, tmp_path):
        """GrainEpochLoader (the epoch_fit pairing, VERDICT r4 item 7):
        persistent workers, EXACT epoch boundaries — every epoch_batches()
        call yields each record exactly once, per-epoch shuffle orders
        differ, the loader errors past its epoch budget, and worker_count
        does not change the sequence (grain's deterministic round-robin
        reconstructs the sampler's global order in the parent)."""
        pytest.importorskip("grain")
        from flickering_adversarial_video_tpu.data.grain_pipeline import (
            GrainEpochLoader,
        )

        p = str(tmp_path / "ge.tfrecords")
        n = 9
        with TFRecordWriter(p) as w:
            for i in range(n):
                w.write(make_uint8_example(random_clip(rng, t=2), i))

        def epoch_labels(loader):
            return [
                int(l) for b in loader.epoch_batches() for l in b["labels"]
            ]

        loader = GrainEpochLoader(
            [p], 2, epochs=2, height=6, width=6, seed=5, worker_count=0,
            drop_remainder=False,
        )
        e1 = epoch_labels(loader)
        e2 = epoch_labels(loader)
        assert sorted(e1) == list(range(n))
        assert sorted(e2) == list(range(n))
        assert e1 != e2  # per-epoch reshuffle
        with pytest.raises(RuntimeError, match="exhausted"):
            next(loader.epoch_batches())

        # drop_remainder=True drops the 9th record's partial batch
        loader_dr = GrainEpochLoader(
            [p], 2, epochs=1, height=6, width=6, seed=5, worker_count=0
        )
        assert len(epoch_labels(loader_dr)) == 8

        # multi-worker run reproduces the worker_count=0 sequence exactly
        loader_w = GrainEpochLoader(
            [p], 2, epochs=2, height=6, width=6, seed=5, worker_count=2,
            drop_remainder=False,
        )
        assert epoch_labels(loader_w) == e1
        assert epoch_labels(loader_w) == e2
