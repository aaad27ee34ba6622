"""Host-prepacked input path: packing parity + engine equivalence.

The host pipeline may deliver the video already space-to-depth packed
(data/packing.py numpy, native/tfrecord_reader.cc C++); the engine's
prepacked path must produce the exact trajectory of the standard path.
"""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flickering_adversarial_video_tpu.attack import FlickerSpec
from flickering_adversarial_video_tpu.data.packing import pack_video_np
from flickering_adversarial_video_tpu.data.tfrecord import (
    TFRecordWriter,
    make_uint8_example,
    tfrecord_batches,
)
from flickering_adversarial_video_tpu.engine import (
    AttackConfig,
    AttackEngine,
    RuntimeFlags,
)
from flickering_adversarial_video_tpu.models.i3d import InceptionI3D, init_i3d_params
from flickering_adversarial_video_tpu.ops.space_to_depth import pack_input


@pytest.fixture
def rng():
    return np.random.default_rng(11)


class TestHostPacking:
    def test_numpy_pack_matches_jax_pack_input(self, rng):
        v = rng.integers(0, 256, (2, 6, 8, 10, 3), dtype=np.uint8)
        ref = np.asarray(pack_input(jnp.asarray(v), axes=(1, 2, 3)))
        got = pack_video_np(v)
        np.testing.assert_array_equal(got, ref)
        # single-clip form
        ref1 = np.asarray(pack_input(jnp.asarray(v[0:1]), axes=(1, 2, 3)))[0]
        np.testing.assert_array_equal(pack_video_np(v[0]), ref1)

    def test_native_packed_read_matches_numpy(self, rng, tmp_path):
        pytest.importorskip("ctypes")
        try:
            from flickering_adversarial_video_tpu.data.native_reader import (
                NativeTFRecordReader,
            )

            reader = NativeTFRecordReader(height=12, width=16)
        except ImportError:
            pytest.skip("native reader unavailable")
        path = str(tmp_path / "a.tfrecord")
        clips = [
            rng.integers(0, 256, (8, 12, 16, 3), dtype=np.uint8) for _ in range(3)
        ]
        with TFRecordWriter(path) as w:
            for i, c in enumerate(clips):
                w.write(make_uint8_example(c, i))
        got = list(reader.read_parsed_packed(path, frames=6))
        assert len(got) == 3
        for i, (packed, label) in enumerate(got):
            assert label == i
            np.testing.assert_array_equal(packed, pack_video_np(clips[i][-6:]))

    @pytest.mark.parametrize("use_native", [True, False])
    def test_tfrecord_batches_prepack(self, rng, tmp_path, use_native):
        path = str(tmp_path / "b.tfrecord")
        clips = [
            rng.integers(0, 256, (8, 12, 16, 3), dtype=np.uint8) for _ in range(4)
        ]
        with TFRecordWriter(path) as w:
            for i, c in enumerate(clips):
                w.write(make_uint8_example(c, i))
        plain = list(
            tfrecord_batches(
                [path], 2, frames=6, height=12, width=16, use_native=use_native
            )
        )
        packed = list(
            tfrecord_batches(
                [path], 2, frames=6, height=12, width=16,
                use_native=use_native, prepack=True,
            )
        )
        assert len(plain) == len(packed) == 2
        for bp, bq in zip(plain, packed):
            np.testing.assert_array_equal(bq["labels"], bp["labels"])
            np.testing.assert_array_equal(
                bq["video_packed"], pack_video_np(bp["video"])
            )

    @pytest.mark.parametrize("use_native", [True, False])
    def test_tfrecord_batches_view(self, rng, tmp_path, use_native):
        from flickering_adversarial_video_tpu.data.packing import pack_batch_view_np

        path = str(tmp_path / "v.tfrecord")
        clips = [
            rng.integers(0, 256, (8, 12, 16, 3), dtype=np.uint8) for _ in range(4)
        ]
        with TFRecordWriter(path) as w:
            for i, c in enumerate(clips):
                w.write(make_uint8_example(c, i))
        plain = list(
            tfrecord_batches(
                [path], 2, frames=6, height=12, width=16, use_native=use_native
            )
        )
        view = list(
            tfrecord_batches(
                [path], 2, frames=6, height=12, width=16,
                use_native=use_native, prepack="view",
            )
        )
        assert len(plain) == len(view) == 2
        for bp, bv in zip(plain, view):
            np.testing.assert_array_equal(bv["labels"], bp["labels"])
            assert set(bv) == {"video_view", "labels"}
            np.testing.assert_array_equal(
                bv["video_view"], pack_batch_view_np(bp["video"])
            )


class TestEnginePrepacked:
    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_prepacked_trajectory_matches_standard(self, rng):
        frames, size, k = 8, 16, 7
        model = InceptionI3D(num_classes=k, compute_dtype=jnp.float32)
        packed_model = InceptionI3D(
            num_classes=k, compute_dtype=jnp.float32, prepacked_stem_input=True
        )
        variables = init_i3d_params(
            jax.random.key(2), num_classes=k, frames=frames, size=size
        )
        spec = FlickerSpec(frames=frames)
        engine = AttackEngine(
            lambda v, x: model.apply(v, x)[0],
            variables,
            spec,
            AttackConfig(),
            apply_packed_fn=lambda v, xp: packed_model.apply(v, xp)[0],
        )
        video = rng.integers(0, 256, (2, frames, size, size, 3), dtype=np.uint8)
        labels = jnp.asarray(rng.integers(0, k, (2,)))
        flags = RuntimeFlags()
        key = jax.random.key(0)

        def run(batch):
            state = engine.init_state()
            outs = []
            for _ in range(3):
                state, m = engine.train_step(state, batch, flags, key)
                outs.append((np.asarray(state.delta), float(m["total_loss"])))
            return outs

        std = run({"video": jnp.asarray(video), "labels": labels})
        pre = run(
            {"video_packed": jnp.asarray(pack_video_np(video)), "labels": labels}
        )
        for (d1, l1), (d2, l2) in zip(std, pre):
            assert l2 == pytest.approx(l1, rel=1e-6)
            np.testing.assert_allclose(d2, d1, rtol=1e-5, atol=1e-8)

        # eval path
        delta = jnp.asarray(rng.uniform(-0.3, 0.3, (frames, 1, 1, 3)).astype(np.float32))
        e1 = engine.eval_step(delta, {"video": jnp.asarray(video), "labels": labels}, flags, key)
        e2 = engine.eval_step(
            delta,
            {"video_packed": jnp.asarray(pack_video_np(video)), "labels": labels},
            flags,
            key,
        )
        assert int(e1["miss"]) == int(e2["miss"])
        assert int(e1["valid"]) == int(e2["valid"])

    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_fused_stem_head_trajectory_matches(self, rng):
        """stem_head= (ops/packed_apply.flicker_stem_head): preprocess AND
        the stem conv+BN+relu fused into one custom-VJP op must reproduce the
        standard prepacked path's trajectory (tap-sum association differs at
        float rounding only) and its clean forward bit-exactly."""
        from flickering_adversarial_video_tpu.models.i3d import build_stem_head

        frames, size, k = 8, 16, 7
        model = InceptionI3D(num_classes=k, compute_dtype=jnp.float32)
        packed_model = InceptionI3D(
            num_classes=k, compute_dtype=jnp.float32, prepacked_stem_input=True
        )
        variables = init_i3d_params(
            jax.random.key(2), num_classes=k, frames=frames, size=size
        )
        spec = FlickerSpec(frames=frames)

        def mk(stem_head):
            return AttackEngine(
                lambda v, x: model.apply(v, x)[0],
                variables,
                spec,
                AttackConfig(),
                apply_packed_fn=lambda v, xp: packed_model.apply(v, xp)[0],
                stem_head=stem_head,
            )

        e0 = mk(None)
        e1 = mk(build_stem_head(variables, num_classes=k, compute_dtype=jnp.float32))
        video = rng.integers(0, 256, (2, frames, size, size, 3), dtype=np.uint8)
        batch = {
            "video_packed": jnp.asarray(pack_video_np(video)),
            "labels": jnp.asarray(rng.integers(0, k, (2,))),
        }
        flags = RuntimeFlags()
        key = jax.random.key(0)
        s0, s1 = e0.init_state(), e1.init_state()
        for _ in range(3):
            s0, m0 = e0.train_step(s0, batch, flags, key)
            s1, m1 = e1.train_step(s1, batch, flags, key)
            assert float(m1["total_loss"]) == pytest.approx(
                float(m0["total_loss"]), rel=1e-6
            )
        np.testing.assert_allclose(
            np.asarray(s1.delta), np.asarray(s0.delta), rtol=1e-5, atol=1e-8
        )
        l0 = np.asarray(e0._packed_logits(None, batch["video_packed"], flags, prepacked=True))
        l1 = np.asarray(e1._packed_logits(None, batch["video_packed"], flags, prepacked=True))
        np.testing.assert_array_equal(l0, l1)
        # eval counters through the fused head
        delta = jnp.asarray(
            rng.uniform(-0.3, 0.3, (frames, 1, 1, 3)).astype(np.float32)
        )
        ev0 = e0.eval_step(delta, batch, flags, key)
        ev1 = e1.eval_step(delta, batch, flags, key)
        assert int(ev0["miss"]) == int(ev1["miss"])
        assert int(ev0["valid"]) == int(ev1["valid"])

    def test_prepacked_without_packed_fn_raises(self, rng):
        frames, size = 8, 16
        model = InceptionI3D(num_classes=5, compute_dtype=jnp.float32)
        variables = init_i3d_params(
            jax.random.key(0), num_classes=5, frames=frames, size=size
        )
        engine = AttackEngine(
            lambda v, x: model.apply(v, x)[0],
            variables,
            FlickerSpec(frames=frames),
            AttackConfig(),
        )
        video = rng.integers(0, 256, (1, frames, size, size, 3), dtype=np.uint8)
        batch = {
            "video_packed": jnp.asarray(pack_video_np(video)),
            "labels": jnp.asarray([0]),
        }
        with pytest.raises(ValueError, match="video_packed"):
            engine.train_step(
                engine.init_state(), batch, RuntimeFlags(), jax.random.key(0)
            )
