"""Vectorized per-video sweep (engine/vector_sweep.py).

The load-bearing claim is EXACT equivalence with the sequential sweep: N
slots of vmapped per-clip steps (own delta, own Adam state, own stop rule /
escalation counters) must reproduce engine.sweep.fit_single_video's
trajectories for the same seeds — Adam is elementwise and each delta only
touches its own clip, so vectorization is exact up to batched-op float
reassociation.  Asserted per video over full per-step histories.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flickering_adversarial_video_tpu.attack import TorchStyleFlickerSpec
from flickering_adversarial_video_tpu.engine import (
    AttackConfig,
    AttackEngine,
    RuntimeFlags,
)
from flickering_adversarial_video_tpu.engine.sweep import (
    fit_many_videos,
    result_path_for,
)
from flickering_adversarial_video_tpu.engine.vector_sweep import (
    VectorSweepEngine,
    vector_fit_many_videos,
)

FRAMES, SIZE = 4, 8
LABEL_NAMES = [f"class {i}" for i in range(40)]


def victim():
    w = jax.random.normal(jax.random.key(11), (3, 40)) * 3.0

    def apply_fn(variables, x):
        return jnp.mean(x, axis=(1, 2, 3)) @ variables["w"]

    return apply_fn, {"w": w}


def make_engine():
    apply_fn, variables = victim()
    spec = TorchStyleFlickerSpec(frames=FRAMES, max_norm=0.2)
    cfg = AttackConfig(norm_world="meanstd", reg_weighting="torch")
    return AttackEngine(apply_fn, variables, spec, cfg, track_probs=False)


def self_labeled_batches(engine, n, start_seed=0):
    rng = np.random.default_rng(17)
    out = []
    zero = engine.init_state(jax.random.key(0)).delta
    for i in range(n):
        video = rng.integers(0, 255, (1, FRAMES, SIZE, SIZE, 3), dtype=np.uint8)
        probs = engine.forward(
            zero,
            {"video": jnp.asarray(video), "labels": jnp.zeros((1,), jnp.int32)},
            RuntimeFlags(max_norm=0.2),
            jax.random.key(0),
            adversarial=False,
        )
        out.append(
            {
                "video": video,
                "labels": np.asarray(jnp.argmax(probs, -1)),
                "paths": [f"v{start_seed + i}.mp4"],
            }
        )
    return out


N_ITER = 6


class TestEquivalenceWithSequential:
    def test_matches_sequential_sweep(self, tmp_path):
        engine = make_engine()
        batches = self_labeled_batches(engine, 3)
        flags = RuntimeFlags(max_norm=0.2)

        seq_dir = str(tmp_path / "seq")
        vec_dir = str(tmp_path / "vec")
        seq = fit_many_videos(
            engine,
            batches,
            flags,
            model_dir=seq_dir,
            label_names=LABEL_NAMES,
            n_iter=N_ITER,
            max_norm=0.2,
        )
        vec = vector_fit_many_videos(
            engine,
            batches,
            flags,
            model_dir=vec_dir,
            label_names=LABEL_NAMES,
            slots=2,
            chunk=5,
            n_iter=N_ITER,
            max_norm=0.2,
        )
        assert seq["attacked"] == vec["attacked"] == 3
        for b in batches:
            name = LABEL_NAMES[int(b["labels"][0])]
            seq_res = np.load(
                result_path_for(seq_dir, b["paths"][0], name), allow_pickle=True
            ).tolist()
            vec_res = np.load(
                result_path_for(vec_dir, b["paths"][0], name), allow_pickle=True
            ).tolist()
            assert len(seq_res["loss/total"]) == len(vec_res["loss/total"])
            assert seq_res["is_adversarial"] == vec_res["is_adversarial"]
            assert seq_res["escalations"] == vec_res["escalations"]
            np.testing.assert_allclose(
                seq_res["final_max_norm"], vec_res["final_max_norm"], rtol=1e-6
            )
            for k in (
                "loss/total",
                "loss/adv_loss",
                "loss/reg_loss",
                "perturbation/thickness",
                "perturbation/roughness",
            ):
                np.testing.assert_allclose(
                    seq_res[k], vec_res[k], atol=2e-5, rtol=1e-4, err_msg=k
                )
            np.testing.assert_allclose(
                np.asarray(seq_res["perturbation"]),
                np.asarray(vec_res["perturbation"]),
                atol=1e-4,
                err_msg="per-step delta history",
            )

    def test_escalation_parity_unfoolable(self, tmp_path):
        """A clip whose label can never be missed (targeted at its own argmax
        is impossible here, so force never-fooled via a wrong high-margin
        setup): every chance escalates; counters must match sequential."""
        engine = make_engine()
        [b] = self_labeled_batches(engine, 1)
        # make it unfoolable within the tiny budget by shrinking the lr to ~0
        flags = RuntimeFlags(max_norm=0.2, learning_rate=1e-12)
        seq_dir, vec_dir = str(tmp_path / "s"), str(tmp_path / "v")
        fit_many_videos(
            engine, [b], flags, model_dir=seq_dir, label_names=LABEL_NAMES,
            n_iter=3, max_norm=0.2,
        )
        vector_fit_many_videos(
            engine, [b], flags, model_dir=vec_dir, label_names=LABEL_NAMES,
            slots=2, chunk=4, n_iter=3, max_norm=0.2,
        )
        name = LABEL_NAMES[int(b["labels"][0])]
        s = np.load(result_path_for(seq_dir, b["paths"][0], name), allow_pickle=True).tolist()
        v = np.load(result_path_for(vec_dir, b["paths"][0], name), allow_pickle=True).tolist()
        assert s["escalations"] == v["escalations"] == 4
        assert len(s["loss/total"]) == len(v["loss/total"])
        np.testing.assert_allclose(s["final_max_norm"], v["final_max_norm"], rtol=1e-6)


class TestTFWorldSingleVideo:
    """vector_single_video_attacks vs loops.single_video_attack — the TF
    single-video stop rule (`step > max_step AND fooled`, zero-init delta,
    richer pkl-schema history) must vectorize exactly too."""

    @staticmethod
    def make_tanh_engine():
        from flickering_adversarial_video_tpu.attack import FlickerSpec

        w = jax.random.normal(jax.random.key(5), (3, 40)) * 3.0

        def apply_fn(variables, x):
            return jnp.mean(x, axis=(1, 2, 3)) @ variables["w"]

        spec = FlickerSpec(frames=FRAMES)
        cfg = AttackConfig(norm_world="tanh")
        return AttackEngine(apply_fn, {"w": w}, spec, cfg, track_probs=True)

    def test_matches_sequential_single_video(self):
        from flickering_adversarial_video_tpu.engine.loops import (
            single_video_attack,
        )
        from flickering_adversarial_video_tpu.engine.vector_sweep import (
            vector_single_video_attacks,
        )

        engine = self.make_tanh_engine()
        rng = np.random.default_rng(23)
        clips, labels = [], []
        zero = engine.init_state().delta
        for _ in range(3):
            clip = rng.uniform(-1, 1, (FRAMES, SIZE, SIZE, 3)).astype(np.float32)
            probs = engine.forward(
                zero,
                {"video": clip[None], "labels": np.zeros((1,), np.int64)},
                RuntimeFlags(),
                jax.random.key(0),
                adversarial=False,
            )
            clips.append(clip)
            labels.append(int(np.argmax(np.asarray(probs))))
        flags = RuntimeFlags()
        max_step = 5

        seq = [
            single_video_attack(
                engine, c, l, flags, max_step=max_step, seed=k
            )
            for k, (c, l) in enumerate(zip(clips, labels))
        ]
        vec = vector_single_video_attacks(
            engine, clips, labels, flags, slots=2, chunk=4, max_step=max_step
        )
        assert all(r is not None for r in seq)
        for s, v in zip(seq, vec):
            assert v is not None
            assert s["total_steps"] == v["total_steps"]
            assert s["is_adversarial"] == v["is_adversarial"]
            assert len(s["total_loss_l"]) == len(v["total_loss_l"])
            for key in ("total_loss_l", "adv_loss_l", "reg_loss_l",
                        "norm_reg_loss_l", "diff_norm_reg_loss_l",
                        "fatness", "smoothness"):
                np.testing.assert_allclose(
                    s[key], v[key], atol=2e-5, rtol=1e-4, err_msg=key
                )
            np.testing.assert_allclose(
                np.asarray(s["perturbation"]),
                np.asarray(v["perturbation"]),
                atol=1e-4,
            )
            np.testing.assert_allclose(
                np.asarray(s["softmax"]), np.asarray(v["softmax"]),
                atol=2e-5,
            )
            np.testing.assert_allclose(
                s["adv_video"], v["adv_video"], atol=1e-4
            )
            np.testing.assert_allclose(
                s["final_delta"], v["final_delta"], atol=1e-4
            )

    def test_misclassified_slot_is_none(self):
        from flickering_adversarial_video_tpu.engine.vector_sweep import (
            vector_single_video_attacks,
        )

        engine = self.make_tanh_engine()
        rng = np.random.default_rng(29)
        clip = rng.uniform(-1, 1, (FRAMES, SIZE, SIZE, 3)).astype(np.float32)
        probs = engine.forward(
            engine.init_state().delta,
            {"video": clip[None], "labels": np.zeros((1,), np.int64)},
            RuntimeFlags(),
            jax.random.key(0),
            adversarial=False,
        )
        good = int(np.argmax(np.asarray(probs)))
        wrong = (good + 1) % 40
        out = vector_single_video_attacks(
            engine, [clip, clip], [wrong, good], RuntimeFlags(),
            slots=2, chunk=3, max_step=2,
        )
        assert out[0] is None
        assert out[1] is not None and out[1]["correct_cls_id"] == good


class TestPackedPathVectorizes:
    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_i3d_packed_apply_under_vmap(self):
        """The packed-space custom-VJP apply (ops/packed_apply.py) must trace
        and run under the vmapped vector sweep — the TPU session's vector
        bench (scripts/tpu_session_r3.sh step 3a) relies on it.  Values must
        match the generic uint8 path per slot."""
        from flickering_adversarial_video_tpu.attack import FlickerSpec
        from flickering_adversarial_video_tpu.models.i3d import (
            InceptionI3D,
            init_i3d_params,
        )

        frames, size, slots = 8, 32, 2
        model = InceptionI3D(num_classes=400, compute_dtype=jnp.float32)
        packed = InceptionI3D(
            num_classes=400, compute_dtype=jnp.float32, prepacked_stem_input=True
        )
        variables = init_i3d_params(jax.random.key(0), frames=frames, size=size)
        base = dict(
            spec=FlickerSpec(frames=frames),
            config=AttackConfig(),
            track_probs=False,
        )
        eng_packed = AttackEngine(
            lambda v, x: model.apply(v, x)[0],
            variables,
            base["spec"],
            base["config"],
            track_probs=False,
            apply_packed_fn=lambda v, xp: packed.apply(v, xp)[0],
        )
        eng_plain = AttackEngine(
            lambda v, x: model.apply(v, x)[0],
            variables,
            base["spec"],
            base["config"],
            track_probs=False,
        )
        rng = np.random.default_rng(0)
        videos = jnp.asarray(
            rng.integers(0, 255, (slots, frames, size, size, 3), dtype=np.uint8)
        )
        labels = jnp.asarray(rng.integers(0, 400, (slots,), dtype=np.int32))
        keys = jax.vmap(jax.random.key)(jnp.arange(slots, dtype=jnp.uint32))
        flags = RuntimeFlags(max_norm=0.4)
        outs = []
        for eng in (eng_packed, eng_plain):
            vse = VectorSweepEngine(eng, slots, n_iter=10**9)
            state = vse.init_slots(list(range(slots)))
            for i in range(slots):
                state = vse.refill_slot(state, i, i, 0.4)
            state, ys = vse.run_chunk(state, videos, labels, keys, flags, 2)
            outs.append((np.asarray(state.delta), np.asarray(ys["total_loss"])))
        np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-5)


class TestMeshShardedSweep:
    def test_mesh_matches_unsharded(self, tmp_path):
        """Slot axis sharded over the 8-device CPU mesh: per-video results
        must equal the unsharded run — the slots are independent, so sharding
        them is pure scale-out with zero collectives."""
        from flickering_adversarial_video_tpu.parallel.mesh import make_mesh

        engine = make_engine()
        batches = self_labeled_batches(engine, 3)
        flags = RuntimeFlags(max_norm=0.2)
        plain_dir = str(tmp_path / "plain")
        mesh_dir = str(tmp_path / "mesh")
        kw = dict(
            flags=flags,
            label_names=LABEL_NAMES,
            slots=8,
            chunk=5,
            n_iter=N_ITER,
            max_norm=0.2,
        )
        plain = vector_fit_many_videos(engine, batches, model_dir=plain_dir, **kw)
        meshed = vector_fit_many_videos(
            engine, batches, model_dir=mesh_dir, mesh=make_mesh(), **kw
        )
        assert plain["attacked"] == meshed["attacked"] == 3
        for b in batches:
            name = LABEL_NAMES[int(b["labels"][0])]
            p = np.load(
                result_path_for(plain_dir, b["paths"][0], name), allow_pickle=True
            ).tolist()
            m = np.load(
                result_path_for(mesh_dir, b["paths"][0], name), allow_pickle=True
            ).tolist()
            assert p["is_adversarial"] == m["is_adversarial"]
            assert p["escalations"] == m["escalations"]
            np.testing.assert_allclose(
                p["loss/total"], m["loss/total"], atol=2e-5, rtol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(p["perturbation"]),
                np.asarray(m["perturbation"]),
                atol=1e-4,
            )

    def test_slots_must_divide_mesh(self):
        from flickering_adversarial_video_tpu.parallel.mesh import make_mesh

        engine = make_engine()
        with pytest.raises(ValueError, match="multiple of the mesh size"):
            VectorSweepEngine(engine, 3, mesh=make_mesh())


class TestSweepBookkeeping:
    def test_ledger_skip_and_misclassified(self, tmp_path):
        engine = make_engine()
        batches = self_labeled_batches(engine, 2)
        # video 0: pre-existing adversarial result -> skipped_existing
        name0 = LABEL_NAMES[int(batches[0]["labels"][0])]
        dest0 = result_path_for(str(tmp_path), batches[0]["paths"][0], name0)
        np.save(dest0, {"is_adversarial": [True]})
        # video 1: wrong label -> skipped_misclassified, placeholder left
        batches[1]["labels"] = (batches[1]["labels"] + 1) % 40
        out = vector_fit_many_videos(
            engine,
            batches,
            RuntimeFlags(max_norm=0.2),
            model_dir=str(tmp_path),
            label_names=LABEL_NAMES,
            slots=2,
            chunk=3,
            n_iter=2,
            max_norm=0.2,
        )
        assert out["skipped_existing"] == 1
        assert out["skipped_misclassified"] == 1
        assert out["attacked"] == 0
        name1 = LABEL_NAMES[int(batches[1]["labels"][0])]
        dest1 = result_path_for(str(tmp_path), batches[1]["paths"][0], name1)
        assert os.path.exists(dest1)  # None placeholder (model.py:942-943)
        assert np.load(dest1, allow_pickle=True).tolist() is None

    def test_max_videos_cap(self, tmp_path):
        engine = make_engine()
        batches = self_labeled_batches(engine, 3)
        out = vector_fit_many_videos(
            engine,
            batches,
            RuntimeFlags(max_norm=0.2),
            model_dir=str(tmp_path),
            label_names=LABEL_NAMES,
            slots=2,
            chunk=4,
            n_iter=2,
            max_videos=2,
            max_norm=0.2,
        )
        assert out["attacked"] == 2

    def test_more_slots_than_videos(self, tmp_path):
        engine = make_engine()
        batches = self_labeled_batches(engine, 2)
        out = vector_fit_many_videos(
            engine,
            batches,
            RuntimeFlags(max_norm=0.2),
            model_dir=str(tmp_path),
            label_names=LABEL_NAMES,
            slots=4,
            chunk=4,
            n_iter=2,
            max_norm=0.2,
        )
        assert out["attacked"] == 2
