"""Packed-preprocess fast-path exactness (ops/packed_apply.py).

The fused uint8-normalize + delta-apply in space-to-depth layout must be a
pure permutation of the reference-semantics unpacked path
(attack/perturbation.py apply_perturbation over _normalize): values equal
exactly, gradients equal up to f32 reduction reassociation, and the engine's
packed train step must reproduce the generic step's trajectory.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flickering_adversarial_video_tpu.attack import FlickerSpec
from flickering_adversarial_video_tpu.attack import perturbation as pert_lib
from flickering_adversarial_video_tpu.engine import (
    AttackConfig,
    AttackEngine,
    RuntimeFlags,
)
from flickering_adversarial_video_tpu.models.i3d import InceptionI3D, init_i3d_params
from flickering_adversarial_video_tpu.ops.packed_apply import (
    apply_flicker_packed,
    pack_flicker_delta,
    packable,
)
from flickering_adversarial_video_tpu.ops.space_to_depth import pack_input


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _u8_video(rng, b=2, t=8, h=12, w=12):
    return jnp.asarray(rng.integers(0, 256, (b, t, h, w, 3), dtype=np.uint8))


def _delta(rng, t=8, scale=0.6):
    # exceeds the 0.4 clip on some entries so the clip path is exercised
    return jnp.asarray(rng.uniform(-scale, scale, (t, 1, 1, 3)).astype(np.float32))


class TestPackedApplyMath:
    def test_pack_flicker_delta_matches_pack_input(self, rng):
        t = 8
        d = _delta(rng, t)
        # broadcast delta to a full video and pack it with the generic packer
        vid = jnp.broadcast_to(d[None], (1, t, 4, 4, 3))
        expected = pack_input(vid, axes=(1, 2, 3))  # [1, t/2, 2, 2, 24]
        got = pack_flicker_delta(d)  # [t/2, 1, 1, 24]
        np.testing.assert_array_equal(
            np.asarray(expected[0, :, 0, 0, :]), np.asarray(got[:, 0, 0, :])
        )

    def test_forward_is_permutation_of_unpacked(self, rng):
        video = _u8_video(rng)
        spec = FlickerSpec(frames=8)
        delta = _delta(rng)
        clipped = pert_lib.clip_delta(spec, delta)
        x = video.astype(jnp.float32) / 128.0 - 1.0
        adv = pert_lib.apply_perturbation(x, delta, spec, adv_flag=1.0)
        expected = pack_input(adv, axes=(1, 2, 3))
        got = apply_flicker_packed(video, clipped, jnp.float32(1.0), -1.0, 1.0)
        np.testing.assert_array_equal(np.asarray(expected), np.asarray(got))

    def test_adv_flag_zero_gives_clean(self, rng):
        video = _u8_video(rng)
        clipped = jnp.zeros((8, 1, 1, 3), jnp.float32)
        got = apply_flicker_packed(video, clipped, jnp.float32(0.0), -1.0, 1.0)
        expected = pack_input(
            video.astype(jnp.float32) / 128.0 - 1.0, axes=(1, 2, 3)
        )
        np.testing.assert_array_equal(np.asarray(expected), np.asarray(got))

    def test_gradient_matches_unpacked(self, rng):
        video = _u8_video(rng)
        spec = FlickerSpec(frames=8)
        delta = _delta(rng)
        # downstream weight makes the cotangent non-uniform
        wkey = jax.random.normal(jax.random.key(0), (2, 8, 12, 12, 3))
        wpk = pack_input(wkey, axes=(1, 2, 3))

        def loss_packed(d):
            clipped = pert_lib.clip_delta(spec, d)
            out = apply_flicker_packed(video, clipped, jnp.float32(1.0), -1.0, 1.0)
            return jnp.sum(out * wpk)

        def loss_unpacked(d):
            x = video.astype(jnp.float32) / 128.0 - 1.0
            adv = pert_lib.apply_perturbation(x, d, spec, adv_flag=1.0)
            return jnp.sum(adv * wkey)

        gp = jax.grad(loss_packed)(delta)
        gu = jax.grad(loss_unpacked)(delta)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gu), rtol=1e-5, atol=1e-6)

    def test_packable(self):
        assert packable((2, 8, 12, 12, 3))
        assert not packable((2, 7, 12, 12, 3))
        assert not packable((2, 8, 11, 12, 3))


class TestPrepackedI3D:
    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_prepacked_model_matches_unpacked(self, rng):
        frames, size = 8, 16
        model = InceptionI3D(num_classes=11, compute_dtype=jnp.float32)
        packed_model = InceptionI3D(
            num_classes=11, compute_dtype=jnp.float32, prepacked_stem_input=True
        )
        variables = init_i3d_params(
            jax.random.key(1), num_classes=11, frames=frames, size=size
        )
        x = jnp.asarray(
            rng.uniform(-1, 1, (2, frames, size, size, 3)).astype(np.float32)
        )
        ref, _ = jax.jit(model.apply)(variables, x)
        got, _ = jax.jit(packed_model.apply)(variables, pack_input(x, axes=(1, 2, 3)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


class TestEnginePackedPath:
    def _trajectory(self, engine, batch, steps=4):
        flags = RuntimeFlags()
        key = jax.random.key(0)
        state = engine.init_state()
        deltas, losses = [], []
        for _ in range(steps):
            state, m = engine.train_step(state, batch, flags, key)
            deltas.append(np.asarray(state.delta))
            losses.append(float(m["total_loss"]))
        return deltas, losses

    def _engines(self, frames=8, size=16, num_classes=7):
        model = InceptionI3D(num_classes=num_classes, compute_dtype=jnp.float32)
        packed_model = InceptionI3D(
            num_classes=num_classes,
            compute_dtype=jnp.float32,
            prepacked_stem_input=True,
        )
        variables = init_i3d_params(
            jax.random.key(2), num_classes=num_classes, frames=frames, size=size
        )
        spec = FlickerSpec(frames=frames)
        apply_fn = lambda v, x: model.apply(v, x)[0]
        plain = AttackEngine(apply_fn, variables, spec, AttackConfig())
        packed = AttackEngine(
            apply_fn,
            variables,
            spec,
            AttackConfig(),
            apply_packed_fn=lambda v, xp: packed_model.apply(v, xp)[0],
        )
        return plain, packed

    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_train_trajectory_matches_generic(self, rng):
        plain, packed = self._engines()
        batch = {
            "video": _u8_video(rng, b=2, t=8, h=16, w=16),
            "labels": jnp.asarray(rng.integers(0, 7, (2,))),
        }
        d_plain, l_plain = self._trajectory(plain, batch)
        d_packed, l_packed = self._trajectory(packed, batch)
        np.testing.assert_allclose(l_packed, l_plain, rtol=1e-5)
        np.testing.assert_allclose(d_packed[-1], d_plain[-1], rtol=1e-4, atol=1e-7)

    def test_eval_counters_match_generic(self, rng):
        plain, packed = self._engines()
        batch = {
            "video": _u8_video(rng, b=4, t=8, h=16, w=16),
            "labels": jnp.asarray(rng.integers(0, 7, (4,))),
        }
        flags = RuntimeFlags()
        key = jax.random.key(0)
        delta = jnp.asarray(
            rng.uniform(-0.3, 0.3, (8, 1, 1, 3)).astype(np.float32)
        )
        ev_p = plain.eval_step(delta, batch, flags, key)
        ev_q = packed.eval_step(delta, batch, flags, key)
        assert int(ev_p["miss"]) == int(ev_q["miss"])
        assert int(ev_p["valid"]) == int(ev_q["valid"])
        np.testing.assert_allclose(
            np.asarray(ev_q["adv_probs"]), np.asarray(ev_p["adv_probs"]),
            rtol=1e-5, atol=1e-6,
        )

    def test_odd_frames_fall_back(self, rng):
        # odd T -> packed path ineligible -> generic path must serve
        frames, size = 7, 16
        model = InceptionI3D(num_classes=5, compute_dtype=jnp.float32)
        variables = init_i3d_params(
            jax.random.key(3), num_classes=5, frames=frames, size=size
        )
        spec = FlickerSpec(frames=frames)
        engine = AttackEngine(
            lambda v, x: model.apply(v, x)[0],
            variables,
            spec,
            AttackConfig(),
            apply_packed_fn=lambda v, xp: (_ for _ in ()).throw(
                AssertionError("packed path must not engage for odd T")
            ),
        )
        batch = {
            "video": _u8_video(rng, b=1, t=frames, h=size, w=size),
            "labels": jnp.asarray([0]),
        }
        state = engine.init_state()
        state, m = engine.train_step(state, batch, RuntimeFlags(), jax.random.key(0))
        assert np.isfinite(float(m["total_loss"]))


class TestTorchWorldPackedPath:
    """Torch-world (mean/std) spatially-packed fast path: must reproduce the
    generic engine path exactly (ops/packed_apply.py apply_torch_flicker_packed)."""

    def _engines(self, frames=4, size=16, k=6):
        from flickering_adversarial_video_tpu.attack import TorchStyleFlickerSpec
        from flickering_adversarial_video_tpu.models.video_resnet import (
            VideoResNet,
            make_packed_apply_fn,
        )

        model = VideoResNet("r2plus1d_18", k, jnp.float32)
        variables = model.init(
            jax.random.key(4), jnp.zeros((1, frames, size, size, 3))
        )
        spec = TorchStyleFlickerSpec(frames=frames, max_norm=0.2)
        cfg = AttackConfig(norm_world="meanstd", reg_weighting="torch")
        plain = AttackEngine(model.apply, variables, spec, cfg)
        packed = AttackEngine(
            model.apply,
            variables,
            spec,
            cfg,
            apply_packed_fn=make_packed_apply_fn("r2plus1d_18", k, jnp.float32),
        )
        return plain, packed, spec

    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_train_trajectory_matches_generic(self, rng):
        plain, packed, _ = self._engines()
        batch = {
            "video": jnp.asarray(
                rng.integers(0, 256, (2, 4, 16, 16, 3), dtype=np.uint8)
            ),
            "labels": jnp.asarray(rng.integers(0, 6, (2,))),
        }
        flags = RuntimeFlags(max_norm=0.2)
        key = jax.random.key(0)

        def run(engine):
            state = engine.init_state(jax.random.key(7))
            outs = []
            for _ in range(3):
                state, m = engine.train_step(state, batch, flags, key)
                outs.append((np.asarray(state.delta), float(m["total_loss"])))
            return outs

        for (d1, l1), (d2, l2) in zip(run(plain), run(packed)):
            assert l2 == pytest.approx(l1, rel=1e-5)
            np.testing.assert_allclose(d2, d1, rtol=1e-4, atol=1e-8)

    def test_eval_counters_match_generic(self, rng):
        plain, packed, spec = self._engines()
        batch = {
            "video": jnp.asarray(
                rng.integers(0, 256, (3, 4, 16, 16, 3), dtype=np.uint8)
            ),
            "labels": jnp.asarray(rng.integers(0, 6, (3,))),
        }
        flags = RuntimeFlags(max_norm=0.2)
        key = jax.random.key(0)
        delta = jnp.asarray(
            rng.uniform(-0.3, 0.3, (4, 1, 1, 3)).astype(np.float32)
        )
        e1 = plain.eval_step(delta, batch, flags, key)
        e2 = packed.eval_step(delta, batch, flags, key)
        assert int(e1["miss"]) == int(e2["miss"])
        assert int(e1["valid"]) == int(e2["valid"])
        np.testing.assert_allclose(
            np.asarray(e2["clean_probs"]), np.asarray(e1["clean_probs"]),
            rtol=1e-5, atol=1e-6,
        )

    def test_prepacked_video_resnet_matches_unpacked(self, rng):
        from flickering_adversarial_video_tpu.models.video_resnet import VideoResNet
        from flickering_adversarial_video_tpu.ops.space_to_depth import pack_input

        model = VideoResNet("r3d_18", 5, jnp.float32)
        packed_model = VideoResNet(
            "r3d_18", 5, jnp.float32, prepacked_stem_input=True
        )
        variables = model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 3)))
        x = jnp.asarray(rng.standard_normal((2, 4, 16, 16, 3)).astype(np.float32))
        ref = model.apply(variables, x)
        got = packed_model.apply(variables, pack_input(x, axes=(2, 3)))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


class TestPrepackGating:
    def test_shard_batches_never_prepacks_torch_world(self, rng):
        """Regression: a torch-world engine supports the (device) packed path
        but must NOT receive host-prepacked (tanh 2x2x2 layout) batches from
        the tfrecord pipeline — the gating lives in make_shard_batches."""
        from flickering_adversarial_video_tpu.attack import TorchStyleFlickerSpec
        from flickering_adversarial_video_tpu.models.video_resnet import (
            VideoResNet,
            make_packed_apply_fn,
        )
        from flickering_adversarial_video_tpu.runners.common import make_shard_batches
        from flickering_adversarial_video_tpu.utils.config import AttrDict

        model = VideoResNet("r2plus1d_18", 5, jnp.float32)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 3)))
        engine = AttackEngine(
            model.apply,
            variables,
            TorchStyleFlickerSpec(frames=4, max_norm=0.2),
            AttackConfig(norm_world="meanstd", reg_weighting="torch"),
            apply_packed_fn=make_packed_apply_fn("r2plus1d_18", 5, jnp.float32),
        )
        assert engine._packed_supported()  # device-side packed path exists
        _, prepack = make_shard_batches(
            AttrDict({}), engine, lambda *a, **kw: iter(()),
            frames=4, size=16, batch_size=2,
        )
        assert prepack is False

    def test_shard_batches_view_selection(self, rng, monkeypatch):
        """make_shard_batches upgrades prepack -> 'view' exactly when the
        engine can definitely consume 'video_view' batches
        (engine.view_input_eligible): tmajor stem head, single device,
        VIEW_PREPACK_INPUT not disabled."""
        from flickering_adversarial_video_tpu.models.i3d import build_stem_head
        from flickering_adversarial_video_tpu.runners.common import make_shard_batches
        from flickering_adversarial_video_tpu.utils.config import AttrDict

        frames, size, k = 8, 16, 7
        model = InceptionI3D(num_classes=k, compute_dtype=jnp.float32)
        packed_model = InceptionI3D(
            num_classes=k, compute_dtype=jnp.float32, prepacked_stem_input=True
        )
        variables = init_i3d_params(
            jax.random.key(0), num_classes=k, frames=frames, size=size
        )

        def mk(stem_head):
            return AttackEngine(
                lambda v, x: model.apply(v, x)[0],
                variables,
                FlickerSpec(frames=frames),
                AttackConfig(),
                apply_packed_fn=lambda v, xp: packed_model.apply(v, xp)[0],
                stem_head=stem_head,
            )

        tmajor_head = build_stem_head(
            variables, num_classes=k, compute_dtype=jnp.float32, tmajor=True
        )
        engine = mk(tmajor_head)

        def select(cfg):
            _, prepack = make_shard_batches(
                AttrDict(cfg), engine, lambda *a, **kw: iter(()),
                frames=frames, size=size, batch_size=32,
            )
            return prepack

        # forced tmajor gate: eligible regardless of lane alignment/device
        monkeypatch.setenv("FLICKER_TMAJOR_HEAD", "1")
        assert select({}) == "view"
        assert select({"VIEW_PREPACK_INPUT": False}) is True
        # tmajor gate off: packed stays, view never selected
        monkeypatch.setenv("FLICKER_TMAJOR_HEAD", "0")
        assert select({}) is True
        # default env on CPU test hosts: alignment rule decides; 32*(8/2)=128
        # lanes is aligned, but multi-device test meshes make device_count>1
        monkeypatch.delenv("FLICKER_TMAJOR_HEAD", raising=False)
        expect = "view" if jax.device_count() == 1 else True
        assert select({}) == expect
        # no tmajor head -> never view
        monkeypatch.setenv("FLICKER_TMAJOR_HEAD", "1")
        assert mk(None).view_input_eligible(32, frames) is False
        # odd frames -> never view
        assert engine.view_input_eligible(32, frames + 1) is False


class TestTorchDeepStem:
    """Factor-4 spatial pack for the r2plus1d stems (deep stem): the packed
    conv with output sub-positions, the tiled BN, and the block-diagonal
    conv_t must reproduce the unpacked stem; the engine's factor choice must
    match advertised support + divisibility."""

    def test_pack_conv_spatial_s2_matches_stride2(self, rng):
        from flickering_adversarial_video_tpu.ops.space_to_depth import (
            depth_to_space_hw,
            pack_conv_spatial_s2,
            pack_input_factors,
        )

        x = jnp.asarray(rng.standard_normal((2, 3, 16, 16, 3)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((1, 7, 7, 3, 5)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 2, 2), [(0, 0), (3, 3), (3, 3)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        kp, ph, pw = pack_conv_spatial_s2(k, 3, 3)
        assert kp.shape == (1, 3, 3, 48, 20)
        yp = jax.lax.conv_general_dilated(
            pack_input_factors(x, (1, 4, 4)), kp, (1, 1, 1),
            [(0, 0), ph, pw], dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        np.testing.assert_allclose(
            np.asarray(depth_to_space_hw(yp, 2)), np.asarray(ref),
            rtol=1e-4, atol=1e-4,
        )

    def test_deep_prepacked_model_matches_unpacked(self, rng):
        from flickering_adversarial_video_tpu.models.video_resnet import (
            VideoResNet,
        )
        from flickering_adversarial_video_tpu.ops.space_to_depth import (
            pack_input_factors,
        )

        model = VideoResNet("r2plus1d_18", 5, jnp.float32)
        packed_model = VideoResNet(
            "r2plus1d_18", 5, jnp.float32, prepacked_stem_input=True
        )
        variables = model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 3)))
        x = jnp.asarray(rng.standard_normal((2, 4, 16, 16, 3)).astype(np.float32))
        ref = model.apply(variables, x)
        got = packed_model.apply(variables, pack_input_factors(x, (1, 4, 4)))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_pack_factor_choice(self, monkeypatch):
        from flickering_adversarial_video_tpu.ops.packed_apply import (
            torch_pack_factor,
        )

        def fn_deep(v, x):
            return x

        fn_deep.deep_stem = True

        def fn_classic(v, x):
            return x

        fn_classic.deep_stem = False

        monkeypatch.setenv("FLICKER_TORCH_DEEPSTEM", "1")
        assert torch_pack_factor((2, 4, 16, 16, 3), fn_deep) == 4
        # H not divisible by 4 -> classic
        assert torch_pack_factor((2, 4, 14, 14, 3), fn_deep) == 2
        # no deep-stem support -> classic
        assert torch_pack_factor((2, 4, 16, 16, 3), fn_classic) == 2

    def test_deep_gate_default_off_and_grads_match(self, rng, monkeypatch):
        """The deep pack defaults OFF (measured neutral at best on chip),
        and both factors must produce the same d(delta)."""
        from flickering_adversarial_video_tpu.ops.packed_apply import (
            apply_torch_flicker_packed,
            torch_pack_factor,
        )

        def fn(v, x):
            return x

        fn.deep_stem = True
        monkeypatch.delenv("FLICKER_TORCH_DEEPSTEM", raising=False)
        assert torch_pack_factor((2, 4, 16, 16, 3), fn) == 2

        video = jnp.asarray(rng.integers(0, 256, (2, 4, 16, 16, 3), dtype=np.uint8))
        delta = jnp.asarray(rng.uniform(-0.1, 0.1, (4, 1, 1, 3)).astype(np.float32))
        mean, std = (0.43, 0.39, 0.37), (0.22, 0.22, 0.21)

        def loss(d, factor):
            out = apply_torch_flicker_packed(
                video, d, jnp.float32(1.0), jnp.float32(0.2),
                mean, std, -2.0, 3.0, jnp.float32, factor,
            )
            return jnp.sum(out**2)

        g2 = jax.grad(lambda d: loss(d, 2))(delta)
        g4 = jax.grad(lambda d: loss(d, 4))(delta)
        np.testing.assert_allclose(
            np.asarray(g4), np.asarray(g2), rtol=1e-5, atol=1e-5
        )
