"""AttackEngine tests: fused step semantics + data-parallel equivalence.

Uses a tiny deterministic victim (linear readout of per-frame channel means)
so steps are fast on CPU and the attack's effect is analytically predictable.
The 8-device mesh test asserts the sharded step produces the same delta
trajectory as the single-device step — the psum-over-ICI gradient path is
exactly an all-reduce of per-shard sums, so results must match to float
tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flickering_adversarial_video_tpu.attack import (
    FlickerSpec,
    SparseSpec,
    TorchStyleFlickerSpec,
)
from flickering_adversarial_video_tpu.engine import (
    AttackConfig,
    AttackEngine,
    RuntimeFlags,
)
from flickering_adversarial_video_tpu.parallel import make_mesh


def linear_victim(num_classes=5):
    """logits = W @ mean_{T,H,W}(x) with fixed W: differentiable, fast."""
    key = jax.random.key(3)
    w = jax.random.normal(key, (3, num_classes)) * 2.0

    def apply_fn(variables, x):
        feats = jnp.mean(x, axis=(1, 2, 3))  # [B, C]
        return feats @ variables["w"]

    return apply_fn, {"w": w}


def make_batch(rng, b=4, t=6, h=8, w=8):
    video = (rng.uniform(0, 255, (b, t, h, w, 3))).astype(np.uint8)
    labels = rng.integers(0, 5, (b,))
    return {"video": jnp.asarray(video), "labels": jnp.asarray(labels)}


@pytest.fixture
def engine():
    apply_fn, variables = linear_victim()
    spec = FlickerSpec(frames=6)
    cfg = AttackConfig()
    return AttackEngine(apply_fn, variables, spec, cfg)


class TestTrainStep:
    def test_attack_reduces_label_prob(self, rng, engine):
        batch = make_batch(rng)
        flags = RuntimeFlags()
        key = jax.random.key(0)
        # attack the clean prediction itself, like the reference's untargeted
        # setting (labels := clean argmax; videos it misclassifies are skipped)
        state = engine.init_state()
        clean_probs = engine.forward(state.delta, batch, flags, key, adversarial=False)
        batch = {**batch, "labels": jnp.argmax(clean_probs, axis=-1)}
        _, m0 = engine.train_step(engine.init_state(), batch, flags, key)
        state = engine.init_state()
        for i in range(120):
            state, metrics = engine.train_step(state, batch, flags, jax.random.key(i))
        assert float(metrics["prob_to_min"]) < float(m0["prob_to_min"])
        assert float(metrics["total_loss"]) < float(m0["total_loss"])
        assert bool(metrics["is_adversarial"]) or float(metrics["adv_loss"]) < float(m0["adv_loss"])

    def test_uint8_normalization_matches_float_input(self, rng, engine):
        batch = make_batch(rng)
        fbatch = {
            "video": batch["video"].astype(jnp.float32) / 128.0 - 1.0,
            "labels": batch["labels"],
        }
        state = engine.init_state()
        flags = RuntimeFlags()
        key = jax.random.key(0)
        _, m_u8 = engine.train_step(state, batch, flags, key)
        state2 = engine.init_state()
        _, m_f32 = engine.train_step(state2, fbatch, flags, key)
        np.testing.assert_allclose(
            float(m_u8["total_loss"]), float(m_f32["total_loss"]), rtol=1e-6
        )

    def test_runtime_lr_flag(self, rng, engine):
        batch = make_batch(rng)
        flags_hi = RuntimeFlags(learning_rate=1e-1)
        flags_lo = RuntimeFlags(learning_rate=1e-4)
        key = jax.random.key(0)
        s_hi, _ = engine.train_step(engine.init_state(), batch, flags_hi, key)
        s_lo, _ = engine.train_step(engine.init_state(), batch, flags_lo, key)
        assert float(jnp.abs(s_hi.delta).max()) > float(jnp.abs(s_lo.delta).max())

    def test_beta_flags_affect_reg(self, rng, engine):
        batch = make_batch(rng)
        key = jax.random.key(0)
        state = engine.init_state()
        # drive delta away from zero first
        for i in range(5):
            state, _ = engine.train_step(state, batch, RuntimeFlags(), jax.random.key(i))
        # train_step donates its state buffers: copy before probing twice
        def snap(s):
            return jax.tree.map(lambda a: jnp.array(a, copy=True), s)

        _, m1 = engine.train_step(snap(state), batch, RuntimeFlags(beta1=1.0, beta2=0.0, beta3=0.0), key)
        _, m2 = engine.train_step(snap(state), batch, RuntimeFlags(beta1=0.0, beta2=1.0, beta3=0.0), key)
        np.testing.assert_allclose(float(m1["reg_loss"]), float(m1["norm_reg"]), rtol=1e-5)
        np.testing.assert_allclose(float(m2["reg_loss"]), float(m2["diff_norm_reg"]), rtol=1e-5)

    def test_step_counter_and_metrics_keys(self, rng, engine):
        batch = make_batch(rng)
        state = engine.init_state()
        state, metrics = engine.train_step(state, batch, RuntimeFlags(), jax.random.key(0))
        assert int(state.step) == 1
        for k in (
            "total_loss",
            "adv_loss",
            "reg_loss",
            "weighted_reg",
            "l12",
            "norm_reg",
            "diff_norm_reg",
            "laplacian_norm_reg",
            "thickness",
            "roughness",
            "delta_max",
            "delta_min",
            "prob_to_min",
            "prob_to_max",
            "is_adversarial",
            "probs",
        ):
            assert k in metrics, k


class TestTrainStepsChained:
    def test_scan_chain_equals_step_loop(self, rng, engine):
        """train_steps (one lax.scan program, used by bench for
        tunnel-independent timing) must reproduce the train_step loop's
        delta trajectory exactly (same ops, same order)."""
        batch = make_batch(rng)
        flags = RuntimeFlags()
        key = jax.random.key(0)
        s_loop = engine.init_state()
        for _ in range(5):
            s_loop, _ = engine.train_step(s_loop, batch, flags, key)
        s_chain = engine.train_steps(engine.init_state(), batch, flags, key, 5)
        np.testing.assert_allclose(
            np.asarray(s_chain.delta), np.asarray(s_loop.delta), atol=1e-6
        )
        assert int(s_chain.step) == int(s_loop.step) == 5


class TestEvalStep:
    def test_zero_delta_no_fooling(self, rng):
        apply_fn, variables = linear_victim()
        spec = FlickerSpec(frames=6)
        engine = AttackEngine(apply_fn, variables, spec, AttackConfig())
        batch = make_batch(rng)
        # labels := clean argmax so every video is valid and none fooled
        state = engine.init_state()
        flags = RuntimeFlags()
        clean_probs = engine.forward(state.delta, batch, flags, jax.random.key(0), adversarial=False)
        labels = jnp.argmax(clean_probs, axis=-1)
        out = engine.eval_step(state.delta, {**batch, "labels": labels}, flags, jax.random.key(0))
        assert int(out["miss"]) == 0
        assert int(out["valid"]) == batch["video"].shape[0]


class TestMeshParity:
    def test_sharded_step_matches_single_device(self, rng):
        assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
        apply_fn, variables = linear_victim()
        spec = FlickerSpec(frames=6)
        cfg = AttackConfig()
        batch = make_batch(rng, b=8)
        flags = RuntimeFlags()
        key = jax.random.key(0)

        single = AttackEngine(apply_fn, variables, spec, cfg)
        s_state = single.init_state()
        mesh = make_mesh()
        multi = AttackEngine(apply_fn, variables, spec, cfg, mesh=mesh)
        m_state = multi.init_state()
        m_batch = multi.shard(batch)

        for i in range(3):
            k = jax.random.key(i)
            s_state, s_metrics = single.train_step(s_state, batch, flags, k)
            m_state, m_metrics = multi.train_step(m_state, m_batch, flags, k)

        np.testing.assert_allclose(
            np.asarray(s_state.delta), np.asarray(m_state.delta), atol=1e-6
        )
        np.testing.assert_allclose(
            float(s_metrics["total_loss"]), float(m_metrics["total_loss"]), rtol=1e-5
        )

    def test_torch_meanstd_world_mesh_parity(self, rng):
        """The torch/meanstd attack graph on the mesh (VERDICT r4 item 2a):
        TorchStyleFlickerSpec with its scalar clamp-range quirk, torch reg
        weighting, the OneCycle-style per-step learning rate and the dynamic
        max_norm escalation (model.py:1061-1066) all threaded through
        RuntimeFlags — the sharded step must reproduce the single-device
        delta trajectory and loss exactly as the tanh world does."""
        from flickering_adversarial_video_tpu.engine.epoch_fit import one_cycle_lr

        apply_fn, variables = linear_victim()
        spec = TorchStyleFlickerSpec(frames=6, max_norm=0.2)
        cfg = AttackConfig(norm_world="meanstd", reg_weighting="torch")
        batch = make_batch(rng, b=8)
        single = AttackEngine(apply_fn, variables, spec, cfg)
        multi = AttackEngine(apply_fn, variables, spec, cfg, mesh=make_mesh())
        s_state = single.init_state(jax.random.key(1))
        m_state = multi.init_state(jax.random.key(1))
        m_batch = multi.shard(batch)
        for i in range(4):
            flags = RuntimeFlags(
                learning_rate=one_cycle_lr(1e-3, i + 1, 4),
                max_norm=0.2 * (1.3 ** (i // 2)),  # dynamic escalation
            )
            k = jax.random.key(i)
            s_state, s_metrics = single.train_step(s_state, batch, flags, k)
            m_state, m_metrics = multi.train_step(m_state, m_batch, flags, k)
        np.testing.assert_allclose(
            np.asarray(s_state.delta), np.asarray(m_state.delta), atol=1e-6
        )
        np.testing.assert_allclose(
            float(s_metrics["total_loss"]),
            float(m_metrics["total_loss"]),
            rtol=1e-5,
        )
        assert float(jnp.abs(s_state.delta).max()) > 0

    def test_sparse_l12_mesh_parity(self, rng):
        """The L1,2 sparse variant on the mesh (VERDICT r4 item 2b).

        Sharding decision, asserted here: the full [T, H, W, 3] delta is
        REPLICATED over the data mesh — it is the trained quantity (the
        model), the batch axis is the only sharded axis, and its gradient
        is psum-reduced exactly like the flickering delta's.  The sharded
        trajectory must match single-device."""
        apply_fn, variables = linear_victim()
        spec = SparseSpec(frames=6, height=8, width=8)
        cfg = AttackConfig(attack_kind="sparse")
        batch = make_batch(rng, b=8)
        single = AttackEngine(apply_fn, variables, spec, cfg)
        multi = AttackEngine(apply_fn, variables, spec, cfg, mesh=make_mesh())
        s_state = single.init_state()
        m_state = multi.init_state()
        # assert the decided placement: delta replicated on every device
        m_sharding = m_state.delta.sharding
        assert m_sharding.is_fully_replicated, (
            f"sparse delta must be replicated over the data mesh, got "
            f"{m_sharding}"
        )
        m_batch = multi.shard(batch)
        flags = RuntimeFlags(beta1=0.5)
        for i in range(3):
            k = jax.random.key(i)
            s_state, s_metrics = single.train_step(s_state, batch, flags, k)
            m_state, m_metrics = multi.train_step(m_state, m_batch, flags, k)
        np.testing.assert_allclose(
            np.asarray(s_state.delta), np.asarray(m_state.delta), atol=1e-6
        )
        np.testing.assert_allclose(
            float(s_metrics["total_loss"]),
            float(m_metrics["total_loss"]),
            rtol=1e-5,
        )
        assert s_state.delta.shape == spec.shape

    def test_sharded_eval_counts(self, rng):
        apply_fn, variables = linear_victim()
        spec = FlickerSpec(frames=6)
        mesh = make_mesh()
        engine = AttackEngine(apply_fn, variables, spec, AttackConfig(), mesh=mesh)
        batch = make_batch(rng, b=8)
        state = engine.init_state()
        flags = RuntimeFlags()
        clean_probs = engine.forward(state.delta, engine.shard(batch), flags, jax.random.key(0), adversarial=False)
        labels = jnp.argmax(clean_probs, axis=-1)
        sharded = engine.shard({**batch, "labels": np.asarray(labels)})
        out = engine.eval_step(state.delta, sharded, flags, jax.random.key(0))
        assert int(out["miss"]) == 0 and int(out["valid"]) == 8


class TestTorchWorld:
    def test_meanstd_world_step(self, rng):
        apply_fn, variables = linear_victim()
        spec = TorchStyleFlickerSpec(frames=6, max_norm=0.2)
        cfg = AttackConfig(norm_world="meanstd", reg_weighting="torch")
        engine = AttackEngine(apply_fn, variables, spec, cfg)
        batch = make_batch(rng)
        state = engine.init_state(jax.random.key(1))
        flags = RuntimeFlags(max_norm=0.2)
        for i in range(20):
            state, metrics = engine.train_step(state, batch, flags, jax.random.key(i))
        assert np.isfinite(float(metrics["total_loss"]))
        assert float(jnp.abs(state.delta).max()) > 0


class TestPallasFusedPath:
    def test_fused_step_matches_plain(self, rng):
        apply_fn, variables = linear_victim()
        # geometry with H*W*C % 128 == 0 and B*T % 8 == 0
        batch = make_batch(rng, b=2, t=4, h=8, w=16)
        spec = FlickerSpec(frames=4)
        plain = AttackEngine(apply_fn, variables, spec, AttackConfig())
        fused = AttackEngine(
            apply_fn, variables, spec, AttackConfig(use_pallas_fused=True)
        )
        key = jax.random.key(0)
        flags = RuntimeFlags()
        sp, sf = plain.init_state(), fused.init_state()
        for i in range(3):
            sp, mp = plain.train_step(sp, batch, flags, jax.random.key(i))
            sf, mf = fused.train_step(sf, batch, flags, jax.random.key(i))
        np.testing.assert_allclose(
            np.asarray(sp.delta), np.asarray(sf.delta), atol=1e-5
        )
        np.testing.assert_allclose(
            float(mp["total_loss"]), float(mf["total_loss"]), rtol=1e-4
        )


class TestCyclicEngine:
    def test_cyclic_flags_only_with_enable_cyclic(self, rng):
        apply_fn, variables = linear_victim()
        spec = FlickerSpec(frames=6)
        batch = make_batch(rng)
        key = jax.random.key(0)
        cyc = AttackEngine(apply_fn, variables, spec, AttackConfig(enable_cyclic=True))
        s = cyc.init_state()
        s, m = cyc.train_step(s, batch, RuntimeFlags(cyclic_flag=1.0), key)
        assert np.isfinite(float(m["total_loss"]))


class TestFrameWindow:
    """ATTACK_FRAME_WINDOW parity with the reference's one-hot mask
    (kinetics_i3d_utils.py:107-113,122): only frames in [start, end]
    (inclusive) receive the perturbation, so d(loss)/d(delta) must vanish
    outside the window and the adversarial video must equal the clean one
    there."""

    def test_grad_zero_outside_window(self, rng):
        apply_fn, variables = linear_victim()
        spec = FlickerSpec(frames=6)
        cfg = AttackConfig(frame_window=(1, 3))
        engine = AttackEngine(apply_fn, variables, spec, cfg)
        batch = make_batch(rng)
        # beta0=0 isolates the adversarial gradient: regularizers act on the
        # raw unmasked delta (as in the reference) and would otherwise pull
        # the outside frames with a (zero-valued but coupled) reg gradient.
        flags = RuntimeFlags(beta0=0.0)
        state = engine.init_state()
        for i in range(10):
            state, metrics = engine.train_step(state, batch, flags, jax.random.key(i))
        delta = np.asarray(state.delta)  # [T, 1, 1, 3]
        inside = delta[1:4]
        outside = np.concatenate([delta[:1], delta[4:]], axis=0)
        assert np.abs(inside).max() > 0  # the window is being attacked
        # Adam on an exactly-zero gradient leaves params exactly at init (0)
        np.testing.assert_array_equal(outside, np.zeros_like(outside))

    def test_adv_video_clean_outside_window(self, rng):
        apply_fn, variables = linear_victim()
        spec = FlickerSpec(frames=6)
        engine = AttackEngine(
            apply_fn, variables, spec, AttackConfig(frame_window=(2, 4))
        )
        batch = make_batch(rng)
        flags = RuntimeFlags()
        # a delta with energy on every frame; mask must gate application
        delta = jnp.ones(spec.shape, jnp.float32) * 0.3
        adv = np.asarray(engine.adversarial_video(delta, batch, flags))
        clean = np.asarray(batch["video"]).astype(np.float32) / 128.0 - 1.0
        np.testing.assert_allclose(adv[:, :2], clean[:, :2], atol=1e-6)
        np.testing.assert_allclose(adv[:, 5:], clean[:, 5:], atol=1e-6)
        assert np.abs(adv[:, 2:5] - clean[:, 2:5]).max() > 0.1

    def test_full_window_is_identity(self, rng):
        apply_fn, variables = linear_victim()
        spec = FlickerSpec(frames=6)
        batch = make_batch(rng)
        flags = RuntimeFlags()
        key = jax.random.key(0)
        plain = AttackEngine(apply_fn, variables, spec, AttackConfig())
        # reference default: _IND_START=0, _IND_END=_SAMPLE_VIDEO_FRAMES
        windowed = AttackEngine(
            apply_fn, variables, spec, AttackConfig(frame_window=(0, 6))
        )
        sp, sw = plain.init_state(), windowed.init_state()
        for i in range(3):
            sp, _ = plain.train_step(sp, batch, flags, jax.random.key(i))
            sw, _ = windowed.train_step(sw, batch, flags, jax.random.key(i))
        np.testing.assert_allclose(np.asarray(sp.delta), np.asarray(sw.delta), atol=1e-7)

    def test_torch_world_rejects_window(self):
        apply_fn, variables = linear_victim()
        spec = TorchStyleFlickerSpec(frames=6)
        with pytest.raises(ValueError):
            AttackEngine(
                apply_fn,
                variables,
                spec,
                AttackConfig(norm_world="meanstd", frame_window=(0, 3)),
            )
