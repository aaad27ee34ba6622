"""Unit tests of the attack math core vs hand-computed / numpy references.

These pin the exact loss/regularizer surface of the reference
(utils/kinetics_i3d_utils.py:100-307, utils_cv/action_recognition/model.py:58-250).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flickering_adversarial_video_tpu.attack import (
    FlickerSpec,
    SparseSpec,
    TorchStyleFlickerSpec,
    apply_perturbation,
    apply_perturbation_torch_style,
    ce_attack_loss,
    clip_delta,
    first_order_diff_reg,
    flicker_regularizer,
    flicker_regularizer_torch,
    fooling_counts,
    frame_mask,
    improved_hinge_loss,
    init_delta,
    is_adversarial,
    l12_regularizer,
    label_and_max_other,
    relative_percent,
    roughness,
    second_order_diff_reg,
    thickness,
    thinness_reg,
)


def softmax_np(z):
    e = np.exp(z - z.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


class TestPerturbationApplication:
    def test_clip_and_broadcast(self, rng):
        spec = FlickerSpec(frames=6)
        clean = jnp.asarray(rng.uniform(-1, 1, (2, 6, 4, 4, 3)), jnp.float32)
        delta = jnp.asarray(rng.uniform(-1, 1, spec.shape), jnp.float32)
        adv = apply_perturbation(clean, delta, spec)
        expected = np.clip(
            np.asarray(clean) + np.clip(np.asarray(delta), -0.4, 0.4)[None], -1, 1
        )
        np.testing.assert_allclose(np.asarray(adv), expected, atol=1e-6)

    def test_adv_flag_zero_is_identity(self, rng):
        spec = FlickerSpec(frames=4)
        clean = jnp.asarray(rng.uniform(-1, 1, (1, 4, 2, 2, 3)), jnp.float32)
        delta = jnp.asarray(rng.normal(size=spec.shape), jnp.float32)
        adv = apply_perturbation(clean, delta, spec, adv_flag=0.0)
        np.testing.assert_allclose(np.asarray(adv), np.asarray(clean), atol=1e-6)

    def test_sparse_spec_no_clip(self, rng):
        spec = SparseSpec(frames=3, height=2, width=2)
        delta = jnp.asarray(rng.normal(size=spec.shape) * 3, jnp.float32)
        np.testing.assert_array_equal(np.asarray(clip_delta(spec, delta)), np.asarray(delta))

    def test_init_values(self):
        assert np.all(np.asarray(init_delta(FlickerSpec(frames=5))) == 0.0)
        assert np.allclose(np.asarray(init_delta(SparseSpec(frames=2, height=2, width=2))), 1e-8)
        d = init_delta(TorchStyleFlickerSpec(frames=5), key=jax.random.key(0))
        assert np.abs(np.asarray(d)).max() <= 1e-6

    def test_frame_mask_window(self):
        m = np.asarray(frame_mask(6, start=2, end=4)).reshape(-1)
        np.testing.assert_array_equal(m, [0, 0, 1, 1, 1, 0])

    def test_cyclic_input_roll_blend(self, rng):
        spec = FlickerSpec(frames=4)
        clean = jnp.asarray(rng.uniform(-1, 1, (1, 4, 2, 2, 3)), jnp.float32)
        delta = init_delta(spec)
        key = jax.random.key(42)
        adv = apply_perturbation(clean, delta, spec, cyclic_flag=1.0, key=key)
        # with zero delta, result must be some cyclic roll of clean on axis 1
        cands = [np.roll(np.asarray(clean), s, axis=1) for s in range(4)]
        assert any(np.allclose(np.asarray(adv), c, atol=1e-6) for c in cands)

    def test_torch_style_apply(self, rng):
        spec = TorchStyleFlickerSpec(frames=4, max_norm=0.1)
        mean = np.array(spec.mean)
        std = np.array(spec.std)
        pixels = rng.uniform(0, 1, (2, 4, 3, 3, 3)).astype(np.float32)
        clean_norm = (pixels - mean) / std
        delta = rng.uniform(-0.5, 0.5, spec.shape).astype(np.float32)
        adv = apply_perturbation_torch_style(
            jnp.asarray(clean_norm), jnp.asarray(delta), spec
        )
        d = np.clip(delta, -0.1, 0.1) / std.reshape(1, 1, 1, 3)
        lo = np.max((0.0 - mean) / std)
        hi = np.min((1.0 - mean) / std)
        expected = np.clip(clean_norm + d[None], lo, hi)
        np.testing.assert_allclose(np.asarray(adv), expected, atol=1e-5)

    def test_torch_style_dynamic_max_norm(self, rng):
        spec = TorchStyleFlickerSpec(frames=2, max_norm=0.1)
        clean = jnp.zeros((1, 2, 1, 1, 3), jnp.float32)
        delta = jnp.full(spec.shape, 10.0, jnp.float32)
        a1 = apply_perturbation_torch_style(clean, delta, spec, max_norm=0.01)
        a2 = apply_perturbation_torch_style(clean, delta, spec, max_norm=0.02)
        assert np.all(np.asarray(a2) >= np.asarray(a1))


class TestLosses:
    def test_label_and_max_other(self, rng):
        logits = rng.normal(size=(4, 10)).astype(np.float32)
        labels = np.array([0, 3, 9, 5])
        s = label_and_max_other(jnp.asarray(logits), jnp.asarray(labels))
        probs = softmax_np(logits)
        one_hot = np.eye(10)[labels]
        np.testing.assert_allclose(
            np.asarray(s.label_prob), probs[np.arange(4), labels], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s.max_non_label_prob), (probs - one_hot).max(-1), rtol=1e-5
        )
        # reference quirk: logits minus one_hot (only subtracts 1.0)
        np.testing.assert_allclose(
            np.asarray(s.max_non_label_logits), (logits - one_hot).max(-1), rtol=1e-5
        )

    @pytest.mark.parametrize("targeted", [False, True])
    @pytest.mark.parametrize("use_logits", [False, True])
    def test_improved_hinge_matches_formula(self, rng, targeted, use_logits):
        logits = rng.normal(size=(3, 8)).astype(np.float32)
        labels = np.array([1, 4, 7])
        m = 0.05
        total, aux = improved_hinge_loss(
            jnp.asarray(logits),
            jnp.asarray(labels),
            margin=m,
            targeted=targeted,
            use_logits=use_logits,
        )
        probs = softmax_np(logits)
        one_hot = np.eye(8)[labels]
        label_prob = probs[np.arange(3), labels]
        max_other_prob = (probs - one_hot).max(-1)
        label_logit = logits[np.arange(3), labels]
        max_other_logit = (logits - one_hot).max(-1)
        if targeted:
            if use_logits:
                to_min, to_max = max_other_logit, label_logit
                margin = np.log(1 + m / label_prob)
            else:
                to_min, to_max = max_other_prob, label_prob
                margin = m
        else:
            if use_logits:
                to_min, to_max = label_logit, max_other_logit
                margin = np.log(1 + m / (1e-5 + max_other_prob))
            else:
                to_min, to_max = label_prob, max_other_prob
                margin = m
        gap = to_min - (to_max - margin)
        expected = np.maximum(0, np.minimum(gap**2 / margin, gap)).sum()
        np.testing.assert_allclose(float(total), expected, rtol=1e-5)

    def test_ce_untargeted(self, rng):
        logits = rng.normal(size=(5, 6)).astype(np.float32)
        labels = np.array([0, 1, 2, 3, 4])
        total, _ = ce_attack_loss(jnp.asarray(logits), jnp.asarray(labels))
        p = softmax_np(logits)[np.arange(5), labels]
        np.testing.assert_allclose(float(total), (-np.log(1 - p + 1e-6)).mean(), rtol=1e-4)

    def test_ce_targeted_is_sparse_ce(self, rng):
        logits = rng.normal(size=(5, 6)).astype(np.float32)
        labels = np.array([2, 2, 2, 2, 2])
        total, _ = ce_attack_loss(jnp.asarray(logits), jnp.asarray(labels), targeted=True)
        log_p = np.log(softmax_np(logits))[np.arange(5), labels]
        np.testing.assert_allclose(float(total), (-log_p).mean(), rtol=1e-5)

    def test_hinge_loss_zero_when_fooled_beyond_margin(self):
        # label prob tiny, other prob big -> untargeted loss == 0
        logits = jnp.asarray([[10.0, -10.0]])
        labels = jnp.asarray([1])
        total, _ = improved_hinge_loss(logits, labels, margin=0.05)
        assert float(total) == 0.0


class TestRegularizers:
    def test_terms_vs_numpy(self, rng):
        d = rng.normal(size=(7, 1, 1, 3)).astype(np.float32)
        dj = jnp.asarray(d)
        np.testing.assert_allclose(float(thinness_reg(dj)), (d**2).mean() + 1e-12, rtol=1e-6)
        np.testing.assert_allclose(
            float(first_order_diff_reg(dj)),
            ((d - np.roll(d, 1, 0)) ** 2).mean() + 1e-12,
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(second_order_diff_reg(dj)),
            ((-2 * d + np.roll(d, 1, 0) + np.roll(d, -1, 0)) ** 2).mean() + 1e-12,
            rtol=1e-6,
        )

    def test_weightings(self, rng):
        d = jnp.asarray(rng.normal(size=(5, 1, 1, 3)), jnp.float32)
        tf_style = flicker_regularizer(d, beta1=0.2, beta2=0.3, beta3=0.4)
        expected = (
            0.2 * float(thinness_reg(d))
            + 0.3 * float(first_order_diff_reg(d))
            + 0.4 * float(second_order_diff_reg(d))
        )
        np.testing.assert_allclose(float(tf_style), expected, rtol=1e-6)
        torch_style = flicker_regularizer_torch(d, beta1=0.2)
        expected_t = 0.2 * float(thinness_reg(d)) + 0.8 * (
            float(first_order_diff_reg(d)) + float(second_order_diff_reg(d))
        )
        np.testing.assert_allclose(float(torch_style), expected_t, rtol=1e-6)

    def test_l12_per_frame(self, rng):
        d = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
        expected = np.sqrt((d**2).mean(axis=(1, 2, 3))).sum() + 1e-12
        np.testing.assert_allclose(float(l12_regularizer(jnp.asarray(d))), expected, rtol=1e-6)

    def test_constant_delta_smooth(self):
        # constant-in-time delta: diff and laplacian terms vanish (roll identity)
        d = jnp.ones((6, 1, 1, 3))
        assert float(first_order_diff_reg(d)) == pytest.approx(1e-12, abs=1e-13)
        assert float(second_order_diff_reg(d)) == pytest.approx(1e-12, abs=1e-13)


class TestMetrics:
    def test_thickness_roughness(self, rng):
        d = rng.normal(size=(5, 1, 1, 3)).astype(np.float32)
        dj = jnp.asarray(d)
        np.testing.assert_allclose(float(thickness(dj)), np.abs(d).mean(), rtol=1e-6)
        np.testing.assert_allclose(
            float(roughness(dj)), np.abs(d - np.roll(d, 1, 0)).mean(), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(relative_percent(thickness(dj))), np.abs(d).mean() / 2 * 100, rtol=1e-6
        )

    def test_is_adversarial(self):
        probs = jnp.asarray([[0.1, 0.9], [0.8, 0.2]])
        labels = jnp.asarray([0, 0])
        assert not bool(is_adversarial(probs, labels))  # second still correct
        labels2 = jnp.asarray([0, 1])
        assert bool(is_adversarial(probs, labels2))
        assert bool(is_adversarial(probs, jnp.asarray([1, 0]), targeted=True))

    def test_fooling_counts_exclude_misclassified(self):
        # 3 videos: [fooled+valid, not-fooled+valid, fooled but clean-wrong]
        adv = jnp.asarray([[0.9, 0.1], [0.1, 0.9], [0.9, 0.1]])
        clean = jnp.asarray([[0.1, 0.9], [0.1, 0.9], [0.9, 0.1]])
        labels = jnp.asarray([1, 1, 1])
        miss, valid = fooling_counts(adv, clean, labels)
        assert int(miss) == 1 and int(valid) == 2
        miss2, valid2 = fooling_counts(adv, clean, labels, exclude_misclassify=False)
        assert int(miss2) == 2 and int(valid2) == 3

    def test_fooling_counts_targeted(self):
        adv = jnp.asarray([[0.9, 0.1], [0.1, 0.9]])
        clean = jnp.asarray([[0.1, 0.9], [0.1, 0.9]])
        labels = jnp.asarray([1, 1])
        miss, valid = fooling_counts(adv, clean, labels, targeted=True, target_class=0)
        assert int(miss) == 1 and int(valid) == 2
