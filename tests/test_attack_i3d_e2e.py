"""End-to-end single-video attack against the REAL Flax I3D (reduced
geometry, random weights) on CPU — the convnet-grade integration test the
reference lacks (SURVEY.md section 4): the fused step must drive the victim
to misclassification through 22 conv layers, and the perturbation must stay
within its budget and broadcast shape.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flickering_adversarial_video_tpu.attack import FlickerSpec
from flickering_adversarial_video_tpu.engine import (
    AttackConfig,
    AttackEngine,
    RuntimeFlags,
)
from flickering_adversarial_video_tpu.engine.loops import single_video_attack
from flickering_adversarial_video_tpu.models.i3d import InceptionI3D, init_i3d_params

FRAMES, SIZE = 8, 32


@pytest.fixture(scope="module")
def i3d_engine():
    model = InceptionI3D(num_classes=20)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, FRAMES, SIZE, SIZE, 3))
    )
    # Random-init logits are near-uniform (p ~ 1/K, nothing to attack);
    # sharpen the head so the victim has confident predictions like a
    # trained network would.
    k = variables["params"]["Logits/Conv3d_0c_1x1"]["conv_3d"]["kernel"]
    variables["params"]["Logits/Conv3d_0c_1x1"]["conv_3d"]["kernel"] = k * 300.0
    spec = FlickerSpec(frames=FRAMES)
    # logit-mode hinge: pushes decisively PAST the decision boundary (the
    # prob-mode hinge parks at p_min ~= p_max, making the discrete argmax
    # crossing flaky under 1e-7 numeric jitter)
    cfg = AttackConfig(learning_rate=2e-2, use_logits=True)
    return AttackEngine(
        lambda v, x: model.apply(v, x)[0], variables, spec, cfg
    )


def test_single_video_attack_fools_i3d(rng, i3d_engine):
    engine = i3d_engine
    clip = rng.uniform(-1, 1, (1, FRAMES, SIZE, SIZE, 3)).astype(np.float32)
    flags = RuntimeFlags(learning_rate=2e-2, beta0=0.1)
    # label := the clean prediction (valid-video precondition)
    probs = engine.forward(
        engine.init_state().delta,
        {"video": jnp.asarray(clip), "labels": jnp.zeros((1,), jnp.int32)},
        flags,
        jax.random.key(0),
        adversarial=False,
    )
    label = int(np.asarray(probs).argmax())

    res = single_video_attack(
        engine,
        clip,
        label,
        flags,
        max_step=250,
        stop_rule="early",
        hard_cap=250,
        track_history=True,
    )
    assert res is not None
    assert res["is_adversarial"], "attack failed to fool I3D within 250 steps"
    # delta respected the +-0.4 value clip in the applied video
    final = np.asarray(res["perturbation"][-1])
    adv = np.asarray(res["adv_video"])
    assert adv.min() >= -1.0 - 1e-5 and adv.max() <= 1.0 + 1e-5
    assert final.shape == (FRAMES, 1, 1, 3)
    # history lengths consistent
    assert len(res["total_loss_l"]) == res["total_steps"] + 1


def test_vectorized_attack_fools_i3d(rng, i3d_engine):
    """The vectorized sweep must also actually FOOL the convnet — two clips
    in flight, 'early' stop, both adversarial within the cap."""
    from flickering_adversarial_video_tpu.engine.vector_sweep import (
        vector_single_video_attacks,
    )

    engine = i3d_engine
    flags = RuntimeFlags(learning_rate=2e-2, beta0=0.1)
    clips, labels = [], []
    for _ in range(2):
        clip = rng.uniform(-1, 1, (FRAMES, SIZE, SIZE, 3)).astype(np.float32)
        probs = engine.forward(
            engine.init_state().delta,
            {"video": jnp.asarray(clip[None]), "labels": jnp.zeros((1,), jnp.int32)},
            flags,
            jax.random.key(0),
            adversarial=False,
        )
        clips.append(clip)
        labels.append(int(np.asarray(probs).argmax()))
    out = vector_single_video_attacks(
        engine, clips, labels, flags,
        slots=2, chunk=25, max_step=250, stop_rule="early", hard_cap=250,
    )
    for res in out:
        assert res is not None
        assert res["is_adversarial"], "vectorized attack failed to fool I3D"
        adv = np.asarray(res["adv_video"])
        assert adv.min() >= -1.0 - 1e-5 and adv.max() <= 1.0 + 1e-5
        assert len(res["total_loss_l"]) == res["total_steps"] + 1


def test_wrong_label_skips(rng, i3d_engine):
    engine = i3d_engine
    clip = rng.uniform(-1, 1, (1, FRAMES, SIZE, SIZE, 3)).astype(np.float32)
    flags = RuntimeFlags()
    probs = engine.forward(
        engine.init_state().delta,
        {"video": jnp.asarray(clip), "labels": jnp.zeros((1,), jnp.int32)},
        flags,
        jax.random.key(0),
        adversarial=False,
    )
    wrong = (int(np.asarray(probs).argmax()) + 1) % 20
    res = single_video_attack(engine, clip, wrong, flags, max_step=5, hard_cap=5)
    assert res is None
