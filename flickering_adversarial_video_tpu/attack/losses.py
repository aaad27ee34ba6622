"""Adversarial losses — faithful functional re-derivations of the reference's.

Two losses, each with targeted/untargeted x probs/logits variants:

* "improved" hinge loss (utils/kinetics_i3d_utils.py:253-288 and
  utils_cv/action_recognition/model.py:216-250):
      delta = to_min - (to_max - margin)
      loss  = max(0, min(delta^2 / margin, delta)),  total = sum over batch
  where (to_min, to_max) are (label, max-other) statistics of the adversarial
  prediction, swapped for targeted attacks, and margin gets a log transform in
  logit mode.

* CE loss (kinetics_i3d_utils.py:290-307): targeted -> standard sparse
  softmax CE against the target label; untargeted -> -log(1 - p_label + 1e-6);
  total = mean over batch.

Parity notes (quirks kept intentionally — fooling-rate parity within 1%
requires the exact surface):
  * max_non_label_* is computed as max(x - one_hot(label)) (:168-169) — for
    logits this subtracts only 1.0 from the label entry, which does not
    guarantee exclusion of the label when logit gaps exceed 1.0. Replicated.
  * the untargeted logit margin is log(1 + m / (1e-5 + max_non_label_prob))
    (:271); the targeted one is log(1 + m / label_prob) (:259).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PredictionStats(NamedTuple):
    """Per-example statistics of a prediction vs. a label set."""

    label_prob: jax.Array          # p[label]                          [B]
    max_non_label_prob: jax.Array  # max(softmax - one_hot)            [B]
    label_logits: jax.Array        # z[label]                          [B]
    max_non_label_logits: jax.Array  # max(logits - one_hot)           [B]
    probs: jax.Array               # softmax(z)                        [B, K]


def label_and_max_other(logits: jax.Array, labels: jax.Array) -> PredictionStats:
    """Label / max-other statistics (kinetics_i3d_utils.py:164-169).

    Args:
      logits: [B, K] float.
      labels: [B] int — the attack label (true class, or target class for a
        targeted attack; the reference feeds the target id through the same
        `labels` placeholder).
    """
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=probs.dtype)
    label_prob = jnp.sum(probs * one_hot, axis=-1)
    label_logits = jnp.sum(logits.astype(probs.dtype) * one_hot, axis=-1)
    max_non_label_prob = jnp.max(probs - one_hot, axis=-1)
    max_non_label_logits = jnp.max(logits.astype(probs.dtype) - one_hot, axis=-1)
    return PredictionStats(
        label_prob, max_non_label_prob, label_logits, max_non_label_logits, probs
    )


def improved_hinge_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    margin: float = 0.05,
    targeted: bool = False,
    use_logits: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """The paper's "improved" adversarial loss (kinetics_i3d_utils.py:253-288).

    Returns (total_loss, aux) where aux carries prob_to_min / prob_to_max for
    the reference's logging channels (single_video_npy.py:75-76).
    """
    s = label_and_max_other(logits, labels)

    if targeted:
        if use_logits:
            to_min, to_max = s.max_non_label_logits, s.label_logits
            loss_margin = jnp.log(1.0 + margin * (1.0 / s.label_prob))
        else:
            to_min, to_max = s.max_non_label_prob, s.label_prob
            loss_margin = jnp.asarray(margin, s.label_prob.dtype)
        prob_to_min, prob_to_max = s.max_non_label_prob, s.label_prob
    else:
        if use_logits:
            to_min, to_max = s.label_logits, s.max_non_label_logits
            loss_margin = jnp.log(1.0 + margin * (1.0 / (1e-5 + s.max_non_label_prob)))
        else:
            to_min, to_max = s.label_prob, s.max_non_label_prob
            loss_margin = jnp.asarray(margin, s.label_prob.dtype)
        prob_to_min, prob_to_max = s.label_prob, s.max_non_label_prob

    gap = to_min - (to_max - loss_margin)
    l2 = (gap**2) / loss_margin
    l3 = gap
    per_example = jnp.maximum(0.0, jnp.minimum(l2, l3))
    total = jnp.sum(per_example)
    aux = {
        "prob_to_min": prob_to_min,
        "prob_to_max": prob_to_max,
        "per_example": per_example,
        "probs": s.probs,
    }
    return total, aux


def ce_attack_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    targeted: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """CE-style adversarial loss (kinetics_i3d_utils.py:290-307)."""
    s = label_and_max_other(logits, labels)
    if targeted:
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        one_hot = jax.nn.one_hot(labels, logits.shape[-1], dtype=log_probs.dtype)
        per_example = -jnp.sum(one_hot * log_probs, axis=-1)
        prob_to_min, prob_to_max = s.max_non_label_prob, s.label_prob
    else:
        per_example = -jnp.log(1.0 - s.label_prob + 1e-6)
        prob_to_min, prob_to_max = s.label_prob, s.max_non_label_prob
    total = jnp.mean(per_example)
    aux = {
        "prob_to_min": prob_to_min,
        "prob_to_max": prob_to_max,
        "per_example": per_example,
        "probs": s.probs,
    }
    return total, aux


def adversarial_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    improve_loss: bool = True,
    margin: float = 0.05,
    targeted: bool = False,
    use_logits: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Config-driven dispatch mirroring the IMPROVE_ADV_LOSS switch
    (i3d_adversarial_main_single_video_npy.py:37-42)."""
    if improve_loss:
        return improved_hinge_loss(
            logits, labels, margin=margin, targeted=targeted, use_logits=use_logits
        )
    return ce_attack_loss(logits, labels, targeted=targeted)
