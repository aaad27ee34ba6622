"""Perceptual + fooling metrics.

Perceptual (kinetics_i3d_utils.py:194-200):
  thickness = mean|delta|, roughness = mean|delta - roll(delta, 1)|,
  relative % = value / 2 * 100 (full scale of the [-1, 1] world).
  The torch world reports value * 100 directly (model.py:114-119) since its
  delta lives in [0, 1] pixel units — callers pick the scale.

Fooling (kinetics_i3d_utils.py:217-250; model.py:293-323): a video counts as
fooled when argmax(adv) != label (untargeted) or == target (targeted); with
`exclude_misclassify` only videos the clean model classifies correctly count
toward either numerator or denominator.  `fooling_counts` returns the (miss,
valid) pair so data-parallel callers can psum the integer counters over the
mesh and divide once at the end — the TPU-native replacement for the
reference's tower-merge helper (kinetics_i3d_utils.py:536-569).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def thickness(delta: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(delta))


def roughness(delta: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(delta - jnp.roll(delta, 1, axis=0)))


def relative_percent(value: jax.Array, full_scale: float = 2.0) -> jax.Array:
    """Percentage of full input scale (kinetics_i3d_utils.py:199-200)."""
    return value / full_scale * 100.0


def is_adversarial(
    adv_probs: jax.Array,
    labels: jax.Array,
    *,
    targeted: bool = False,
    target_class: int | None = None,
) -> jax.Array:
    """Scalar bool: the whole batch is fooled (single_video_npy.py:157-161).

    Untargeted: all argmax(adv) != label. Targeted: all argmax(adv) == target
    (the reference compares against the `labels` tensor, which it feeds with
    the target id; passing target_class keeps call sites explicit).
    """
    pred = jnp.argmax(adv_probs, axis=-1)
    if targeted:
        tgt = labels if target_class is None else jnp.full_like(pred, target_class)
        return jnp.all(pred == tgt)
    return jnp.all(pred != labels)


def fooling_counts(
    adv_probs: jax.Array,
    clean_probs: jax.Array,
    labels: jax.Array,
    *,
    targeted: bool = False,
    target_class: int | None = None,
    exclude_misclassify: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """(miss, valid) integer counters for one batch (kinetics_i3d_utils.py:217-250).

    miss_rate = sum(miss) / sum(valid) across all batches (and, under pjit,
    across all devices via an automatic cross-replica reduction).
    """
    adv_pred = jnp.argmax(adv_probs, axis=-1)
    if targeted:
        tgt = labels if target_class is None else jnp.full_like(adv_pred, target_class)
        miss_cond = adv_pred == tgt
    else:
        miss_cond = adv_pred != labels

    if exclude_misclassify:
        clean_pred = jnp.argmax(clean_probs, axis=-1)
        valid = clean_pred == labels
        miss = jnp.sum(jnp.logical_and(miss_cond, valid).astype(jnp.int32))
        total = jnp.sum(valid.astype(jnp.int32))
    else:
        miss = jnp.sum(miss_cond.astype(jnp.int32))
        total = jnp.asarray(labels.shape[0], jnp.int32)
    return miss, total
