"""Perceptual regularizers on the flickering perturbation.

TF-world terms (utils/kinetics_i3d_utils.py:175-190), delta [T, ..., C],
time on axis 0:
  thinness          mean(delta^2) + 1e-12
  1st-order diff    mean((delta - roll(delta, +1))^2) + 1e-12
  2nd-order (lap.)  mean((-2*delta + roll(delta,+1) + roll(delta,-1))^2) + 1e-12
  L1,2              sum_t sqrt(mean_{hwc}(delta^2))        (:190, :409)

Two weighting schemes exist in the reference and both are preserved:
  * TF style (single_video_npy.py:56): b1*thin + b2*diff + b3*lap, all times
    a global lambda (beta_0).  NOTE the universal estimator driver reuses
    beta_2 for the laplacian term (i3d_adversarial_main_universal.py:130) —
    callers wanting that behavior pass beta3 = beta2.
  * torch style (model.py:198-209): b1*thin + (1-b1)*(diff + lap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def thinness_reg(delta: jax.Array) -> jax.Array:
    return jnp.mean(delta**2) + _EPS


def first_order_diff_reg(delta: jax.Array) -> jax.Array:
    return jnp.mean((delta - jnp.roll(delta, 1, axis=0)) ** 2) + _EPS


def second_order_diff_reg(delta: jax.Array) -> jax.Array:
    lap = -2.0 * delta + jnp.roll(delta, 1, axis=0) + jnp.roll(delta, -1, axis=0)
    return jnp.mean(lap**2) + _EPS


def flicker_regularizer(
    delta: jax.Array,
    beta1: jax.Array | float = 0.5,
    beta2: jax.Array | float = 0.5,
    beta3: jax.Array | float | None = None,
) -> jax.Array:
    """TF-style weighted sum (i3d_adversarial_main_single_video_npy.py:56).

    beta3 defaults to beta2, matching the universal driver's weighting
    (i3d_adversarial_main_universal.py:130).
    """
    if beta3 is None:
        beta3 = beta2
    return (
        beta1 * thinness_reg(delta)
        + beta2 * first_order_diff_reg(delta)
        + beta3 * second_order_diff_reg(delta)
    )


def flicker_regularizer_torch(
    delta: jax.Array, beta1: jax.Array | float = 0.5
) -> jax.Array:
    """Torch-style weighting (model.py:198-209)."""
    return beta1 * thinness_reg(delta) + (1.0 - beta1) * (
        first_order_diff_reg(delta) + second_order_diff_reg(delta)
    )


def l12_regularizer(delta: jax.Array) -> jax.Array:
    """L1,2 group norm over frames: sum_t sqrt(mean over remaining dims)
    (kinetics_i3d_utils.py:190,409; model.py:211-214 — both reduce per frame).

    delta: [T, H, W, C] (or [T, 1, 1, C]); time on axis 0.
    """
    per_frame = jnp.mean(delta**2, axis=tuple(range(1, delta.ndim)))
    return jnp.sum(jnp.sqrt(per_frame)) + _EPS
