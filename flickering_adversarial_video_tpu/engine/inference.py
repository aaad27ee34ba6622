"""Inference wrapper — the kinetics_i3d_inference equivalent
(utils/kinetics_i3d_utils.py:574-648): a frozen victim callable with
adv/cyclic flags, used to pre-screen candidate videos
(pre_process_rgb_flow.py:239-257) and to evaluate saved perturbations.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..attack import perturbation as pert_lib
from .attack_step import AttackEngine, RuntimeFlags


class InferenceModel:
    """callable(clips, adv_flag=0, cyclic_input_flag=0, cyclic_eps_flag=0) -> probs.

    Wraps an AttackEngine with a fixed (loadable) delta; all flags are
    runtime scalars, matching the reference's placeholder ergonomics."""

    def __init__(self, engine: AttackEngine, delta: Optional[np.ndarray] = None):
        self.engine = engine
        self.delta = (
            jnp.asarray(delta)
            if delta is not None
            else pert_lib.init_delta(engine.spec, jax.random.key(0))
        )
        self._step = 0

    def load_perturbation(self, delta: np.ndarray) -> None:
        self.delta = jnp.asarray(delta)

    def __call__(
        self,
        clips: np.ndarray,
        adv_flag: float = 0.0,
        cyclic_input_flag: float = 0.0,
        cyclic_eps_flag: float = 0.0,
        labels: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        clips = np.asarray(clips)
        if clips.ndim == 4:
            clips = clips[None]
        batch = {
            "video": clips,
            "labels": labels
            if labels is not None
            else np.zeros((clips.shape[0],), np.int64),
        }
        flags = RuntimeFlags(
            adv_flag=adv_flag,
            cyclic_flag=cyclic_input_flag,
            cyclic_pert_flag=cyclic_eps_flag,
        )
        self._step += 1
        key = jax.random.key(self._step)
        probs = self.engine.forward(
            self.delta, self.engine.shard(batch), flags, key, adversarial=True
        )
        return np.asarray(probs)
