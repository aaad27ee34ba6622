"""Attack-state checkpointing (orbax).

Replaces the reference's three mechanisms (SURVEY.md section 5.4):
  * class-gen's per-epoch tf.train.Saver full-session snapshots
    (i3d_adversarial_main_single_class_gen.py:334-373, `model_step_%05d`);
  * the universal estimator's every-100-step checkpoints with
    keep_checkpoint_max=5 and the zero-pert warm start
    (i3d_adversarial_main_universal.py:314-348);
  * torch's resume-from-results-npy (r2plus1d_main_universal_attack.py:194-216).

Here only the *attack* state is checkpointed — (delta, opt_state, step) — the
victim weights are immutable inputs restored by convert/, so there is nothing
like the reference's "checkpoint with zero perturbation" to prepare: a fresh
AttackState IS the zero-pert warm start.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from .attack_step import AttackState


class AttackCheckpointer:
    """save/restore/latest over a directory of step-numbered checkpoints."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state: AttackState) -> None:
        step = int(state.step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: AttackState, step: Optional[int] = None) -> Optional[AttackState]:
        """Restore into the structure of `template` (an init_state() result).
        Returns None when the directory holds no checkpoints — the caller
        falls through to the zero-pert start, mirroring the estimator's
        warm-start branch (universal:334-348)."""
        target = step if step is not None else self._mgr.latest_step()
        if target is None:
            return None
        restored = self._mgr.restore(
            target, args=ocp.args.StandardRestore(template)
        )
        return restored

    def close(self):
        self._mgr.close()
