"""Epoch-cadenced universal attack — the torch stack's `fit`/`train_an_epoch`
(utils_cv/action_recognition/model.py:460-788), rebuilt around the fused step.

Per epoch: a train phase (optimizer steps) and a valid phase (eval only),
each accumulating exclude-misclassified fooling counters; per-epoch result
dict with the reference's key schema ('train/loss', 'train/fooling_ratio',
'train/pert_thickness', 'train/pert_roughness', 'train/inf_norm',
'train/perturbation', same for 'valid/...'; model.py:780-787), appended to a
running list and saved as '{model_name}_{epoch:03d}.npy' (model.py:619-623).

LR schedule: step decay with gamma and step_size = ceil(2/3 epochs) by
default (model.py:496,571-573), or the one-cycle policy when
use_one_cycle_policy=True (model.py:559-567) — either way the rate feeds
through the runtime learning-rate flag, zero recompiles.

Resume: delta + epoch counter recovered from the newest result .npy
('valid/perturbation'; r2plus1d_main_universal_attack.py:194-216).
"""

from __future__ import annotations

import glob
import math
import os
import re
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import numpy as np

from .attack_step import AttackEngine, AttackState, RuntimeFlags
from .loops import StepTimer


def find_resume(model_dir: str, model_name: str):
    """(delta, last_epoch) from the newest epoch result, else (None, 0)."""
    paths = glob.glob(os.path.join(model_dir, f"{model_name}_*.npy"))
    best = None
    best_epoch = 0
    for p in paths:
        m = re.search(r"_(\d+)\.npy$", p)
        if m and int(m.group(1)) >= best_epoch:
            best_epoch = int(m.group(1))
            best = p
    if best is None:
        return None, 0
    results = np.load(best, allow_pickle=True).tolist()
    if not results:
        return None, 0
    last = results[-1]
    return np.asarray(last["valid/perturbation"]), best_epoch


def step_lr(base_lr: float, epoch: int, step_size: int, gamma: float = 0.1) -> float:
    return base_lr * (gamma ** ((epoch - 1) // max(step_size, 1)))


def one_cycle_lr(
    max_lr: float,
    epoch: int,
    total_epochs: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> float:
    """LR for 1-indexed `epoch` under the reference's one-cycle policy.

    Replicates torch.optim.lr_scheduler.OneCycleLR as the reference
    constructs it (utils_cv/action_recognition/model.py:559-567:
    total_steps=epochs, pct_start=warmup_pct, cosine anneal, torch defaults
    div_factor=25, final_div_factor=1e4), stepped once per epoch: cosine
    warmup from max_lr/div_factor to max_lr over the first pct_start of
    training, then cosine anneal down to max_lr/(div_factor*final_div_factor).
    Since only delta trains, the momentum half of the policy is inert here
    (Adam betas stay fixed, as the reference's Adam ignores the scheduler's
    momentum field too)."""
    step_num = epoch - 1  # scheduler value consumed by epoch e is step e-1
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor

    def cos_anneal(start: float, end: float, pct: float) -> float:
        return end + (start - end) / 2.0 * (1.0 + math.cos(math.pi * pct))

    up_steps = pct_start * total_epochs - 1
    if up_steps <= 0:
        return max_lr if step_num == 0 else cos_anneal(
            max_lr, min_lr, step_num / max(total_epochs - 1, 1)
        )
    if step_num <= up_steps:
        return cos_anneal(initial_lr, max_lr, step_num / up_steps)
    down_steps = (total_epochs - 1) - up_steps
    return cos_anneal(max_lr, min_lr, (step_num - up_steps) / max(down_steps, 1e-9))


def fit_universal_epochs(
    engine: AttackEngine,
    train_batches_fn: Callable[[], Iterable[Dict[str, np.ndarray]]],
    valid_batches_fn: Callable[[], Iterable[Dict[str, np.ndarray]]],
    flags: RuntimeFlags,
    *,
    epochs: int,
    lr: float,
    model_dir: str,
    model_name: str,
    lr_step_size: Optional[int] = None,
    lr_gamma: float = 0.1,
    use_one_cycle_policy: bool = False,
    warmup_pct: float = 0.3,
    start_epoch: int = 1,
    state: Optional[AttackState] = None,
    save: bool = True,
    seed: int = 0,
) -> List[Dict[str, Any]]:
    if lr_step_size is None:
        lr_step_size = int(math.ceil(2 / 3 * epochs))
    os.makedirs(model_dir, exist_ok=True)
    if state is None:
        state = engine.init_state(jax.random.key(seed))
    key = jax.random.key(seed)
    results: List[Dict[str, Any]] = []

    for epoch in range(start_epoch, epochs + 1):
        if use_one_cycle_policy:
            epoch_lr = one_cycle_lr(lr, epoch, epochs, pct_start=warmup_pct)
        else:
            epoch_lr = step_lr(lr, epoch, lr_step_size, lr_gamma)
        epoch_flags = flags.replace(learning_rate=epoch_lr)
        result: Dict[str, Any] = {}
        for phase in ("train", "valid"):
            timer = StepTimer()
            miss = 0
            valid_count = 0
            losses = []
            batches = train_batches_fn() if phase == "train" else valid_batches_fn()

            def _produce(batches=batches):
                # decode + device placement on a producer thread (overlaps
                # the mp4 decode with device steps)
                for b in batches:
                    yield engine.shard({k: v for k, v in b.items() if k != "paths"})

            from ..data.video_dataset import PrefetchIterator

            for i, sharded in enumerate(PrefetchIterator(_produce(), depth=2)):
                timer.tick()
                k = jax.random.fold_in(key, epoch * 100003 + i)
                if phase == "train" and engine.track_probs:
                    # fused train + fooling counters (one XLA program)
                    state, metrics = engine.train_eval_step(
                        state, sharded, epoch_flags, k
                    )
                    losses.append(float(metrics["total_loss"]))
                    miss += int(metrics["miss"])
                    valid_count += int(metrics["valid"])
                else:
                    if phase == "train":
                        state, metrics = engine.train_step(
                            state, sharded, epoch_flags, k
                        )
                        losses.append(float(metrics["total_loss"]))
                    ev = engine.eval_step(state.delta, sharded, epoch_flags, k)
                    miss += int(ev["miss"])
                    valid_count += int(ev["valid"])
            timer.tick()
            pert = np.asarray(
                engine._reg_delta(state.delta, epoch_flags)
            )
            result[f"{phase}/time"] = timer.total
            result[f"{phase}/loss"] = float(np.mean(losses)) if losses else 0.0
            result[f"{phase}/fooling_ratio"] = miss / max(valid_count, 1)
            result[f"{phase}/pert_thickness"] = float(np.abs(pert).mean())
            result[f"{phase}/pert_roughness"] = float(
                np.abs(np.roll(pert, 1, axis=0) - pert).mean()
            )
            result[f"{phase}/inf_norm"] = float(np.abs(pert).max())
            result[f"{phase}/perturbation"] = pert
            result[f"{phase}/steps_per_sec"] = timer.steps_per_sec
        results.append(result)
        print(
            f"epoch {epoch}: lr={epoch_lr:.2e} "
            f"train_fool={result['train/fooling_ratio']:.3f} "
            f"valid_fool={result['valid/fooling_ratio']:.3f} "
            f"thick={result['valid/pert_thickness']:.4f}"
        )
        if save:
            np.save(
                os.path.join(model_dir, f"{model_name}_{epoch:03d}.npy"), results
            )
    return results
