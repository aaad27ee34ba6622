"""Per-video attack sweep — the torch stack's fit_many_videos /
fit_single_video_attack loops (utils_cv/action_recognition/model.py:791-1205),
rebuilt around the fused step.

Semantics preserved:
  * completion ledger: an existing result .npy whose is_adversarial history
    contains True skips the video; a None placeholder marks in-progress
    (model.py:930-943);
  * per-video delta re-init to U(-0.005, 0.005) and max_norm reset
    (model.py:946-949);
  * the loop runs `while step < n_iter or not is_adversarial`; after 3000
    stuck steps the Linf budget escalates (dynamic_max_norm *= 1.3) and the
    step counter resets, with at most 4 escalations (model.py:1056-1066);
  * result dict keys 'loss/total', 'loss/adv_loss', 'loss/reg_loss',
    'perturbation/thickness', 'perturbation/roughness',
    'perturbation/inf_norm', 'perturbation', 'prob_clean_input', 'label',
    'is_adversarial' (model.py:1194-1204).

The escalating max_norm is a runtime scalar (RuntimeFlags.max_norm), so
escalation costs zero recompiles.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np

from .attack_step import AttackEngine, RuntimeFlags
from .loops import StepTimer


def result_path_for(model_dir: str, video_path: str, class_name: str) -> str:
    """'{vid_name}_@{class_name}.npy' (model.py:926-929)."""
    vid_name = os.path.basename(str(video_path))
    return os.path.join(model_dir, f"{vid_name}_@{class_name.replace(' ', '_')}.npy")


def should_skip(dest_path: str) -> bool:
    if not os.path.exists(dest_path):
        return False
    res = np.load(dest_path, allow_pickle=True)
    res = res.tolist() if hasattr(res, "tolist") else res
    if res is None:
        return False
    return bool(np.asarray(res.get("is_adversarial", [False])).any())


def fit_single_video(
    engine: AttackEngine,
    batch: Dict[str, np.ndarray],
    flags: RuntimeFlags,
    *,
    n_iter: int = 3000,
    max_norm: float = 0.2,
    escalation: float = 1.3,
    max_chances: int = 4,
    seed: int = 0,
    init_scale: float = 0.005,
    track_history: bool = True,
) -> Optional[Dict[str, Any]]:
    """Attack one clip in the mean/std world.  Returns None when the clean
    model misclassifies it (model.py:1031-1033)."""
    key = jax.random.key(seed)
    label = int(np.asarray(batch["labels"])[0])
    # targeted attacks optimize toward config.target_class; the loss reads
    # the labels tensor, so feed the target there (the clean-prediction skip
    # below still checks the TRUE label — model.py:1031-1033)
    attack_labels = np.asarray(batch["labels"])
    if engine.config.targeted and engine.config.target_class is not None:
        attack_labels = np.full_like(attack_labels, engine.config.target_class)
    sharded = engine.shard(
        {"video": batch["video"], "labels": attack_labels}
    )

    zero_state = engine.init_state(jax.random.key(seed))
    clean_probs = np.asarray(
        engine.forward(zero_state.delta, sharded, flags, key, adversarial=False)
    )
    if int(clean_probs.argmax()) != label:
        return None

    # per-video re-init: U(-init_scale, init_scale) (model.py:946-948)
    state = engine.init_state(jax.random.key(seed))
    u = jax.random.uniform(
        jax.random.fold_in(key, 1), state.delta.shape, minval=-1.0, maxval=1.0
    )
    state = state.replace(delta=u * init_scale)

    dyn_max_norm = max_norm
    hist = {
        "loss/total": [],
        "loss/adv_loss": [],
        "loss/reg_loss": [],
        "perturbation/thickness": [],
        "perturbation/roughness": [],
        "perturbation": [],
        "is_adversarial": [],
    }
    timer = StepTimer()
    step = 0
    chances = 0
    fooled = False
    while step < n_iter or not fooled:
        if step > n_iter:
            chances += 1
            dyn_max_norm *= escalation
            step = 0
        if chances == max_chances:
            break
        timer.tick()
        step_flags = flags.replace(max_norm=dyn_max_norm)
        state, metrics = engine.train_step(
            state, sharded, step_flags, jax.random.fold_in(key, step)
        )
        fooled = bool(metrics["is_adversarial"])
        if track_history:
            hist["loss/total"].append(float(metrics["total_loss"]))
            hist["loss/adv_loss"].append(float(metrics["adv_loss"]))
            hist["loss/reg_loss"].append(float(metrics["reg_loss"]))
            hist["perturbation/thickness"].append(float(metrics["thickness"]))
            hist["perturbation/roughness"].append(float(metrics["roughness"]))
            hist["perturbation"].append(
                np.clip(np.asarray(state.delta), -dyn_max_norm, dyn_max_norm)
            )
            hist["is_adversarial"].append(fooled)
        step += 1

    final_pert = np.clip(np.asarray(state.delta), -dyn_max_norm, dyn_max_norm)
    result = {
        **hist,
        "perturbation/inf_norm": float(np.abs(final_pert).max()),
        "prob_clean_input": clean_probs,
        "label": np.asarray(batch["labels"]),
        "final_max_norm": dyn_max_norm,
        "escalations": chances,
        "steps_per_sec": timer.steps_per_sec,
    }
    if not track_history:
        result["is_adversarial"] = [fooled]
        result["perturbation"] = [final_pert]
    return result


def fit_many_videos(
    engine: AttackEngine,
    batches: Iterable[Dict[str, np.ndarray]],
    flags: RuntimeFlags,
    *,
    model_dir: str,
    label_names,
    n_iter: int = 3000,
    max_norm: float = 0.2,
    save: bool = True,
    max_videos: Optional[int] = None,
) -> Dict[str, Any]:
    """Sweep the per-video attack over a dataset stream (batch size 1)."""
    os.makedirs(model_dir, exist_ok=True)
    done = 0
    skipped_exist = 0
    skipped_misclassified = 0
    results = []
    for vid_num, batch in enumerate(batches):
        if max_videos is not None and vid_num >= max_videos:
            break
        label = int(np.asarray(batch["labels"])[0])
        class_name = label_names[label]
        path = batch.get("paths", [f"video{vid_num}"])[0]
        dest = result_path_for(model_dir, path, class_name)
        if should_skip(dest):
            skipped_exist += 1
            continue
        if save:
            np.save(dest, None)  # in-progress placeholder (model.py:942-943)
        res = fit_single_video(
            engine, batch, flags, n_iter=n_iter, max_norm=max_norm, seed=vid_num
        )
        if res is None:
            skipped_misclassified += 1
            continue
        if save:
            np.save(dest, res)
        results.append((dest, bool(np.asarray(res["is_adversarial"]).any())))
        done += 1
    return {
        "attacked": done,
        "skipped_existing": skipped_exist,
        "skipped_misclassified": skipped_misclassified,
        "results": results,
    }
