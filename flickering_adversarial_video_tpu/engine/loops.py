"""Attack loops: single-video, epoch (class-gen), and step-driven (universal).

Each loop is host-side orchestration around the fused device step
(attack_step.py); per-step host work is O(metrics), not O(video) — the clip
stays resident on device across the whole attack, unlike the reference which
re-feeds it every sess.run (SURVEY.md section 3.1 boundary note).

Loop semantics parity:
  * single-video stop rule: `step > max_step AND is_adversarial`
    (i3d_adversarial_main_single_video_npy.py:313) — the attack never stops
    early and keeps going past max_step until it fools; `stop_rule='early'`
    additionally offers first-success stopping for sweep throughput, and
    `hard_cap` bounds the never-fooled case (the reference would spin
    forever).
  * class-gen: epoch = one pass over the train shards; on epoch end run the
    exclude-misclassified fooling eval and checkpoint
    (i3d_adversarial_main_single_class_gen.py:218-373).
  * universal: step-driven with periodic eval + checkpoint
    (tf.estimator cadence, i3d_adversarial_main_universal.py:314-331).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import numpy as np

from .attack_step import AttackEngine, AttackState, RuntimeFlags


def flags_from_config(attack_cfg, learning_rate: Optional[float] = None) -> RuntimeFlags:
    """RuntimeFlags from a run_config.yml attack section (run_config.yml:11-89).

    beta3 := BETA_2, matching both drivers' wiring
    (single_video_npy.py:98, universal:130)."""
    return RuntimeFlags(
        adv_flag=1.0,
        cyclic_flag=float(attack_cfg.get("CYCLIC_ATTACK", False)),
        cyclic_pert_flag=float(attack_cfg.get("CYCLIC_PERTURBATION_ATTACK", False)),
        beta0=float(attack_cfg.get("LAMBDA", 1.0)),
        beta1=float(attack_cfg.get("BETA_1", 0.5)),
        beta2=float(attack_cfg.get("BETA_2", 0.5)),
        beta3=float(attack_cfg.get("BETA_2", 0.5)),
        learning_rate=float(
            learning_rate
            if learning_rate is not None
            else attack_cfg.get("LEARNING_RATE", 1e-3)
        ),
    )


def evaluate_fooling(
    engine: AttackEngine,
    delta: jax.Array,
    batches: Iterable[Dict[str, np.ndarray]],
    flags: RuntimeFlags,
    key: jax.Array,
) -> Dict[str, float]:
    """Fooling rate over a validation stream with exclude-misclassified
    accounting (kinetics_i3d_utils.py:217-250): miss_rate = sum(miss)/sum(valid)."""
    miss = 0
    valid = 0
    n_batches = 0
    for batch in batches:
        out = engine.eval_step(delta, engine.shard(batch), flags, key)
        miss += int(out["miss"])
        valid += int(out["valid"])
        n_batches += 1
    return {
        "miss_rate": miss / max(valid, 1),
        "total_valid_videos": valid,
        "batches": n_batches,
    }


class StepTimer:
    """steps/sec tracker — the first-class step timer the reference lacks
    (SURVEY.md section 5.1)."""

    def __init__(self):
        self.count = 0
        self.total = 0.0
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.total += now - self._last
            self.count += 1
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        return self.count / self.total if self.total else 0.0


def single_video_attack(
    engine: AttackEngine,
    clip: np.ndarray,
    label: int,
    flags: RuntimeFlags,
    *,
    target_label: Optional[int] = None,
    max_step: int = 2500,
    stop_rule: str = "reference",
    hard_cap: Optional[int] = None,
    track_history: bool = True,
    seed: int = 0,
    init_key: Optional[jax.Array] = None,
    log_fn: Optional[Callable[[int, Dict], None]] = None,
) -> Optional[Dict[str, Any]]:
    """Attack one clip until fooled (C8 semantics).

    `label` is the TRUE class (the clean-prediction skip check uses it,
    single_video_npy.py:137-139); for targeted attacks `target_label` is the
    class the attack drives toward and is what the loss/stop-rule see (the
    reference feeds the target id through its labels placeholder,
    :164-175).  Returns None when the clean model misclassifies the clip,
    else a result dict in the reference's res_dict schema (:314-334).
    """
    attack_label = label if target_label is None else target_label
    batch = {
        "video": clip if clip.ndim == 5 else clip[None],
        "labels": np.asarray([attack_label], np.int64),
    }
    batch = engine.shard(batch)
    key = jax.random.key(seed)

    clean_probs = np.asarray(
        engine.forward(engine.init_state(init_key).delta, batch, flags, key, adversarial=False)
    )
    top_id = int(clean_probs.argmax())
    if top_id != label:
        return None

    state = engine.init_state(init_key)
    hist: Dict[str, List] = {k: [] for k in (
        "total_loss", "adv_loss", "reg_loss", "norm_reg", "diff_norm_reg",
        "laplacian_norm_reg", "thickness", "roughness", "perturbation",
        "softmax", "prob_to_min", "prob_to_max",
    )}
    timer = StepTimer()
    step = 0
    fooled = False
    cap = hard_cap if hard_cap is not None else max_step * 40
    while True:
        timer.tick()
        state, metrics = engine.train_step(state, batch, flags, jax.random.fold_in(key, step))
        fooled = bool(metrics["is_adversarial"])
        if track_history:
            hist["total_loss"].append(float(metrics["total_loss"]))
            hist["adv_loss"].append(float(metrics["adv_loss"]))
            hist["reg_loss"].append(float(metrics["reg_loss"]))
            hist["norm_reg"].append(float(metrics["norm_reg"]))
            hist["diff_norm_reg"].append(float(metrics["diff_norm_reg"]))
            hist["laplacian_norm_reg"].append(float(metrics["laplacian_norm_reg"]))
            hist["thickness"].append(float(metrics["thickness"]) / 2.0 * 100)
            hist["roughness"].append(float(metrics["roughness"]) / 2.0 * 100)
            hist["prob_to_min"].append(float(metrics["prob_to_min"]))
            hist["prob_to_max"].append(float(metrics["prob_to_max"]))
            hist["perturbation"].append(np.asarray(state.delta))
            if "probs" in metrics:
                hist["softmax"].append(np.asarray(metrics["probs"]))
        if log_fn is not None:
            log_fn(step, metrics)
        done_reference = step > max_step and fooled
        done_early = stop_rule == "early" and fooled
        if done_reference or done_early or step >= cap:
            break
        step += 1

    adv_video = np.asarray(engine.adversarial_video(state.delta, batch, flags))
    res = {
        "correct_cls_id": label,
        "correct_cls_prob": float(clean_probs.max()),
        "softmax_init": clean_probs,
        "rgb_sample": np.asarray(batch["video"]),
        "total_loss_l": hist["total_loss"],
        "adv_loss_l": hist["adv_loss"],
        "reg_loss_l": hist["reg_loss"],
        "norm_reg_loss_l": hist["norm_reg"],
        "diff_norm_reg_loss_l": hist["diff_norm_reg"],
        "perturbation": hist["perturbation"],
        "adv_video": adv_video,
        "softmax": hist["softmax"],
        "total_steps": step,
        "beta_0": float(np.asarray(flags.beta0)),
        "beta_1": float(np.asarray(flags.beta1)),
        "beta_2": float(np.asarray(flags.beta2)),
        "beta_3": float(np.asarray(flags.beta3)),
        "fatness": hist["thickness"],
        "smoothness": hist["roughness"],
        "is_adversarial": fooled,
        "final_delta": np.asarray(state.delta),
        "steps_per_sec": timer.steps_per_sec,
    }
    return res


def batched_attack_loop(
    engine: AttackEngine,
    train_batches_fn: Callable[[], Iterable[Dict[str, np.ndarray]]],
    val_batches_fn: Callable[[], Iterable[Dict[str, np.ndarray]]],
    flags: RuntimeFlags,
    *,
    max_steps: int,
    state: Optional[AttackState] = None,
    eval_every_epochs: int = 1,
    eval_every_steps: Optional[int] = None,
    checkpointer=None,
    checkpoint_every: Optional[int] = None,
    writer=None,
    log_every: int = 50,
    targeted_label: Optional[int] = None,
    seed: int = 0,
    start_step: int = 0,
    dashboard=None,
) -> Dict[str, Any]:
    """Shared engine for class-gen (epoch cadence) and universal (step cadence).

    - checkpoint_every=None -> checkpoint at epoch ends (class-gen mode);
      an int -> every N steps (estimator mode, universal:318).
    - eval_every_steps: estimator-style throttled eval — the reference's
      `train_and_evaluate` evaluates on a step throttle tied to the 100-step
      checkpoints (i3d_adversarial_main_universal.py:314-331,373-380); an int
      here evaluates every N optimizer steps and SUPERSEDES the epoch-boundary
      cadence (epoch-end evals are skipped so eval cost stays bounded).
      None -> epoch-boundary eval only (eval_every_epochs).
    - writer: viz.tensorboard.ScalarWriter or None.
    """
    if state is None:
        state = engine.init_state()
    key = jax.random.key(seed)
    timer = StepTimer()
    step = start_step
    history: Dict[str, List] = {
        "total_loss": [], "adv_loss": [], "reg_loss": [], "norm_reg": [],
        "diff_norm_reg": [], "laplacian_norm_reg": [], "thickness": [],
        "roughness": [], "fool_rate": [], "fool_rate_steps": [],
        "perturbation": [],
    }

    def run_eval():
        ev = evaluate_fooling(engine, state.delta, val_batches_fn(), flags, key)
        history["fool_rate"].append(ev["miss_rate"])
        history["fool_rate_steps"].append(step)
        if writer is not None:
            writer.scalar("Eval/fooling_ratio", ev["miss_rate"], step)
        if dashboard is not None:
            dashboard.add_fooling(step, ev["miss_rate"])
        return ev

    def sharded_train_batches():
        """Decode/parse + device placement on a producer thread so the host
        pipeline overlaps with device steps (double-buffered; the reference
        pays a full host->device round trip inside every sess.run)."""
        from ..data.video_dataset import PrefetchIterator

        def produce():
            for batch in train_batches_fn():
                if targeted_label is not None:
                    batch = {
                        **batch,
                        "labels": np.full_like(batch["labels"], targeted_label),
                    }
                yield engine.shard(batch)

        return PrefetchIterator(produce(), depth=2)

    ev = run_eval()
    epoch = 0
    while step < max_steps:
        epoch += 1
        batches_this_epoch = 0
        for batch_on_device in sharded_train_batches():
            batches_this_epoch += 1
            if step >= max_steps:
                break
            timer.tick()
            state, metrics = engine.train_step(
                state, batch_on_device, flags, jax.random.fold_in(key, step)
            )
            step += 1
            if step % log_every == 0 or step == 1:
                m = {k: float(metrics[k]) for k in (
                    "total_loss", "adv_loss", "reg_loss", "norm_reg",
                    "diff_norm_reg", "laplacian_norm_reg", "thickness", "roughness",
                    "prob_to_min", "prob_to_max",
                )}
                for k in ("total_loss", "adv_loss", "reg_loss", "norm_reg",
                          "diff_norm_reg", "laplacian_norm_reg", "thickness", "roughness"):
                    history[k].append(m[k])
                if writer is not None:
                    writer.attack_step_scalars(m, step)
                if dashboard is not None:
                    dashboard.update(step, m)
            if checkpointer is not None and checkpoint_every and step % checkpoint_every == 0:
                checkpointer.save(state)
            if eval_every_steps and step % eval_every_steps == 0:
                ev = run_eval()
                history["perturbation"].append(np.asarray(state.delta))
        if batches_this_epoch == 0:
            # an empty pipeline would otherwise spin this while-loop forever
            raise RuntimeError(
                "train pipeline yielded no batches (no shards found / all "
                "records filtered) — check TF_RECORDS_*_PATH (*.tfrecords)"
            )
        if eval_every_steps is None and epoch % eval_every_epochs == 0:
            ev = run_eval()
            history["perturbation"].append(np.asarray(state.delta))
        if (
            epoch % eval_every_epochs == 0
            and checkpointer is not None
            and not checkpoint_every
        ):
            checkpointer.save(state)

    final_eval = run_eval()
    if checkpointer is not None:
        checkpointer.save(state)
    return {
        "state": state,
        "history": history,
        "final_eval": final_eval,
        "steps": step,
        "steps_per_sec": timer.steps_per_sec,
    }
