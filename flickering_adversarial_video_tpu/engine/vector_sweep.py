"""Vectorized per-video attack sweep — N independent single-video attacks as
one batched XLA program (continuous batching across the video queue).

The reference's per-video statistics sweep attacks clips one at a time with a
batch-1 hot loop (fit_many_videos / fit_single_video_attack,
utils_cv/action_recognition/model.py:791-1205) — thousands of videos x 3000+
Adam steps each, with the accelerator mostly idle at batch 1 (measured here:
the B=1 I3D step is 32.9 ms device time vs 84 ms for B=8 — ~3x throughput on
the table).  A GPU DataParallel loop cannot batch this: each video carries its
OWN delta, optimizer state, step counter, and escalation schedule.

TPU-first design: vmap the whole per-clip step — loss, grad(delta_i), a
per-slot Adam update (optimizer state vmapped, so bias-correction counts stay
per-clip), the stop rule and the dynamic-max-norm escalation — over an N-slot
axis, and lax.scan it in chunks.  The scan body reproduces the reference's
control flow EXACTLY (the `while step < n_iter or not fooled` condition, the
`step > n_iter` escalation with counter reset, the <=4 chances cap,
model.py:1056-1066) as masked lane arithmetic; finished slots freeze via
jnp.where until the host refills them with the next queued video at a chunk
boundary.  Per-slot trajectories are equal to the sequential
engine.sweep.fit_single_video runs with the same seeds (asserted in
tests/test_vector_sweep.py), because Adam is elementwise and each delta_i
only influences clip i — the vectorization is exact, not approximate.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Iterable, List, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from ..attack import metrics as metrics_lib
from .attack_step import AttackEngine, RuntimeFlags
from .sweep import result_path_for, should_skip


class SlotState(flax.struct.PyTreeNode):
    """Per-slot attack state, every leaf stacked over the N-slot axis."""

    delta: jax.Array      # [N, *spec.shape]
    opt_state: Any        # optax state, leaves [N, ...]
    step: jax.Array       # [N] i32 — resets to 0 on escalation (model.py:1064)
    chances: jax.Array    # [N] i32 — escalations used
    max_norm: jax.Array   # [N] f32 — per-slot dynamic_max_norm
    fooled: jax.Array     # [N] bool — latest step's is_adversarial
    done: jax.Array       # [N] bool — stop rule satisfied (or chances spent)


class VectorSweepEngine:
    """N-slot vectorized per-video attack over a shared frozen victim.

    Wraps an AttackEngine; uses its loss/metrics/optimizer so semantics stay
    identical to the sequential sweep (engine/sweep.py).
    """

    def __init__(
        self,
        engine: AttackEngine,
        slots: int,
        *,
        n_iter: int = 3000,
        escalation: float = 1.3,
        max_chances: int = 4,
        init_scale: float = 0.005,
        mesh=None,
        stop: str = "escalate",
        hard_cap: Optional[int] = None,
    ):
        self.engine = engine
        self.slots = slots
        self.n_iter = n_iter
        self.escalation = escalation
        self.max_chances = max_chances
        self.init_scale = init_scale
        # stop-rule family:
        #  'escalate'  — torch per-video sweep (model.py:1056-1066): exit when
        #                step >= n_iter AND fooled; after n_iter stuck steps
        #                escalate max_norm, <=max_chances times;
        #  'reference' — TF single-video driver (single_video_npy.py:313):
        #                exit when step > max_step AND fooled, no escalation,
        #                never give up (bounded by hard_cap, default 40x);
        #  'early'     — first fooling exits (loops.py stop_rule='early').
        if stop not in ("escalate", "reference", "early"):
            raise ValueError(f"unknown stop rule {stop!r}")
        self.stop = stop
        self.hard_cap = hard_cap if hard_cap is not None else n_iter * 40
        # Scale-out axis: shard the SLOT axis over the device mesh — N
        # independent per-video attacks spread across chips with zero
        # collectives (each slot's delta/Adam/video touch only that slot).
        # This is the multi-chip shape of the reference's per-video sweep;
        # its DataParallel could only split one clip's batch dim of 1.
        self.mesh = mesh if mesh is not None else engine.mesh
        if self.mesh is not None and slots % self.mesh.devices.size != 0:
            raise ValueError(
                f"slots ({slots}) must be a multiple of the mesh size "
                f"({self.mesh.devices.size})"
            )
        self._chunk = jax.jit(self._chunk_impl, static_argnums=(5,), donate_argnums=(0,))

    def place(self, tree):
        """Shard every slot-stacked leaf's leading axis over the mesh
        (no-op without a mesh)."""
        if self.mesh is None:
            return tree
        from ..parallel import mesh as mesh_lib

        return jax.tree.map(
            lambda x: jax.device_put(
                x, mesh_lib.data_sharding(self.mesh, jnp.ndim(x))
            ),
            tree,
        )

    # ---------- state ----------

    def _fresh_slot(self, seed: int):
        """Fresh (delta, opt_state) for one slot.

        'escalate' (torch sweep): U(-init_scale, init_scale), the sequential
        per-video re-init (sweep.py fit_single_video / model.py:946-948).
        'reference'/'early' (TF single-video): the spec's own init — zeros
        for FlickerSpec (kinetics_i3d_utils.py:100), matching
        loops.single_video_attack's engine.init_state(None)."""
        if self.stop == "escalate":
            key = jax.random.key(seed)
            u = jax.random.uniform(
                jax.random.fold_in(key, 1),
                self.engine.spec.shape,
                minval=-1.0,
                maxval=1.0,
            )
            delta = u * self.init_scale
        else:
            from ..attack import perturbation as pert_lib

            delta = pert_lib.init_delta(self.engine.spec, None)
        return delta, self.engine.optimizer.init(delta)

    def init_slots(self, seeds: List[int]) -> SlotState:
        assert len(seeds) == self.slots
        deltas, opts = [], []
        for s in seeds:
            d, o = self._fresh_slot(s)
            deltas.append(d)
            opts.append(o)
        stack = lambda *xs: jnp.stack(xs)
        return SlotState(
            delta=jnp.stack(deltas),
            opt_state=jax.tree.map(stack, *opts),
            step=jnp.zeros((self.slots,), jnp.int32),
            chances=jnp.zeros((self.slots,), jnp.int32),
            max_norm=jnp.full((self.slots,), 0.0, jnp.float32),  # set at fill
            fooled=jnp.zeros((self.slots,), bool),
            done=jnp.ones((self.slots,), bool),  # empty slots start done
        )

    def refill_slot(
        self, slots: SlotState, i: int, seed: int, max_norm: float
    ) -> SlotState:
        """Host-side: re-init slot i for a new video."""
        delta, opt = self._fresh_slot(seed)
        set_i = lambda stacked, new: stacked.at[i].set(new)
        return SlotState(
            delta=slots.delta.at[i].set(delta),
            opt_state=jax.tree.map(set_i, slots.opt_state, opt),
            step=slots.step.at[i].set(0),
            chances=slots.chances.at[i].set(0),
            max_norm=slots.max_norm.at[i].set(max_norm),
            fooled=slots.fooled.at[i].set(False),
            done=slots.done.at[i].set(False),
        )

    def park_slot(self, slots: SlotState, i: int) -> SlotState:
        """Mark slot i done (queue exhausted); it freezes inside the scan."""
        return slots.replace(done=slots.done.at[i].set(True))

    # ---------- the chunked device program ----------

    def _per_clip_step(self, delta, opt_state, video, label, key, max_norm, active, flags):
        """One sequential-equivalent train step for one slot (vmapped)."""
        eng = self.engine
        f = flags.replace(max_norm=max_norm)

        def loss_fn(d):
            return eng._loss_terms(d, video[None], label[None], f, key)

        (total, terms), grad = jax.value_and_grad(loss_fn, has_aux=True)(delta)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            f.learning_rate, jnp.float32
        )
        updates, new_opt = eng.optimizer.update(grad, opt_state, delta)
        new_delta = optax.apply_updates(delta, updates)

        reg_delta = eng._reg_delta(delta, f)  # pre-update, as in train_step
        probs = terms.pop("probs")
        fooled = metrics_lib.is_adversarial(
            probs,
            label[None],
            targeted=eng.config.targeted,
            target_class=eng.config.target_class,
        )
        # freeze inactive slots (done videos waiting for refill)
        new_delta = jnp.where(active, new_delta, delta)
        new_opt = jax.tree.map(
            lambda a, b: jnp.where(active, a, b), new_opt, opt_state
        )
        metrics = {
            "total_loss": total,
            "adv_loss": terms["adv_loss"],
            "reg_loss": terms["reg_loss"],
            "norm_reg": terms["norm_reg"],
            "diff_norm_reg": terms["diff_norm_reg"],
            "laplacian_norm_reg": terms["laplacian_norm_reg"],
            "prob_to_min": terms["prob_to_min"],
            "prob_to_max": terms["prob_to_max"],
            "thickness": metrics_lib.thickness(reg_delta),
            "roughness": metrics_lib.roughness(reg_delta),
            "is_adversarial": fooled,
        }
        if eng.track_probs:
            metrics["probs"] = probs[0]
        return new_delta, new_opt, metrics

    def _chunk_impl(self, slots, videos, labels, base_keys, flags, chunk):
        """Run `chunk` scan iterations of the sequential control flow."""
        vstep = jax.vmap(self._per_clip_step, in_axes=(0, 0, 0, 0, 0, 0, 0, None))

        def body(carry, _):
            s = carry
            # top-of-loop bookkeeping, replicating the sequential order of
            # each stop-rule family.  s.step counts EXECUTED steps; s.fooled
            # is the last executed step's is_adversarial.
            if self.stop == "escalate":
                # sweep.py fit_single_video: exit check (while condition),
                # then escalation, then the chances cap, then one train step
                exit_now = (s.step >= self.n_iter) & s.fooled
                done = s.done | exit_now
                escalate = (s.step > self.n_iter) & ~done
                chances = jnp.where(escalate, s.chances + 1, s.chances)
                max_norm = jnp.where(
                    escalate, s.max_norm * self.escalation, s.max_norm
                )
                step = jnp.where(escalate, 0, s.step)
                done = done | (chances >= self.max_chances)
            else:
                # loops.single_video_attack: the break runs POST-step on the
                # just-executed index k = s.step - 1:
                #   reference: k > max_step and fooled    (single_video_npy:313)
                #   early:     fooled
                # both bounded by the hard cap k >= cap
                ran = s.step > 0
                k = s.step - 1
                if self.stop == "reference":
                    fooled_exit = (k > self.n_iter) & s.fooled
                else:  # early
                    fooled_exit = s.fooled
                exit_now = ran & (fooled_exit | (k >= self.hard_cap))
                done = s.done | exit_now
                chances = s.chances
                max_norm = s.max_norm
                step = s.step
            active = ~done

            keys = jax.vmap(jax.random.fold_in)(base_keys, step)
            new_delta, new_opt, m = vstep(
                s.delta, s.opt_state, videos, labels, keys, max_norm, active, flags
            )
            new_slots = SlotState(
                delta=new_delta,
                opt_state=new_opt,
                step=jnp.where(active, step + 1, step),
                chances=chances,
                max_norm=max_norm,
                fooled=jnp.where(active, m["is_adversarial"], s.fooled),
                done=done,
            )
            ys = {
                **m,
                "active": active,
                "max_norm": max_norm,
                "delta_post": new_delta,
            }
            return new_slots, ys

        return lax.scan(body, slots, None, length=chunk)

    def run_chunk(self, slots, videos, labels, base_keys, flags, chunk: int):
        return self._chunk(slots, videos, labels, base_keys, flags, chunk)


def vector_single_video_attacks(
    engine: AttackEngine,
    clips: List[np.ndarray],
    labels_true: List[int],
    flags: RuntimeFlags,
    *,
    slots: int = 4,
    chunk: int = 64,
    max_step: int = 2500,
    stop_rule: str = "reference",
    hard_cap: Optional[int] = None,
    target_label: Optional[int] = None,
    track_history: bool = True,
    mesh=None,
    seeds: Optional[List[int]] = None,
) -> List[Optional[Dict[str, Any]]]:
    """Vectorized TF-world single-video attacks (config #1), N clips at once.

    Same semantics and result schema as loops.single_video_attack (the
    reference res_dict of single_video_npy.py:314-334), with clip k using
    seed seeds[k] (default: k, the sequential runner's convention); returns
    one result dict per clip (None where the clean model misclassifies it).
    """
    seeds = list(range(len(clips))) if seeds is None else seeds
    vse = VectorSweepEngine(
        engine,
        slots,
        n_iter=max_step,
        stop=stop_rule,
        hard_cap=hard_cap,
        mesh=mesh,
    )
    n = len(clips)
    out: List[Optional[Dict[str, Any]]] = [None] * n
    queue = list(range(n))

    def next_candidate():
        while queue:
            k = queue.pop(0)
            clip = np.asarray(clips[k])
            batch = {
                "video": clip if clip.ndim == 5 else clip[None],
                "labels": np.asarray(
                    [labels_true[k] if target_label is None else target_label],
                    np.int64,
                ),
            }
            clean = np.asarray(
                engine.forward(
                    engine.init_state().delta,
                    batch,
                    flags,
                    jax.random.key(seeds[k]),
                    adversarial=False,
                )
            )
            if int(clean.argmax()) != labels_true[k]:
                continue  # sequential returns None; out[k] stays None
            return k, batch, clean
        return None

    hist_scalar_keys = {
        "total_loss": "total_loss",
        "adv_loss": "adv_loss",
        "reg_loss": "reg_loss",
        "norm_reg": "norm_reg",
        "diff_norm_reg": "diff_norm_reg",
        "laplacian_norm_reg": "laplacian_norm_reg",
        "prob_to_min": "prob_to_min",
        "prob_to_max": "prob_to_max",
    }

    def empty_hist():
        h = {k: [] for k in hist_scalar_keys}
        h.update(thickness=[], roughness=[], perturbation=[], softmax=[])
        return h

    state = vse.init_slots(list(range(slots)))
    slot_meta: List[Optional[Dict[str, Any]]] = [None] * slots
    videos = None
    labels = None
    base_keys = jax.vmap(jax.random.key)(jnp.zeros((slots,), jnp.uint32))

    first = next_candidate()
    if first is None:
        return out
    k0, batch0, clean0 = first
    v0 = np.asarray(batch0["video"])[0]
    videos = jnp.zeros((slots,) + v0.shape, v0.dtype)
    labels = jnp.zeros((slots,), jnp.int32)

    def fill(i, state, cand):
        nonlocal videos, labels, base_keys
        if cand is None:
            return vse.park_slot(state, i)
        k, batch, clean = cand
        videos = videos.at[i].set(np.asarray(batch["video"])[0])
        labels = labels.at[i].set(int(np.asarray(batch["labels"])[0]))
        base_keys = base_keys.at[i].set(jax.random.key(seeds[k]))
        slot_meta[i] = {
            "k": k,
            "batch": batch,
            "clean": clean,
            "hist": empty_hist(),
            "t0": time.perf_counter(),
            "steps_run": 0,
        }
        # max_norm is inert in the tanh world; keep the flags value
        return vse.refill_slot(state, i, seeds[k], float(np.asarray(flags.max_norm)))

    state = fill(0, state, first)
    for i in range(1, slots):
        state = fill(i, state, next_candidate())

    while not all(m is None for m in slot_meta):
        state = vse.place(state)
        videos = vse.place(videos)
        labels = vse.place(labels)
        base_keys = vse.place(base_keys)
        state, ys = vse.run_chunk(state, videos, labels, base_keys, flags, chunk)
        ys = jax.tree.map(np.asarray, ys)
        done_now = np.asarray(state.done)
        for i in range(slots):
            meta = slot_meta[i]
            if meta is None:
                continue
            act = ys["active"][:, i]
            if track_history:
                h = meta["hist"]
                for t in np.nonzero(act)[0]:
                    for dst, src in hist_scalar_keys.items():
                        h[dst].append(float(ys[src][t, i]))
                    h["thickness"].append(float(ys["thickness"][t, i]) / 2.0 * 100)
                    h["roughness"].append(float(ys["roughness"][t, i]) / 2.0 * 100)
                    h["perturbation"].append(ys["delta_post"][t, i])
                    if "probs" in ys:
                        # [1, K] like the sequential loop's batch-1 fetch
                        h["softmax"].append(ys["probs"][t, i][None])
            meta["steps_run"] += int(act.sum())
            if done_now[i]:
                k = meta["k"]
                delta = np.asarray(state.delta)[i]
                dt = time.perf_counter() - meta["t0"]
                fooled = bool(np.asarray(state.fooled)[i])
                h = meta["hist"]
                adv_video = np.asarray(
                    engine.adversarial_video(
                        jnp.asarray(delta), meta["batch"], flags
                    )
                )
                out[k] = {
                    "correct_cls_id": labels_true[k],
                    "correct_cls_prob": float(meta["clean"].max()),
                    "softmax_init": meta["clean"],
                    "rgb_sample": np.asarray(meta["batch"]["video"]),
                    "total_loss_l": h["total_loss"],
                    "adv_loss_l": h["adv_loss"],
                    "reg_loss_l": h["reg_loss"],
                    "norm_reg_loss_l": h["norm_reg"],
                    "diff_norm_reg_loss_l": h["diff_norm_reg"],
                    "perturbation": h["perturbation"],
                    "adv_video": adv_video,
                    "softmax": h["softmax"],
                    # the sequential loop's `step` at break = executed - 1
                    "total_steps": meta["steps_run"] - 1,
                    "beta_0": float(np.asarray(flags.beta0)),
                    "beta_1": float(np.asarray(flags.beta1)),
                    "beta_2": float(np.asarray(flags.beta2)),
                    "beta_3": float(np.asarray(flags.beta3)),
                    "fatness": h["thickness"],
                    "smoothness": h["roughness"],
                    "is_adversarial": fooled,
                    "final_delta": delta,
                    "steps_per_sec": meta["steps_run"] / dt if dt > 0 else 0.0,
                }
                slot_meta[i] = None
                state = fill(i, state, next_candidate())
    return out


def vector_fit_many_videos(
    engine: AttackEngine,
    batches: Iterable[Dict[str, np.ndarray]],
    flags: RuntimeFlags,
    *,
    model_dir: str,
    label_names,
    slots: int = 8,
    chunk: int = 64,
    n_iter: int = 3000,
    max_norm: float = 0.2,
    escalation: float = 1.3,
    max_chances: int = 4,
    init_scale: float = 0.005,
    save: bool = True,
    max_videos: Optional[int] = None,
    track_history: bool = True,
    mesh=None,
) -> Dict[str, Any]:
    """Drop-in vectorized replacement for sweep.fit_many_videos.

    Same ledger, skip and result-schema semantics; N videos in flight at once.
    Per-video seeds follow the sequential convention (seed = video index), so
    a vectorized sweep resumed by the sequential one (or vice versa) produces
    the same per-video attacks.
    """
    os.makedirs(model_dir, exist_ok=True)
    vse = VectorSweepEngine(
        engine,
        slots,
        n_iter=n_iter,
        escalation=escalation,
        max_chances=max_chances,
        init_scale=init_scale,
        mesh=mesh,
    )

    stats = {"attacked": 0, "skipped_existing": 0, "skipped_misclassified": 0}
    results = []
    batch_iter = iter(batches)
    vid_counter = [-1]

    def next_candidate():
        """Next (seed, batch, dest, clean_probs) passing ledger+clean checks."""
        while True:
            if max_videos is not None and vid_counter[0] + 1 >= max_videos:
                return None
            try:
                batch = next(batch_iter)
            except StopIteration:
                return None
            vid_counter[0] += 1
            seed = vid_counter[0]
            label = int(np.asarray(batch["labels"])[0])
            class_name = label_names[label]
            path = batch.get("paths", [f"video{seed}"])[0]
            dest = result_path_for(model_dir, path, class_name)
            if should_skip(dest):
                stats["skipped_existing"] += 1
                continue
            if save:
                # in-progress placeholder BEFORE the clean check, like the
                # sequential sweep (model.py:942-943): a misclassified clip
                # leaves the None marker on disk
                np.save(dest, None)
            zero = engine.init_state(jax.random.key(seed))
            clean = np.asarray(
                engine.forward(
                    zero.delta,
                    engine.shard({"video": batch["video"], "labels": batch["labels"]}),
                    flags,
                    jax.random.key(seed),
                    adversarial=False,
                )
            )
            if int(clean.argmax()) != label:
                stats["skipped_misclassified"] += 1
                continue
            return seed, batch, dest, clean

    # slot-side host bookkeeping
    slot_meta: List[Optional[Dict[str, Any]]] = [None] * slots

    def empty_hist():
        return {
            "loss/total": [],
            "loss/adv_loss": [],
            "loss/reg_loss": [],
            "perturbation/thickness": [],
            "perturbation/roughness": [],
            "perturbation": [],
            "is_adversarial": [],
        }

    state = vse.init_slots(list(range(slots)))
    videos = None
    labels = None
    base_keys = jax.vmap(jax.random.key)(jnp.zeros((slots,), jnp.uint32))

    def fill(i, state, cand):
        nonlocal videos, labels, base_keys
        if cand is None:
            return vse.park_slot(state, i)
        seed, batch, dest, clean = cand
        attack_labels = np.asarray(batch["labels"])
        if engine.config.targeted and engine.config.target_class is not None:
            attack_labels = np.full_like(attack_labels, engine.config.target_class)
        v = np.asarray(batch["video"])[0]
        videos = videos.at[i].set(v)
        labels = labels.at[i].set(attack_labels[0])
        base_keys = base_keys.at[i].set(jax.random.key(seed))
        slot_meta[i] = {
            "seed": seed,
            "dest": dest,
            "label": np.asarray(batch["labels"]),
            "clean": clean,
            "hist": empty_hist(),
            "t0": time.perf_counter(),
            "steps_run": 0,
        }
        return vse.refill_slot(state, i, seed, max_norm)

    # prime the slots (allocating the stacked video/label buffers lazily from
    # the first candidate's shape)
    first = next_candidate()
    if first is None:
        return {**stats, "results": results}
    v0 = np.asarray(first[1]["video"])[0]
    videos = jnp.zeros((slots,) + v0.shape, first[1]["video"].dtype)
    labels = jnp.zeros((slots,), jnp.int32)
    state = fill(0, state, first)
    for i in range(1, slots):
        state = fill(i, state, next_candidate())

    while not all(m is None for m in slot_meta):
        # (re)assert the slot-axis sharding — host-side .at[].set refills may
        # have moved leaves; a device_put to the same sharding is a no-op
        state = vse.place(state)
        videos = vse.place(videos)
        labels = vse.place(labels)
        base_keys = vse.place(base_keys)
        state, ys = vse.run_chunk(state, videos, labels, base_keys, flags, chunk)
        ys = jax.tree.map(np.asarray, ys)
        done_now = np.asarray(state.done)
        for i in range(slots):
            meta = slot_meta[i]
            if meta is None:
                continue
            act = ys["active"][:, i]
            if track_history:
                h = meta["hist"]
                for t in np.nonzero(act)[0]:
                    h["loss/total"].append(float(ys["total_loss"][t, i]))
                    h["loss/adv_loss"].append(float(ys["adv_loss"][t, i]))
                    h["loss/reg_loss"].append(float(ys["reg_loss"][t, i]))
                    h["perturbation/thickness"].append(float(ys["thickness"][t, i]))
                    h["perturbation/roughness"].append(float(ys["roughness"][t, i]))
                    mn = float(ys["max_norm"][t, i])
                    h["perturbation"].append(
                        np.clip(ys["delta_post"][t, i], -mn, mn)
                    )
                    h["is_adversarial"].append(bool(ys["is_adversarial"][t, i]))
            meta["steps_run"] += int(act.sum())
            if done_now[i]:
                mn = float(np.asarray(state.max_norm)[i])
                final_pert = np.clip(np.asarray(state.delta)[i], -mn, mn)
                dt = time.perf_counter() - meta["t0"]
                fooled = bool(np.asarray(state.fooled)[i])
                result = {
                    **meta["hist"],
                    "perturbation/inf_norm": float(np.abs(final_pert).max()),
                    "prob_clean_input": meta["clean"],
                    "label": meta["label"],
                    "final_max_norm": mn,
                    "escalations": int(np.asarray(state.chances)[i]),
                    "steps_per_sec": meta["steps_run"] / dt if dt > 0 else 0.0,
                }
                if not track_history:
                    result["is_adversarial"] = [fooled]
                    result["perturbation"] = [final_pert]
                if save:
                    np.save(meta["dest"], result)
                # ledger entry like the sequential sweep: any() over the
                # result's is_adversarial history (a transiently-fooled clip
                # that un-fools before termination still counts)
                results.append(
                    (meta["dest"], bool(np.asarray(result["is_adversarial"]).any()))
                )
                stats["attacked"] += 1
                slot_meta[i] = None
                state = fill(i, state, next_candidate())

    return {**stats, "results": results}
