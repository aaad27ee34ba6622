"""The fused attack step — one XLA program per optimizer step.

Where the reference spends 2-4 sess.run round-trips per logged step (train_op,
softmax refetch, clean-logits refetch; i3d_adversarial_main_single_video_npy.py
:213-308) and re-feeds the clip host->device every time, here preprocessing
(uint8 -> f32 normalize), perturbation application, the victim forward, the
loss, the backward over delta only, the Adam update and every logged metric
compile into a single jitted function.  The batch arrives as uint8 (4x less
HBM/PCIe traffic than f32) and is normalized on device.

Parallelism: the step is jitted with a data-sharded batch and replicated
(delta, opt_state); XLA emits the cross-replica psum for d(loss)/d(delta)
over ICI on its own (see parallel/mesh.py).  delta and opt_state buffers are
donated, so the update is in-place in HBM.

Runtime flags mirror the reference's tf.placeholder_with_default ergonomics
(kinetics_i3d_utils.py:90-133, single_video_npy.py:44-80): adv/cyclic flags,
the four betas, the learning rate and the torch-world max_norm are *traced
scalars* — hot-swappable per step with zero recompilation.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..attack import losses as losses_lib
from ..attack import metrics as metrics_lib
from ..attack import perturbation as pert_lib
from ..attack import regularizers as reg_lib
from ..parallel import mesh as mesh_lib


@dataclasses.dataclass(frozen=True)
class AttackConfig:
    """Static attack configuration (changing these recompiles the step)."""

    improve_loss: bool = True          # IMPROVE_ADV_LOSS
    margin: float = 0.05               # PROB_MARGIN
    targeted: bool = False             # TARGETED_ATTACK
    use_logits: bool = False           # USE_LOGITS
    attack_kind: str = "flickering"    # 'flickering' | 'sparse' (L1,2)
    norm_world: str = "tanh"           # 'tanh' (x/128-1) | 'meanstd'
    reg_weighting: str = "tf"          # 'tf' (b1,b2,b3) | 'torch' (b1,1-b1)
    learning_rate: float = 1e-3
    exclude_misclassify: bool = True
    target_class: Optional[int] = None
    # TF world regularizes/measures the raw eps variable
    # (kinetics_i3d_utils.py:172-195); torch world the clamped one
    # (model.py:88,1078). None -> derived from norm_world.
    reg_on_clipped: Optional[bool] = None
    # compile the cyclic-roll augmentation paths into the step (CYCLIC_ATTACK
    # / CYCLIC_PERTURBATION_ATTACK support). Off by default: the reference
    # ships with both flags False (run_config.yml:26,77-78) and the rolls
    # cost an extra full-video materialization.
    enable_cyclic: bool = False
    # route the tanh-world preprocess+apply through the Pallas fused kernel
    # (ops/fused_apply.py). Requires enable_cyclic=False and uint8 input.
    use_pallas_fused: bool = False
    # attacked frame window [start, end], inclusive of end, as in the
    # reference's one-hot mask over [_IND_START, _IND_END]
    # (kinetics_i3d_utils.py:107-113,122: input_pert = mask_rgb * eps_clip).
    # None = full window (the reference default _IND_START=0,
    # _IND_END=_SAMPLE_VIDEO_FRAMES, an identity mask). The mask gates only
    # the *applied* perturbation; regularizers and metrics act on the raw
    # delta variable, exactly as the reference's graph does (:177-200 use
    # self.eps_rgb, not input_pert). tanh (TF/I3D) world only.
    frame_window: Optional[Tuple[int, int]] = None

    @property
    def regularize_clipped(self) -> bool:
        if self.reg_on_clipped is not None:
            return self.reg_on_clipped
        return self.norm_world == "meanstd"


class RuntimeFlags(flax.struct.PyTreeNode):
    """Per-step scalars (the placeholder_with_default equivalents)."""

    adv_flag: jax.Array | float = 1.0
    cyclic_flag: jax.Array | float = 0.0
    cyclic_pert_flag: jax.Array | float = 0.0
    beta0: jax.Array | float = 1.0     # LAMBDA
    beta1: jax.Array | float = 0.5
    beta2: jax.Array | float = 0.5
    beta3: jax.Array | float = 0.5
    learning_rate: jax.Array | float = 1e-3
    max_norm: jax.Array | float = 1.0  # torch-world dynamic_max_norm


class AttackState(flax.struct.PyTreeNode):
    delta: jax.Array
    opt_state: Any
    step: jax.Array


class AttackEngine:
    """Builds and jits attack/eval steps for one (victim, spec, config) triple.

    Args:
      apply_fn: (variables, x) -> logits [B, K] (endpoint dicts are sliced off
        for I3D).
      variables: frozen victim variables ({'params', 'batch_stats'}).
      spec: a perturbation spec from attack/perturbation.py.
      config: AttackConfig.
      mesh: optional jax.sharding.Mesh; default single-device (no sharding).
    """

    def __init__(
        self,
        apply_fn: Callable[[Any, jax.Array], jax.Array],
        variables: Any,
        spec,
        config: AttackConfig,
        mesh=None,
        track_probs: bool = True,
        apply_packed_fn: Optional[Callable[[Any, jax.Array], jax.Array]] = None,
        stem_head=None,
    ):
        self.apply_fn = apply_fn
        self.variables = variables
        self.spec = spec
        self.config = config
        self.mesh = mesh
        self.track_probs = track_probs
        # Fast path: victim forward that accepts space-to-depth packed input
        # (InceptionI3D(prepacked_stem_input=True).apply over the SAME
        # variables).  When present and the batch is eligible, preprocessing
        # + delta apply + pack fuse into one packed-space custom-VJP op
        # (ops/packed_apply.py) — no full-size f32 relayouts fwd or bwd.
        self.apply_packed_fn = apply_packed_fn
        # Faster still (host-prepacked tanh world only): preprocess AND the
        # I3D stem conv+BN+relu as one op (ops/packed_apply.flicker_stem_head
        # — the packed input gradient is contracted away, never stored);
        # a StemHead carries the packed kernel, BN stats, and the
        # skip_stem victim forward.
        self.stem_head = stem_head
        self.optimizer = optax.inject_hyperparams(optax.adam)(
            learning_rate=config.learning_rate
        )

        self._mask = None
        if config.frame_window is not None:
            if config.norm_world != "tanh":
                raise ValueError(
                    "frame_window is a TF/I3D-world graph feature "
                    "(kinetics_i3d_utils.py:107-113); the torch Perturbation "
                    "module has no frame mask"
                )
            start, end = config.frame_window
            self._mask = pert_lib.frame_mask(spec.frames, start, end)

        # Sharding flows in through the argument placements: init_state puts
        # state replicated, shard() puts batches data-sharded; jit propagates.
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._train_eval_step = jax.jit(self._train_eval_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._forward = jax.jit(self._forward_impl, static_argnames=("adversarial",))
        self._train_steps = jax.jit(
            self._train_steps_impl, static_argnums=(4,), donate_argnums=(0,)
        )

    # ---------- state ----------

    def init_state(self, key: Optional[jax.Array] = None) -> AttackState:
        delta = pert_lib.init_delta(self.spec, key)
        opt_state = self.optimizer.init(delta)
        state = AttackState(delta=delta, opt_state=opt_state, step=jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            state = mesh_lib.put_replicated(self.mesh, state)
        return state

    def reset_delta(self, state: AttackState, key: Optional[jax.Array] = None) -> AttackState:
        """Re-init delta and optimizer slots (per-video sweep, model.py:946-949)."""
        fresh = self.init_state(key)
        return state.replace(delta=fresh.delta, opt_state=fresh.opt_state, step=jnp.zeros((), jnp.int32))

    # ---------- preprocessing ----------

    def _normalize(self, video: jax.Array) -> jax.Array:
        """On-device normalization, replicating the host-side math of the
        reference: uint8/128-1 (pre_process_rgb_flow.py:231-235) or
        uint8/255 -> (x-mean)/std (dataset.py NormalizeVideo)."""
        if self.config.norm_world == "tanh":
            if video.dtype == jnp.uint8:
                return video.astype(jnp.float32) / 128.0 - 1.0
            return video.astype(jnp.float32)
        # meanstd world
        x = video.astype(jnp.float32)
        if video.dtype == jnp.uint8:
            x = x / 255.0
        mean = jnp.asarray(self.spec.mean, jnp.float32)
        std = jnp.asarray(self.spec.std, jnp.float32)
        return (x - mean) / std

    def _apply_delta(
        self, x: jax.Array, delta: jax.Array, flags: RuntimeFlags, key: Optional[jax.Array]
    ) -> jax.Array:
        if not self.config.enable_cyclic:
            key = None  # rolls compiled out; cyclic flags are inert
        if self.config.norm_world == "tanh":
            return pert_lib.apply_perturbation(
                x,
                delta,
                self.spec,
                adv_flag=flags.adv_flag,
                cyclic_flag=flags.cyclic_flag,
                cyclic_pert_flag=flags.cyclic_pert_flag,
                mask=self._mask,
                key=key,
            )
        return pert_lib.apply_perturbation_torch_style(
            x,
            delta,
            self.spec,
            adv_flag=flags.adv_flag,
            max_norm=flags.max_norm,
            cyclic_pert_flag=flags.cyclic_pert_flag,
            key=key,
        )

    def _reg_delta(self, delta: jax.Array, flags: RuntimeFlags) -> jax.Array:
        if not self.config.regularize_clipped:
            return delta
        if self.config.norm_world == "meanstd":
            return jnp.clip(delta, -flags.max_norm, flags.max_norm)
        return pert_lib.clip_delta(self.spec, delta)

    # ---------- packed fast path ----------

    def _batch_video(self, batch) -> Tuple[jax.Array, object]:
        """(video, mode): mode is False (generic 'video'), True (HOST-
        prepacked 'video_packed' space-to-depth layout) or 'view' (HOST
        view-prepacked 'video_view' [H,W,8C,T'B] batch-in-lanes layout —
        data/packing.pack_batch_view_np / native tfr_batch_view; consumed
        by flicker_stem_tmajor_view with zero device-side layout
        crossings).  Truthiness of the mode == 'some packed layout'."""
        if "video_view" in batch:
            return batch["video_view"], "view"
        if "video_packed" in batch:
            return batch["video_packed"], True
        return batch["video"], False

    def _packed_supported(self) -> bool:
        from ..attack.perturbation import FlickerSpec, TorchStyleFlickerSpec

        if self.apply_packed_fn is None or self.config.enable_cyclic:
            return False
        if self.config.norm_world == "tanh":
            return isinstance(self.spec, FlickerSpec) and not self.config.use_pallas_fused
        # torch world: spatial-only pack; flickering delta only (not sparse)
        return (
            isinstance(self.spec, TorchStyleFlickerSpec)
            and self.spec.height == 1
            and self.spec.width == 1
        )

    def view_input_eligible(self, batch_size: int, frames: int) -> bool:
        """Can this engine consume HOST view-prepacked 'video_view' batches
        ([H',W',8C,T'B], data/packing.pack_batch_view_np)?  Mirrors the
        T-major head's trace-time gate (single-device process, 128-aligned
        T'B lanes) — unlike 'video_packed' the view path has no b-major
        fallback, so the pipeline must only emit it when the engine will
        definitely take it."""
        sh = self.stem_head
        env = os.environ.get("FLICKER_TMAJOR_HEAD", "")
        if (
            sh is None
            or not getattr(sh, "tmajor", False)
            or not self._packed_supported()
            or self.mesh is not None
            or frames % 2
        ):
            return False
        if env == "1":  # forced, same as the trace-time gate
            return True
        return (
            env != "0"
            and jax.device_count() == 1
            and (batch_size * (frames // 2)) % 128 == 0
        )

    def _packed_eligible(self, video: jax.Array, prepacked: bool = False) -> bool:
        """Static (trace-time) eligibility for the packed-preprocess path."""
        from ..ops.packed_apply import packable, packable_spatial

        if prepacked:
            if not self._packed_supported():
                raise ValueError(
                    "batch carries 'video_packed' but the engine cannot take "
                    "the packed path (needs apply_packed_fn + a flickering "
                    "spec, no cyclic/pallas modes)"
                )
            return True
        shape_ok = (
            packable(video.shape)
            if self.config.norm_world == "tanh"
            else packable_spatial(video.shape)
        )
        return (
            self._packed_supported()
            and video.dtype == jnp.uint8
            and shape_ok
        )

    def _packed_logits(
        self, delta, video, flags, prepacked=False, view_b: int = 0
    ) -> jax.Array:
        """clip/mask delta -> packed fused apply -> prepacked victim forward.
        With delta=None the clean forward runs through the same fused op
        (adv_flag=0; the clamp is an identity on normalized clean pixels)."""
        from ..ops.packed_apply import (
            apply_flicker_packed,
            apply_flicker_prepacked,
            apply_torch_flicker_packed,
        )

        if self.config.norm_world == "meanstd":
            from ..ops.packed_apply import torch_pack_factor, torch_packed_clean

            if prepacked:
                raise ValueError(
                    "host-prepacked batches are a tanh-world (tfrecord) "
                    "pipeline feature; the torch world packs on device"
                )
            factor = torch_pack_factor(video.shape, self.apply_packed_fn)
            if delta is None:
                # reference clean forward: normalize only, no clamp
                # (Perturbation.forward returns x when adversarial=False)
                clean_packed = torch_packed_clean(
                    video, tuple(self.spec.mean), tuple(self.spec.std),
                    jnp.float32, factor,
                )
                return self.apply_packed_fn(self.variables, clean_packed)
            lo, hi = self.spec.clamp_range
            adv_packed = apply_torch_flicker_packed(
                video,
                delta,
                jnp.asarray(flags.adv_flag, jnp.float32),
                jnp.asarray(flags.max_norm, jnp.float32),
                tuple(self.spec.mean),
                tuple(self.spec.std),
                lo,
                hi,
                jnp.float32,
                factor,
            )
            return self.apply_packed_fn(self.variables, adv_packed)

        if delta is None:
            clipped = jnp.zeros(self.spec.shape, jnp.float32)
            adv_flag = jnp.float32(0.0)
        else:
            clipped = pert_lib.clip_delta(self.spec, delta)
            if self._mask is not None:
                clipped = clipped * self._mask
            adv_flag = jnp.asarray(flags.adv_flag, jnp.float32)
        if prepacked == "view":
            sh = self.stem_head
            if sh is None or not getattr(sh, "tmajor", False) or view_b <= 0:
                raise ValueError(
                    "batch carries 'video_view' (host view-prepacked "
                    "[H,W,8C,T'B]) but the engine lacks a T-major stem head "
                    "(build_stem_head(tmajor=True)) or a static batch size; "
                    "view input has no b-major fallback"
                )
            from ..ops.stem_tmajor import flicker_stem_tmajor_view

            y = flicker_stem_tmajor_view(
                video, clipped, adv_flag,
                sh.pk, sh.mean, sh.var, sh.bias,
                self.spec.input_min, self.spec.input_max, sh.out_dtype,
                view_b,
            )
            return sh.apply_fn(self.variables, y)
        if prepacked and self.stem_head is not None:
            sh = self.stem_head
            if getattr(sh, "tmajor", False):
                # T-major head (ops/stem_tmajor.py): eligible when the view
                # geometry pays — single-device process (the t*B+b lane
                # merge shards badly under a data mesh) with 128-aligned
                # B*T' lanes; FLICKER_TMAJOR_HEAD=1/0 forces.  Ineligible
                # traces fall through to the plain prepacked path.
                env = os.environ.get("FLICKER_TMAJOR_HEAD", "")
                eligible = env == "1" or (
                    env != "0"
                    and jax.device_count() == 1
                    and (video.shape[0] * video.shape[1]) % 128 == 0
                    and video.shape[2] % 2 == 0
                    and video.shape[3] % 2 == 0
                )
                if eligible:
                    from ..ops.stem_tmajor import flicker_stem_tmajor

                    y = flicker_stem_tmajor(
                        video, clipped, adv_flag,
                        sh.pk, sh.mean, sh.var, sh.bias,
                        self.spec.input_min, self.spec.input_max,
                        sh.out_dtype,
                    )
                    return sh.apply_fn(self.variables, y)
            else:
                from ..ops.packed_apply import flicker_stem_head

                y = flicker_stem_head(
                    video, clipped, adv_flag,
                    sh.pk, sh.mean, sh.var, sh.bias,
                    self.spec.input_min, self.spec.input_max,
                    sh.out_dtype,
                )
                return sh.apply_fn(self.variables, y)
        op = apply_flicker_prepacked if prepacked else apply_flicker_packed
        adv_packed = op(
            video, clipped, adv_flag, self.spec.input_min, self.spec.input_max
        )
        return self.apply_packed_fn(self.variables, adv_packed)

    # ---------- loss ----------

    def _loss_terms(
        self,
        delta: jax.Array,
        video: jax.Array,
        labels: jax.Array,
        flags: RuntimeFlags,
        key: Optional[jax.Array],
        prepacked: bool = False,
    ):
        if prepacked:
            self._packed_eligible(video, prepacked=True)  # raises if unsupported
        if prepacked or self._packed_eligible(video):
            logits = self._packed_logits(
                delta, video, flags, prepacked=prepacked,
                view_b=labels.shape[0],
            )
        elif (
            self.config.use_pallas_fused
            and self.config.norm_world == "tanh"
            and not self.config.enable_cyclic
            and video.dtype == jnp.uint8
        ):
            from ..ops.fused_apply import fused_normalize_perturb

            clipped = pert_lib.clip_delta(self.spec, delta)
            if self._mask is not None:
                clipped = clipped * self._mask
            adv = fused_normalize_perturb(
                video, clipped, jnp.asarray(flags.adv_flag, jnp.float32)
            )
            logits = self.apply_fn(self.variables, adv)
        else:
            x = self._normalize(video)
            adv = self._apply_delta(x, delta, flags, key)
            logits = self.apply_fn(self.variables, adv)
        adv_total, aux = losses_lib.adversarial_loss(
            logits,
            labels,
            improve_loss=self.config.improve_loss,
            margin=self.config.margin,
            targeted=self.config.targeted,
            use_logits=self.config.use_logits,
        )
        reg_delta = self._reg_delta(delta, flags)
        norm_r = reg_lib.thinness_reg(reg_delta)
        diff_r = reg_lib.first_order_diff_reg(reg_delta)
        lap_r = reg_lib.second_order_diff_reg(reg_delta)
        # L12 group norm: logged in EVERY mode by the reference (its flickering
        # graph defines loss_L12 over the masked delta too,
        # kinetics_i3d_utils.py:190; summary tag Loss/L12, universal:183)
        l12_r = reg_lib.l12_regularizer(reg_delta)
        if self.config.attack_kind == "sparse":
            reg = flags.beta1 * l12_r
        elif self.config.reg_weighting == "torch":
            reg = flags.beta1 * norm_r + (1.0 - flags.beta1) * (diff_r + lap_r)
        else:
            reg = flags.beta1 * norm_r + flags.beta2 * diff_r + flags.beta3 * lap_r
        total = adv_total + flags.beta0 * reg
        terms = {
            "adv_loss": adv_total,
            "reg_loss": reg,
            "weighted_reg": flags.beta0 * reg,
            "l12": l12_r,
            "norm_reg": norm_r,
            "diff_norm_reg": diff_r,
            "laplacian_norm_reg": lap_r,
            "prob_to_min": jnp.mean(aux["prob_to_min"]),
            "prob_to_max": jnp.mean(aux["prob_to_max"]),
            "probs": aux["probs"],
        }
        return total, terms

    # ---------- steps ----------

    def _train_step_impl(
        self,
        state: AttackState,
        batch: Dict[str, jax.Array],
        flags: RuntimeFlags,
        key: jax.Array,
    ) -> Tuple[AttackState, Dict[str, jax.Array]]:
        video, prepacked = self._batch_video(batch)

        def loss_fn(delta):
            return self._loss_terms(
                delta, video, batch["labels"], flags, key, prepacked=prepacked
            )

        (total, terms), grad = jax.value_and_grad(loss_fn, has_aux=True)(state.delta)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            flags.learning_rate, jnp.float32
        )
        updates, opt_state = self.optimizer.update(grad, opt_state, state.delta)
        delta = optax.apply_updates(state.delta, updates)
        new_state = AttackState(delta=delta, opt_state=opt_state, step=state.step + 1)

        # metrics on the *pre-update* delta, matching the reference's fetches
        # in the same sess.run as train_op (single_video_npy.py:213-215)
        metric_delta = (
            self._reg_delta(state.delta, flags)
        )
        thick = metrics_lib.thickness(metric_delta)
        rough = metrics_lib.roughness(metric_delta)
        probs = terms.pop("probs")
        fooled = metrics_lib.is_adversarial(
            probs,
            batch["labels"],
            targeted=self.config.targeted,
            target_class=self.config.target_class,
        )
        metrics = {
            "total_loss": total,
            "thickness": thick,
            "roughness": rough,
            # Perturbation/{max,min} summary inputs (universal:190-191);
            # pre-update delta like every other fetched metric
            "delta_max": jnp.max(state.delta),
            "delta_min": jnp.min(state.delta),
            "is_adversarial": fooled,
            "step": state.step,
            **terms,
        }
        if self.track_probs:
            metrics["probs"] = probs
        return new_state, metrics

    def _train_eval_step_impl(
        self,
        state: AttackState,
        batch: Dict[str, jax.Array],
        flags: RuntimeFlags,
        key: jax.Array,
    ) -> Tuple[AttackState, Dict[str, jax.Array]]:
        """Train step + fooling counters in ONE program: the torch loop's
        clean-forward + adv-forward + backward per batch (model.py:697-713)
        fused — the clean forward shares the compiled graph and the batch
        never leaves HBM.  Requires track_probs (adv probs reused for the
        miss counter)."""
        state, metrics = self._train_step_impl(state, batch, flags, key)
        video, prepacked = self._batch_video(batch)
        if prepacked or self._packed_eligible(video):
            clean_logits = self._packed_logits(
                None, video, flags, prepacked=prepacked,
                view_b=batch["labels"].shape[0],
            )
        else:
            x = self._normalize(video)
            clean_logits = self.apply_fn(self.variables, x)
        clean_probs = jax.nn.softmax(clean_logits, axis=-1)
        adv_probs = metrics["probs"] if "probs" in metrics else None
        if adv_probs is None:
            raise ValueError("train_eval_step requires track_probs=True")
        miss, valid = metrics_lib.fooling_counts(
            adv_probs,
            clean_probs,
            batch["labels"],
            targeted=self.config.targeted,
            target_class=self.config.target_class,
            exclude_misclassify=self.config.exclude_misclassify,
        )
        metrics["miss"] = miss
        metrics["valid"] = valid
        return state, metrics

    def _eval_step_impl(
        self,
        delta: jax.Array,
        batch: Dict[str, jax.Array],
        flags: RuntimeFlags,
        key: jax.Array,
    ) -> Dict[str, jax.Array]:
        video, prepacked = self._batch_video(batch)
        if prepacked or self._packed_eligible(video):
            self._packed_eligible(video, prepacked=prepacked)  # raises if unsupported
            vb = batch["labels"].shape[0]
            adv_logits = self._packed_logits(
                delta, video, flags, prepacked=prepacked, view_b=vb
            )
            clean_logits = self._packed_logits(
                None, video, flags, prepacked=prepacked, view_b=vb
            )
        else:
            x = self._normalize(video)
            adv = self._apply_delta(x, delta, flags, key)
            adv_logits = self.apply_fn(self.variables, adv)
            clean_logits = self.apply_fn(self.variables, x)
        adv_probs = jax.nn.softmax(adv_logits, axis=-1)
        clean_probs = jax.nn.softmax(clean_logits, axis=-1)
        miss, valid = metrics_lib.fooling_counts(
            adv_probs,
            clean_probs,
            batch["labels"],
            targeted=self.config.targeted,
            target_class=self.config.target_class,
            exclude_misclassify=self.config.exclude_misclassify,
        )
        return {
            "miss": miss,
            "valid": valid,
            "adv_probs": adv_probs,
            "clean_probs": clean_probs,
        }

    def _forward_impl(
        self,
        delta: jax.Array,
        batch: Dict[str, jax.Array],
        flags: RuntimeFlags,
        key: jax.Array,
        adversarial: bool = True,
    ) -> jax.Array:
        video, prepacked = self._batch_video(batch)
        if prepacked:
            self._packed_eligible(video, prepacked=True)  # raises if unsupported
            logits = self._packed_logits(
                delta if adversarial else None, video, flags,
                prepacked=prepacked, view_b=batch["labels"].shape[0],
            )
            return jax.nn.softmax(logits, axis=-1)
        x = self._normalize(video)
        if adversarial:
            x = self._apply_delta(x, delta, flags, key)
        logits = self.apply_fn(self.variables, x)
        return jax.nn.softmax(logits, axis=-1)

    # ---------- public API ----------

    def shard(self, batch):
        if self.mesh is None:
            return batch
        if "video_view" in batch:
            raise ValueError(
                "view-prepacked batches are single-device only (the T'B "
                "lane merge interleaves the batch across lanes); shard the "
                "b-major 'video_packed' layout instead"
            )
        return mesh_lib.shard_batch(self.mesh, batch)

    def train_step(self, state, batch, flags: RuntimeFlags, key) -> Tuple[AttackState, Dict]:
        return self._train_step(state, batch, flags, key)

    def _train_steps_impl(self, state, batch, flags, key, n: int):
        def body(s, _):
            s, m = self._train_step_impl(s, batch, flags, key)
            return s, None

        state, _ = jax.lax.scan(body, state, None, length=n)
        return state

    def train_steps(self, state, batch, flags: RuntimeFlags, key, n: int) -> AttackState:
        """n fused optimizer steps on one batch as ONE compiled program
        (lax.scan).  Exists for honest measurement on the tunneled bench
        chip, where per-dispatch RTT (~40 ms) exceeds the small-geometry
        step time so a Python dispatch loop measures the tunnel, not the
        device; also useful for the reference's fixed-step per-clip budgets
        (run_config.yml MAX_NUM_STEP) when no per-step logging is needed."""
        return self._train_steps(state, batch, flags, key, n)

    def train_eval_step(self, state, batch, flags: RuntimeFlags, key) -> Tuple[AttackState, Dict]:
        return self._train_eval_step(state, batch, flags, key)

    def eval_step(self, delta, batch, flags: RuntimeFlags, key) -> Dict:
        return self._eval_step(delta, batch, flags, key)

    def forward(self, delta, batch, flags: RuntimeFlags, key, adversarial=True):
        return self._forward(delta, batch, flags, key, adversarial=adversarial)

    def adversarial_video(self, delta, batch, flags: RuntimeFlags, key=None):
        """The clipped adversarial clip itself (res_dict['adv_video'],
        single_video_npy.py:320)."""
        x = self._normalize(jnp.asarray(batch["video"]))
        return self._apply_delta(x, jnp.asarray(delta), flags, key)
