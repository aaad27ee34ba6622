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

    def evaluate(
        self,
        samples,
        adv_flag: float = 0.0,
        report_every: int = 100,
        verbose: bool = True,
    ) -> dict:
        """Per-video inference statistics, mirroring the reference's
        VideoLearnerAdversarial.evaluate (model.py:1267-1319): for each video
        — given as (clips, label) with clips [N, T, H, W, C], N sampled clips
        of the same video — time one inference, record the video-level
        prediction (summed clip outputs, :1299) and every clip-level
        prediction, and report average inference time plus video/clip
        accuracy.

        Timing note: `time()` around a dispatch would measure nothing under
        JAX's async execution, so the result is blocked on
        (block_until_ready) before the clock stops — the honest equivalent of
        the reference's `.cpu().numpy()` sync (:1294-1296)."""
        import time

        ret = dict(
            infer_times=[],
            video_preds=[],
            video_trues=[],
            clip_preds=[],
            clip_trues=[],
        )
        for i, (clips, label) in enumerate(samples):
            if verbose and i and i % report_every == 0:
                print(f"Processing {i} samples..")
            clips = np.asarray(clips)
            if clips.ndim == 4:
                clips = clips[None]
            start = time.perf_counter()
            probs = self(clips, adv_flag=adv_flag)
            ret["infer_times"].append(time.perf_counter() - start)
            ret["video_preds"].append(int(probs.sum(axis=0).argmax()))
            ret["video_trues"].append(int(label))
            ret["clip_preds"].extend(int(p) for p in probs.argmax(axis=1))
            ret["clip_trues"].extend([int(label)] * clips.shape[0])
        n = len(ret["video_trues"])
        if n:
            video_acc = float(
                np.mean(np.array(ret["video_preds"]) == np.array(ret["video_trues"]))
            )
            clip_acc = float(
                np.mean(np.array(ret["clip_preds"]) == np.array(ret["clip_trues"]))
            )
            ret["video_accuracy"] = video_acc
            ret["clip_accuracy"] = clip_acc
            if verbose:
                print(
                    f"Avg. inference time per video ({n} videos) =",
                    round(float(np.mean(ret["infer_times"])) * 1000, 2),
                    "ms",
                )
                print("Video prediction accuracy =", round(video_acc, 2))
                print("Clip prediction accuracy =", round(clip_acc, 2))
        return ret
