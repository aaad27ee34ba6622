"""Per-video attack statistics sweep on the video-ResNet victims (config #4).

TPU-native rebuild of r2plus1d_main_statistics_single_video_attack.py: build
a deterministic split (seed 13, :84-114), then run the per-video flickering
attack (Linf 0.2 default, :43) over each clip with skip-if-done resumability
and dynamic max-norm escalation (engine/sweep.py).

Usage:
  python -m flickering_adversarial_video_tpu.runners.torch_per_video \
      --model r2plus1d_18 --video-root /data/kinetics400/val \
      --num-videos 100 --model-dir results_per_video
"""

from __future__ import annotations

import argparse
import random
from typing import List, Optional

import jax.numpy as jnp

from ..attack import TorchStyleFlickerSpec
from ..data.video_dataset import VideoDataset, VideoRecord, records_from_folders
from ..engine import AttackConfig, AttackEngine, RuntimeFlags
from ..engine.sweep import fit_many_videos
from ..utils.labels import load_label_map
from .common import build_victim, enable_compilation_cache


def build_split(video_root: str, class_names, num_videos: int, seed: int = 13) -> List[VideoRecord]:
    """Deterministic split: shuffle with a fixed seed and truncate
    (reference r2plus1d_main_statistics_single_video_attack.py:84-114
    uses random.seed(a=13))."""
    records = records_from_folders(video_root, class_names)
    rnd = random.Random(seed)
    rnd.shuffle(records)
    return records[:num_videos]


def run(
    model_name: str = "r2plus1d_18",
    *,
    records: List[VideoRecord],
    label_names,
    ckpt_path: Optional[str] = None,
    l_inf_norm: float = 0.2,
    n_iter: int = 3000,
    sample_length: int = 16,
    input_size: int = 112,
    model_dir: str = "results_per_video",
    loss_cfg: Optional[dict] = None,
    max_videos: Optional[int] = None,
    num_classes: Optional[int] = None,
    compute_dtype=jnp.bfloat16,
    slots: int = 1,
    use_mesh: bool = False,
):
    loss_cfg = loss_cfg or {}
    apply_fn, variables = build_victim(
        model_name, ckpt_path, compute_dtype, sample_length, input_size,
        num_classes=num_classes,
    )
    spec = TorchStyleFlickerSpec(frames=sample_length, max_norm=l_inf_norm)
    cfg = AttackConfig(
        improve_loss=loss_cfg.get("improve_loss", True),
        margin=loss_cfg.get("margin", 0.05),
        targeted=loss_cfg.get("targeted", False),
        use_logits=loss_cfg.get("use_logits", False),
        norm_world="meanstd",
        reg_weighting="torch",
        target_class=loss_cfg.get("target_class"),
    )
    from .common import infer_num_classes, make_victim_packed_fn

    engine = AttackEngine(
        apply_fn, variables, spec, cfg, track_probs=False,
        apply_packed_fn=make_victim_packed_fn(
            model_name, variables,
            infer_num_classes(variables, model_name, num_classes),
            compute_dtype,
        ),
    )
    flags = RuntimeFlags(
        beta0=loss_cfg.get("lambda_", 1.0),
        beta1=loss_cfg.get("beta_1", 0.5),
        max_norm=l_inf_norm,
    )
    ds = VideoDataset(
        records,
        sample_length=sample_length,
        input_size=input_size,
        random_offset=False,
        random_crop=False,
        random_flip=False,
    )
    if slots > 1:
        # vectorized sweep: `slots` videos in flight as one batched XLA
        # program (engine/vector_sweep.py) — same seeds, ledger and result
        # schema as the sequential path, so the two can resume each other
        from ..engine.vector_sweep import vector_fit_many_videos
        from ..parallel.mesh import make_mesh

        return vector_fit_many_videos(
            engine,
            ds.batches(1, drop_remainder=False, shuffle=False),
            flags,
            model_dir=model_dir,
            label_names=label_names,
            slots=slots,
            n_iter=n_iter,
            max_norm=l_inf_norm,
            max_videos=max_videos,
            # slot axis sharded over the chips: N independent attacks spread
            # across the mesh, zero collectives (tests/test_vector_sweep.py)
            mesh=make_mesh() if use_mesh else None,
        )
    return fit_many_videos(
        engine,
        ds.batches(1, drop_remainder=False, shuffle=False),
        flags,
        model_dir=model_dir,
        label_names=label_names,
        n_iter=n_iter,
        max_norm=l_inf_norm,
        max_videos=max_videos,
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="r2plus1d_18")
    p.add_argument("--video-root", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--num-videos", type=int, default=100)
    p.add_argument("--linf", type=float, default=0.2)
    p.add_argument("--model-dir", default="results_per_video")
    p.add_argument(
        "--num-classes", type=int, default=None,
        help="head width (359/487 for ig65m r2plus1d_34; default: registry)",
    )
    p.add_argument(
        "--slots", type=int, default=1,
        help="videos attacked simultaneously (vectorized sweep; 1 = sequential)",
    )
    p.add_argument(
        "--mesh", action="store_true",
        help="shard the slot axis over all chips (slots %% n_devices == 0)",
    )
    args = p.parse_args(argv)
    enable_compilation_cache()
    from ..utils.labels import warn_if_placeholder

    labels = load_label_map(None, num_classes=args.num_classes or 400)
    warn_if_placeholder(labels)
    class_names = [c.replace(" ", "_") for c in labels]
    records = build_split(args.video_root, class_names, args.num_videos)
    out = run(
        args.model,
        records=records,
        label_names=labels,
        ckpt_path=args.ckpt,
        l_inf_norm=args.linf,
        model_dir=args.model_dir,
        num_classes=args.num_classes,
        slots=args.slots,
        use_mesh=args.mesh,
    )
    print(out)


if __name__ == "__main__":
    main()
