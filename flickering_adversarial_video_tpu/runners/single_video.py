"""Single-video flickering attack driver (config #1).

TPU-native rebuild of i3d_adversarial_main_single_video_npy.py: iterate the
npy clip directory, skip clean-misclassified clips, attack each until fooled
(stop rule `step > MAX_NUM_STEP and is_adversarial`, :313), dump a pkl with
the full per-step history under the reference's filename convention
(:330-334).

Usage: python -m flickering_adversarial_video_tpu.runners.single_video [run_config.yml]
"""

from __future__ import annotations

import os
import sys


from ..data.npy import list_npy_videos, load_npy_clip, parse_label_from_filename
from ..engine.loops import flags_from_config, single_video_attack
from ..utils.config import load_config
from ..viz.results import save_result_pkl
from .common import build_engine, enable_compilation_cache


def run(cfg, *, frames: int = 90, size=None, stop_rule: str = "reference", max_videos=None, dashboard_path=None, slots: int = 1, use_mesh: bool = False):
    attack_cfg = cfg.SINGLE_VIDEO_ATTACK
    engine, labels = build_engine(attack_cfg, cfg.MODEL, frames=frames, size=size)
    flags = flags_from_config(attack_cfg)

    npy_path = attack_cfg.NPY_PATH
    result_path = attack_cfg.PKL_RESULT_PATH
    if not os.path.exists(npy_path):
        print(f"npy path {npy_path} does not exist")
        return []

    written = []
    videos = list_npy_videos(npy_path)[:max_videos]
    # an explicit --slots beats the YAML key; the CLI default (1) defers to it
    if slots == 1:
        slots = int(attack_cfg.get("SLOTS", 1))
    if slots > 1:
        if dashboard_path:
            print(
                "[warn] live dashboard is per-clip and not supported with "
                "SLOTS > 1; continuing without it"
            )
        return _run_vectorized(
            engine, labels, attack_cfg, flags, videos, result_path,
            frames=frames, slots=slots, stop_rule=stop_rule, use_mesh=use_mesh,
        )
    for k, video_path in enumerate(videos):
        clip = load_npy_clip(video_path, frames=frames)
        correct_cls = parse_label_from_filename(video_path)
        if correct_cls not in labels:
            print(f"skip {video_path}: unknown class {correct_cls!r}")
            continue
        label = labels.index(correct_cls)
        target_label = None
        if attack_cfg.TARGETED_ATTACK:
            target_label = labels.index(attack_cfg.TARGETED_CLASS)

        log_fn = None
        if dashboard_path:
            from ..viz.live import LiveDashboard

            dash = LiveDashboard(
                title=correct_cls, save_path=dashboard_path, refresh_every=100
            )
            log_fn = dash.update
        res = single_video_attack(
            engine,
            clip,
            label,
            flags,
            target_label=target_label,
            max_step=int(attack_cfg.MAX_NUM_STEP),
            stop_rule=stop_rule,
            seed=k,
            log_fn=log_fn,
        )
        if res is None:
            print(f"skip video {video_path}: clean model misclassifies")
            continue
        res["correct_cls"] = correct_cls
        path = save_result_pkl(res, result_path, correct_cls)
        written.append(path)
        print(
            f"[{k}] {correct_cls}: fooled={res['is_adversarial']} "
            f"steps={res['total_steps']} th={res['fatness'][-1]:.2f}% "
            f"rg={res['smoothness'][-1]:.2f}% ({res['steps_per_sec']:.2f} steps/s)"
        )
    return written


def _run_vectorized(
    engine, labels, attack_cfg, flags, videos, result_path, *,
    frames, slots, stop_rule, use_mesh,
):
    """N clips in flight (engine/vector_sweep.vector_single_video_attacks);
    same per-clip seeds, stop rule, pkl schema and filenames as the
    sequential path."""
    from ..engine.vector_sweep import vector_single_video_attacks
    from ..parallel.mesh import make_mesh

    clips, true_labels, names, seeds = [], [], [], []
    for k, video_path in enumerate(videos):
        correct_cls = parse_label_from_filename(video_path)
        if correct_cls not in labels:
            print(f"skip {video_path}: unknown class {correct_cls!r}")
            continue
        clips.append(load_npy_clip(video_path, frames=frames))
        true_labels.append(labels.index(correct_cls))
        names.append(correct_cls)
        seeds.append(k)  # sequential path uses the enumeration index as seed
    target_label = None
    if attack_cfg.TARGETED_ATTACK:
        target_label = labels.index(attack_cfg.TARGETED_CLASS)
    results = vector_single_video_attacks(
        engine,
        clips,
        true_labels,
        flags,
        slots=slots,
        max_step=int(attack_cfg.MAX_NUM_STEP),
        stop_rule=stop_rule,
        target_label=target_label,
        mesh=make_mesh() if use_mesh else None,
        seeds=seeds,
    )
    written = []
    for k, (res, correct_cls) in enumerate(zip(results, names)):
        if res is None:
            print(f"skip video {k} ({correct_cls}): clean model misclassifies")
            continue
        res["correct_cls"] = correct_cls
        path = save_result_pkl(res, result_path, correct_cls)
        written.append(path)
        print(
            f"[{k}] {correct_cls}: fooled={res['is_adversarial']} "
            f"steps={res['total_steps']} th={res['fatness'][-1]:.2f}% "
            f"rg={res['smoothness'][-1]:.2f}% ({res['steps_per_sec']:.2f} steps/s)"
        )
    return written


def main(argv=None):
    import argparse

    argv = argv if argv is not None else sys.argv[1:]
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default=None, help="run_config.yml path")
    p.add_argument("--frames", type=int, default=90)
    p.add_argument("--size", type=int, default=None)
    p.add_argument(
        "--stop-rule", default="reference", choices=("reference", "early"),
        help="'early' stops at first fooling (sweep/rehearsal throughput)",
    )
    p.add_argument("--max-videos", type=int, default=None)
    p.add_argument(
        "--slots", type=int, default=1,
        help="clips attacked simultaneously (vectorized; also YAML SLOTS)",
    )
    p.add_argument(
        "--mesh", action="store_true",
        help="shard the slot axis over all chips (slots %% n_devices == 0)",
    )
    args = p.parse_args(argv)
    enable_compilation_cache()
    cfg = load_config(args.config)
    run(
        cfg,
        frames=args.frames,
        size=args.size,
        stop_rule=args.stop_rule,
        max_videos=args.max_videos,
        slots=args.slots,
        use_mesh=args.mesh,
    )


if __name__ == "__main__":
    main()
