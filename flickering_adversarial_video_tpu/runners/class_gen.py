"""Single-class generalization attack driver (config #2).

TPU-native rebuild of i3d_adversarial_main_single_class_gen.py: one delta
fooling every video of one Kinetics class — epoch loop over the class's
tfrecord shards with per-epoch exclude-misclassified fooling eval, epoch-end
checkpoint + pkl dump (:334-373), resume from the latest checkpoint
(:194-197).

Usage: python -m flickering_adversarial_video_tpu.runners.class_gen [run_config.yml]
"""

from __future__ import annotations

import os
import pickle
import sys

from ..data.tfrecord import list_shards, tfrecord_batches
from ..engine.checkpoint import AttackCheckpointer
from ..engine.loops import batched_attack_loop, flags_from_config
from ..utils.config import load_config
from ..viz.tensorboard import ScalarWriter
from .common import build_engine, enable_compilation_cache, make_shard_batches


def run(cfg, *, frames: int = 90, size=None, max_steps=None):
    attack_cfg = cfg.CLASS_GEN_ATTACK
    engine, labels = build_engine(attack_cfg, cfg.MODEL, frames=frames, size=size, track_probs=False)
    flags = flags_from_config(attack_cfg)

    train_shards = list_shards(
        attack_cfg.TF_RECORDS_TRAIN_PATH, attack_cfg.NUM_OF_TRAIN_TF_RECORDS
    )
    val_shards = list_shards(
        attack_cfg.TF_RECORDS_VAL_PATH, attack_cfg.NUM_OF_VAL_TF_RECORDS
    )
    batch_size = int(attack_cfg.BATCH_SIZE)

    result_path = attack_cfg.PKL_RESULT_PATH
    os.makedirs(result_path, exist_ok=True)
    ckpt = AttackCheckpointer(os.path.join(result_path, "ckpt"))
    writer = ScalarWriter(os.path.join(result_path, "train"))

    state = engine.init_state()
    start_step = 0
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
        start_step = int(state.step)
        print(f"resumed from step {start_step}")

    targeted_label = None
    if attack_cfg.TARGETED_ATTACK:
        targeted_label = labels.index(attack_cfg.TARGETED_CLASS)

    # host-prepacked input: same default-on fast path as the universal runner
    _batches, _ = make_shard_batches(
        attack_cfg, engine, lambda *a, **kw: tfrecord_batches(*a, **kw),
        frames=frames, size=size, batch_size=batch_size,
    )

    out = batched_attack_loop(
        engine,
        lambda: _batches(train_shards),
        lambda: _batches(val_shards),
        flags,
        max_steps=max_steps or int(attack_cfg.MAX_NUM_STEP),
        state=state,
        checkpointer=ckpt,
        checkpoint_every=None,  # epoch-end cadence (class-gen parity)
        writer=writer,
        targeted_label=targeted_label,
        start_step=start_step,
    )
    writer.close()

    h = out["history"]
    res_dict = {
        "total_loss_l": h["total_loss"],
        "adv_loss_l": h["adv_loss"],
        "reg_loss_l": h["reg_loss"],
        "norm_reg_loss_l": h["norm_reg"],
        "diff_norm_reg_loss_l": h["diff_norm_reg"],
        "perturbation": h["perturbation"],
        "total_steps": out["steps"],
        "beta_1": float(attack_cfg.BETA_1),
        "beta_2": float(attack_cfg.BETA_2),
        "fatness": h["thickness"],
        "smoothness": h["roughness"],
        "fool_rate": h["fool_rate"],
    }
    with open(os.path.join(result_path, "res.pkl"), "wb") as f:
        pickle.dump(res_dict, f)
    print(
        f"done: steps={out['steps']} fooling={out['final_eval']['miss_rate']:.4f} "
        f"({out['steps_per_sec']:.2f} steps/s)"
    )
    return out


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    enable_compilation_cache()
    cfg = load_config(argv[0] if argv else None)
    run(cfg)


if __name__ == "__main__":
    main()
