"""Synthetic stand-ins for the egress-day victim assets.

The real-weight parity flow (scripts/real_weight_parity.sh) gets exactly one
egress-capable opportunity to run against the true DeepMind I3D checkpoint
(reference download_ckpt_and_data.sh:1-11, restore at
kinetics_i3d_utils.py:41-62) and the torchvision/ig65m .pth files
(utils_cv/action_recognition/model.py:402-441).  A script bug would burn
that opportunity — so this module fabricates byte-format-faithful fakes:

  * a TF1 Saver checkpoint with the full `RGB/inception_i3d/...` variable
    naming (incl. sonnet's [1,1,1,1,C] moving-stat layout) at
    `<data>/checkpoints/rgb_imagenet/model.ckpt*`;
  * torchvision-layout `.pth` state_dicts for r3d_18 / mc3_18 / r2plus1d_18
    (and ig65m-style r2plus1d_34 with 359/487-way heads on demand);
  * `rgb_<vid>@<class>.npy` clips for the single-video driver (config #1);
  * uint8-schema tfrecord shards for the universal driver (config #3).

`REHEARSAL=1 sh scripts/real_weight_parity.sh` then drives the REAL script
chain — convert -> msgpack -> golden dump -> golden pytest (skip count 0) ->
short config #1/#3 attacks — end to end against these fakes, so the one real
run exercises only already-rehearsed code.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

_SONNET_STAT_LAYOUT = (1, 1, 1, 1)  # moving stats are [1,1,1,1,C] in the ckpt


# ---------------- I3D: Flax tree -> TF1 Saver checkpoint ----------------


def i3d_var_map(variables, bare_names: bool = False) -> Dict[str, np.ndarray]:
    """Invert convert/tf_i3d.py's name mapping: emit the reference-checkpoint
    variable names (`RGB/inception_i3d/<module>/{w,b,beta,moving_*}`) holding
    the tree's actual values, so the converted tree round-trips exactly.

    bare_names=True emits the Kinetics-600 checkpoints' PREFIX-LESS names —
    the reference strips `RGB/inception_i3d/` from its variable map for
    eval_type='rgb600' (kinetics_i3d_utils.py:47-56)."""
    var_map: Dict[str, np.ndarray] = {}
    prefix = "" if bare_names else "RGB/inception_i3d/"

    def visit(collection, tree, path):
        for k, v in tree.items():
            p = path + [k]
            if isinstance(v, dict):
                visit(collection, v, p)
                continue
            module = "/".join(p[:-1])
            leaf = p[-1]
            if collection == "params":
                name = {"kernel": "w", "bias": "b"}[leaf]
                if p[-2] == "batch_norm":
                    name = "beta"
            else:
                name = {"mean": "moving_mean", "var": "moving_variance"}[leaf]
            value = np.asarray(v, np.float32)
            if name in ("moving_mean", "moving_variance"):
                value = value.reshape(_SONNET_STAT_LAYOUT + value.shape)
            var_map[f"{prefix}{module}/{name}"] = value

    visit("params", variables["params"], [])
    visit("batch_stats", variables["batch_stats"], [])
    return var_map


def write_i3d_saver_checkpoint(
    ckpt_prefix: str,
    num_classes: int = 400,
    seed: int = 0,
    variables=None,
    eval_type: str = "rgb",
) -> str:
    """Random-weight DeepMind-layout TF checkpoint at `ckpt_prefix`.

    eval_type='rgb600' writes the Kinetics-600 layout: prefix-less variable
    names (kinetics_i3d_utils.py:47-56), conventionally a 600-way head."""
    import jax
    import tensorflow as tf

    from ..models.i3d import init_i3d_params

    if variables is None:
        variables = init_i3d_params(
            jax.random.key(seed), num_classes=num_classes, frames=16, size=224
        )
    var_map = i3d_var_map(variables, bare_names=eval_type == "rgb600")
    os.makedirs(os.path.dirname(ckpt_prefix), exist_ok=True)
    g = tf.Graph()
    with g.as_default():
        tf_vars = [
            tf.compat.v1.get_variable(name, initializer=value)
            for name, value in var_map.items()
        ]
        saver = tf.compat.v1.train.Saver(var_list=tf_vars)
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, ckpt_prefix)
    return ckpt_prefix


# ------------- video-ResNet: Flax tree -> torchvision state_dict -------------


def _torch_conv(kernel) -> np.ndarray:
    # [kT, kH, kW, I, O] -> [O, I, kT, kH, kW] (convert/torch_video_resnet.py)
    return np.asarray(kernel, np.float32).transpose(4, 3, 0, 1, 2)


def _emit_bn(sd, prefix: str, bn_params, bn_stats) -> None:
    sd[f"{prefix}.weight"] = np.asarray(bn_params["scale"], np.float32)
    sd[f"{prefix}.bias"] = np.asarray(bn_params["bias"], np.float32)
    sd[f"{prefix}.running_mean"] = np.asarray(bn_stats["mean"], np.float32)
    sd[f"{prefix}.running_var"] = np.asarray(bn_stats["var"], np.float32)
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def video_resnet_state_dict(
    variant: str, num_classes: int = 400, seed: int = 0
) -> Dict[str, np.ndarray]:
    """Random-weight torchvision-layout state_dict (numpy values) for
    `variant`, built by inverting convert_video_resnet_state_dict."""
    import jax
    import jax.numpy as jnp

    from ..models.registry import create_model

    model, _ = create_model(variant, num_classes=num_classes)
    variables = model.init(jax.random.key(seed), jnp.zeros((1, 4, 32, 32, 3)))
    params, stats = variables["params"], variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}
    r2plus1 = variant.startswith("r2plus1d")

    if r2plus1:
        sd["stem.0.weight"] = _torch_conv(params["stem"]["conv_s"]["kernel"])
        _emit_bn(sd, "stem.1", params["stem"]["bn_s"], stats["stem"]["bn_s"])
        sd["stem.3.weight"] = _torch_conv(params["stem"]["conv_t"]["kernel"])
        _emit_bn(sd, "stem.4", params["stem"]["bn_t"], stats["stem"]["bn_t"])
    else:
        sd["stem.0.weight"] = _torch_conv(params["stem"]["conv"]["kernel"])
        _emit_bn(sd, "stem.1", params["stem"]["bn"], stats["stem"]["bn"])

    layer = 1
    while f"layer{layer}/block0" in params:
        block = 0
        while (f_name := f"layer{layer}/block{block}") in params:
            bp, bs = params[f_name], stats[f_name]
            t_prefix = f"layer{layer}.{block}"
            for conv_name in ("conv1", "conv2"):
                cseq = f"{t_prefix}.{conv_name}.0"
                if r2plus1:
                    sd[f"{cseq}.0.weight"] = _torch_conv(
                        bp[conv_name]["conv_s"]["kernel"]
                    )
                    _emit_bn(
                        sd, f"{cseq}.1",
                        bp[conv_name]["bn_mid"], bs[conv_name]["bn_mid"],
                    )
                    sd[f"{cseq}.3.weight"] = _torch_conv(
                        bp[conv_name]["conv_t"]["kernel"]
                    )
                else:
                    sd[f"{cseq}.weight"] = _torch_conv(bp[conv_name]["conv"]["kernel"])
                n = conv_name[-1]
                _emit_bn(sd, f"{t_prefix}.{conv_name}.1", bp[f"bn{n}"], bs[f"bn{n}"])
            if "downsample_conv" in bp:
                sd[f"{t_prefix}.downsample.0.weight"] = _torch_conv(
                    bp["downsample_conv"]["kernel"]
                )
                _emit_bn(
                    sd, f"{t_prefix}.downsample.1",
                    bp["downsample_bn"], bs["downsample_bn"],
                )
            block += 1
        layer += 1

    sd["fc.weight"] = np.asarray(params["fc"]["kernel"], np.float32).T
    sd["fc.bias"] = np.asarray(params["fc"]["bias"], np.float32)
    return sd


def write_torchvision_pth(
    path: str, variant: str, num_classes: int = 400, seed: int = 0
) -> str:
    import torch

    sd = video_resnet_state_dict(variant, num_classes=num_classes, seed=seed)
    # .copy(): some leaves alias jax buffers (read-only), which torch warns on
    torch.save(
        {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()}, path
    )
    return path


# ---------------- attack data: npy clips + tfrecord shards ----------------


def write_npy_clips(
    npy_dir: str,
    class_names: List[str],
    *,
    frames: int = 90,
    size: int = 224,
    seed: int = 0,
    predict_fn=None,
    candidates: int = 24,
) -> List[str]:
    """One `rgb_fakeN@<class>.npy` clip (f32 in [-1,1]) per class name.

    With `predict_fn` (clip -> logits[400]) the class in each filename is the
    victim's OWN clean prediction — mandatory for rehearsal assets: the
    single-video driver skips clean-misclassified clips
    (i3d_adversarial_main_single_video_npy.py:137-139), and a random-weight
    victim misclassifies a randomly-labeled clip with probability ~399/400,
    which would leave the rehearsal's config #1 stage with zero videos.  Per
    slot, `candidates` random clips are tried and the one with the largest
    top1-top2 logit margin wins, so the runner's own forward (bf16/packed
    variations included) reproduces the argmax."""
    from ..data.npy import save_npy_clip
    from ..utils.labels import load_label_map

    os.makedirs(npy_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    label_names = load_label_map(None) if predict_fn is not None else None
    paths = []
    for i, cls in enumerate(class_names):
        best = None
        for _ in range(candidates if predict_fn is not None else 1):
            u8 = rng.integers(0, 256, (frames, size, size, 3), dtype=np.uint8)
            clip = u8.astype(np.float32) / 128.0 - 1.0
            if predict_fn is None:
                best = (0.0, clip, cls)
                break
            logits = np.asarray(predict_fn(clip), np.float32).reshape(-1)
            order = np.argsort(-logits, kind="stable")
            margin = float(logits[order[0]] - logits[order[1]])
            if best is None or margin > best[0]:
                best = (margin, clip, label_names[order[0]])
        margin, clip, cls_name = best
        if predict_fn is not None and margin < 1e-4:
            print(
                f"[fake_assets] warn: clip {i} best top1-top2 margin {margin:.2e} "
                "is tiny; the runner's forward may flip the argmax"
            )
        p = os.path.join(npy_dir, f"rgb_fake{i}@{cls_name.replace(' ', '_')}.npy")
        save_npy_clip(p, clip)
        paths.append(p)
    return paths


def write_tfrecord_shards(
    out_dir: str,
    *,
    n_shards: int = 2,
    per_shard: int = 4,
    frames: int = 90,
    size: int = 224,
    num_classes: int = 400,
    seed: int = 0,
) -> List[str]:
    """uint8-schema shards named like the shuffled all-class writer's."""
    from ..data.tfrecord import TFRecordWriter, make_uint8_example

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    shards = []
    for s in range(n_shards):
        path = os.path.join(out_dir, f"all_cls_{s:04d}.tfrecords")
        with TFRecordWriter(path) as w:
            for _ in range(per_shard):
                video = rng.integers(0, 256, (frames, size, size, 3), dtype=np.uint8)
                label = int(rng.integers(0, num_classes))
                w.write(make_uint8_example(video, label))
        shards.append(path)
    return shards


# ---------------- the rehearsal asset set ----------------


def fabricate(
    data_dir: str,
    *,
    frames: int = 8,
    size: int = 32,
    npy_classes: Optional[List[str]] = None,
    torch_variants=("r3d_18", "mc3_18", "r2plus1d_18"),
) -> Dict[str, object]:
    """Everything scripts/real_weight_parity.sh consumes, under `data_dir`.

    Rehearsal geometry is tiny (CPU-fast) but structurally faithful: every
    variable name, layout transform, schema and filename convention matches
    the real assets; only shapes (T, S) and weight values differ.
    """
    import jax

    from ..models.i3d import init_i3d_params
    from ..models.registry import create_model

    variables = init_i3d_params(
        jax.random.key(0), num_classes=400, frames=16, size=224
    )
    out: Dict[str, object] = {}
    out["i3d_ckpt"] = write_i3d_saver_checkpoint(
        os.path.join(data_dir, "checkpoints", "rgb_imagenet", "model.ckpt"),
        variables=variables,
    )
    # Kinetics-600 I3D: prefix-less Saver layout, 600-way head (reference
    # eval_type='rgb600', kinetics_i3d_utils.py:47-56).  Init at a tiny
    # geometry — conv/BN variable shapes are geometry-independent.
    out["i3d_rgb600_ckpt"] = write_i3d_saver_checkpoint(
        os.path.join(data_dir, "checkpoints", "rgb_scratch_kin600", "model.ckpt"),
        variables=init_i3d_params(
            jax.random.key(1), num_classes=600, frames=8, size=64
        ),
        eval_type="rgb600",
    )
    for variant in torch_variants:
        out[variant] = write_torchvision_pth(
            os.path.join(data_dir, f"{variant}.pth"), variant
        )
    # ig65m r2plus1d_34 heads (torch.hub moabitcoin/ig65m-pytorch via the
    # reference's MODELS table, model.py:47-52): 32-frame/359-way and
    # 8-frame/487-way state_dicts
    for name, ncls in (
        ("r2plus1d_34_32_ig65m", 359),
        ("r2plus1d_34_8_ig65m", 487),
    ):
        out[name] = write_torchvision_pth(
            os.path.join(data_dir, f"{name}.pth"),
            "r2plus1d_34",
            num_classes=ncls,
            seed=ncls,
        )
    # clean-prediction labeling: the SAME model construction the runner uses
    # (runners/common.build_victim -> create_model), f32 so argmaxes carry
    # over; see write_npy_clips docstring
    import jax.numpy as jnp

    model, _ = create_model("i3d", compute_dtype=jnp.float32)
    predict = jax.jit(lambda x: model.apply(variables, x[None])[0][0])
    out["npy"] = write_npy_clips(
        os.path.join(data_dir, "videos_for_tests", "npy"),
        npy_classes or ["juggling balls", "bartending"],
        frames=frames,
        size=size,
        predict_fn=lambda clip: predict(jnp.asarray(clip)),
    )
    out["tfrecords"] = write_tfrecord_shards(
        os.path.join(data_dir, "tfrecord", "test_all_cls"),
        frames=frames,
        size=size,
    )
    return out


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("data_dir")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=32)
    args = p.parse_args(argv)
    from ..runners.common import apply_platform_env

    apply_platform_env()
    out = fabricate(args.data_dir, frames=args.frames, size=args.size)
    for k, v in out.items():
        print(f"fabricated {k}: {v}")


if __name__ == "__main__":
    main()
