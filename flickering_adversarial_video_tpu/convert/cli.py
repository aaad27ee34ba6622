"""Checkpoint conversion CLI + msgpack weight cache.

Convert once, load fast forever:
  python -m flickering_adversarial_video_tpu.convert.cli i3d \
      /ckpts/rgb_imagenet/model.ckpt --out i3d_kinetics400.msgpack
  python -m flickering_adversarial_video_tpu.convert.cli r2plus1d_18 \
      /ckpts/r2plus1d_18.pth --out r2plus1d_18.msgpack

The msgpack file stores the full Flax variables pytree
(flax.serialization.msgpack_serialize); `load_variables` restores it without
TensorFlow or torch present.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict

import numpy as np


def save_variables(variables: Dict[str, Any], path: str) -> None:
    import flax.serialization

    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(variables))


def load_variables(path: str) -> Dict[str, Any]:
    import flax.serialization

    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def convert(
    model_name: str, ckpt_path: str, eval_type: str = "rgb"
) -> Dict[str, Any]:
    if str(ckpt_path).endswith(".msgpack"):
        return load_variables(ckpt_path)
    if model_name == "i3d":
        from .tf_i3d import convert_i3d_checkpoint

        return convert_i3d_checkpoint(ckpt_path, eval_type=eval_type)
    from .torch_video_resnet import convert_video_resnet_state_dict

    import torch

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_video_resnet_state_dict(
        {k: np.asarray(v) for k, v in sd.items()}, model_name
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument(
        "model",
        choices=["i3d", "r3d_18", "mc3_18", "r2plus1d_18", "r2plus1d_34"],
    )
    p.add_argument(
        "ckpt",
        help="TF checkpoint prefix (i3d), torch state_dict file, or an "
        "already-converted .msgpack (for --dump-golden without re-converting)",
    )
    p.add_argument("--out", help="output .msgpack path")
    p.add_argument(
        "--eval-type",
        default="rgb",
        choices=["rgb", "rgb600"],
        help="I3D checkpoint variable-name world (rgb600 = Kinetics-600, "
        "prefix-less names; kinetics_i3d_utils.py:47-56)",
    )
    p.add_argument(
        "--dump-golden",
        metavar="NPZ",
        help="record canonical-clip logits for these weights into a golden "
        ".npz that tests/test_real_weight_golden.py verifies forever after "
        "(see convert/golden.py)",
    )
    args = p.parse_args(argv)
    if not args.out and not args.dump_golden:
        p.error("nothing to do: pass --out and/or --dump-golden")
    from ..runners.common import apply_platform_env

    apply_platform_env()
    variables = convert(args.model, args.ckpt, eval_type=args.eval_type)
    if args.out:
        save_variables(variables, args.out)
        n = sum(
            np.prod(x.shape)
            for x in __import__("jax").tree_util.tree_leaves(variables)
        )
        print(f"wrote {args.out} ({n/1e6:.1f}M values)")
    if args.dump_golden:
        from .golden import dump_golden

        weights_file = args.out or args.ckpt
        if not str(weights_file).endswith(".msgpack"):
            p.error("--dump-golden needs msgpack weights (pass --out too)")
        # head width from the checkpoint itself (the registry default would
        # mis-build ig65m's 359/487-way or rgb600's 600-way heads)
        from ..runners.common import infer_num_classes

        num_classes = infer_num_classes(variables, args.model)
        payload = dump_golden(
            args.model, variables, args.dump_golden, weights_file,
            num_classes=num_classes,
        )
        print(
            f"wrote golden {args.dump_golden} "
            f"(top-5 classes: {payload['top5'].tolist()})"
        )


if __name__ == "__main__":
    main()
