"""torchvision VideoResNet state_dict -> Flax variables.

The reference loads its torch victims with
`getattr(torchvision.models.video, base_model)(True, True)`
(utils_cv/action_recognition/model.py:421); this converter maps that public
state_dict layout onto models/video_resnet.py:

  stem.0 / stem.1 (r3d, mc3)                 -> stem.conv / stem.bn
  stem.0 / stem.1 / stem.3 / stem.4 (r2+1d)  -> stem.conv_s/bn_s/conv_t/bn_t
  layerL.B.conv1.0 (+ .1 BN, ReLU)           -> layerL/blockB.conv1 + bn1
  layerL.B.conv2.0 (+ .1 BN)                 -> layerL/blockB.conv2 + bn2
  layerL.B.downsample.{0,1}                  -> downsample_conv / downsample_bn
  fc                                         -> fc
  (r2+1d conv seq: convK.0.{0,1,3}           -> convK.{conv_s, bn_mid, conv_t})

Weight layout transforms: conv [O, I, kT, kH, kW] -> [kT, kH, kW, I, O];
linear [O, I] -> [I, O]; BN weight/bias/running_mean/running_var ->
scale/bias + batch_stats mean/var.

Accepts numpy arrays or anything np.asarray can consume (incl. torch tensors
detached on CPU), so torch itself is optional at convert time.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv_kernel(w) -> jnp.ndarray:
    return jnp.asarray(_np(w).transpose(2, 3, 4, 1, 0))


def _bn(sd: Mapping[str, Any], prefix: str):
    params = {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }
    stats = {
        "mean": jnp.asarray(_np(sd[f"{prefix}.running_mean"])),
        "var": jnp.asarray(_np(sd[f"{prefix}.running_var"])),
    }
    return params, stats


_LAYER_COUNTS = {"18": (2, 2, 2, 2), "34": (3, 4, 6, 3)}


def _convert_conv_seq(sd, prefix: str, variant: str):
    """One conv_builder instance: simple/no_temporal are a bare Conv3d; 2plus1
    is Sequential(conv_s, bn_mid, relu, conv_t)."""
    if variant.startswith("r2plus1d"):
        bn_p, bn_s = _bn(sd, f"{prefix}.1")
        params = {
            "conv_s": {"kernel": _conv_kernel(sd[f"{prefix}.0.weight"])},
            "bn_mid": bn_p,
            "conv_t": {"kernel": _conv_kernel(sd[f"{prefix}.3.weight"])},
        }
        stats = {"bn_mid": bn_s}
        return params, stats
    return {"conv": {"kernel": _conv_kernel(sd[f"{prefix}.weight"])}}, {}


def convert_video_resnet_state_dict(
    state_dict: Mapping[str, Any], variant: str
) -> Dict[str, Any]:
    """Returns {'params': ..., 'batch_stats': ...} for models.VideoResNet."""
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    if variant.startswith("r2plus1d"):
        bn_s_p, bn_s_s = _bn(sd, "stem.1")
        bn_t_p, bn_t_s = _bn(sd, "stem.4")
        params["stem"] = {
            "conv_s": {"kernel": _conv_kernel(sd["stem.0.weight"])},
            "bn_s": bn_s_p,
            "conv_t": {"kernel": _conv_kernel(sd["stem.3.weight"])},
            "bn_t": bn_t_p,
        }
        stats["stem"] = {"bn_s": bn_s_s, "bn_t": bn_t_s}
    else:
        bn_p, bn_s = _bn(sd, "stem.1")
        params["stem"] = {
            "conv": {"kernel": _conv_kernel(sd["stem.0.weight"])},
            "bn": bn_p,
        }
        stats["stem"] = {"bn": bn_s}

    counts = _LAYER_COUNTS[variant.rsplit("_", 1)[1]]
    for layer in range(1, 5):
        for block in range(counts[layer - 1]):
            t_prefix = f"layer{layer}.{block}"
            f_name = f"layer{layer}/block{block}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for conv_name in ("conv1", "conv2"):
                cp, cs = _convert_conv_seq(sd, f"{t_prefix}.{conv_name}.0", variant)
                bp[conv_name] = cp
                if cs:
                    bs[conv_name] = cs
                bn_idx = 1
                bn_p, bn_st = _bn(sd, f"{t_prefix}.{conv_name}.{bn_idx}")
                bp[f"bn{conv_name[-1]}"] = bn_p
                bs[f"bn{conv_name[-1]}"] = bn_st
            if f"{t_prefix}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv_kernel(sd[f"{t_prefix}.downsample.0.weight"])
                }
                dbn_p, dbn_s = _bn(sd, f"{t_prefix}.downsample.1")
                bp["downsample_bn"] = dbn_p
                bs["downsample_bn"] = dbn_s
            params[f_name] = bp
            stats[f_name] = bs

    params["fc"] = {
        "kernel": jnp.asarray(_np(sd["fc.weight"]).T),
        "bias": jnp.asarray(_np(sd["fc.bias"])),
    }
    return {"params": params, "batch_stats": stats}
