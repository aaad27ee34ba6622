"""DeepMind I3D TF1 checkpoint -> Flax variables.

The reference restores `RGB/inception_i3d/...` variables plus BN moving
averages with a name-mapped tf.train.Saver (utils/kinetics_i3d_utils.py:41-62).
This converter consumes either a TF checkpoint path (read lazily via
tf.train.load_checkpoint, TF is only imported then) or a pre-extracted
{variable_name: ndarray} map, and emits variables for models/i3d.py.

Name translation (checkpoint -> Flax path):
  RGB/inception_i3d/Conv3d_1a_7x7/conv_3d/w
      -> params / Conv3d_1a_7x7 / conv_3d / kernel
  RGB/inception_i3d/Mixed_3b/Branch_0/Conv3d_0a_1x1/batch_norm/beta
      -> params / Mixed_3b / "Branch_0/Conv3d_0a_1x1" / batch_norm / bias
  .../batch_norm/moving_mean|moving_variance
      -> batch_stats / ... / batch_norm / mean|var   (reshaped [1,1,1,1,C]->[C],
         the reference relies on Saver(reshape=True) for the same flattening)
  RGB/inception_i3d/Logits/Conv3d_0c_1x1/conv_3d/{w,b}
      -> params / "Logits/Conv3d_0c_1x1" / conv_3d / kernel|bias

sonnet Conv3D stores kernels as [kT, kH, kW, in, out] — identical to Flax
NDHWC convention, so weights transfer without transposition.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp

_PREFIX = "RGB/inception_i3d/"

_LEAF_MAP = {
    "w": ("params", "kernel"),
    "b": ("params", "bias"),
    "beta": ("params", "bias"),
    "moving_mean": ("batch_stats", "mean"),
    "moving_variance": ("batch_stats", "var"),
}


def _set_nested(tree: Dict[str, Any], path, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _flax_path(ckpt_name: str, *, bare_names: bool = False):
    """Translate a checkpoint variable name into (collection, flax key path).

    bare_names handles the Kinetics-600 checkpoints, whose variables lack the
    RGB/inception_i3d/ prefix (the reference strips it for eval_type='rgb600',
    kinetics_i3d_utils.py:47-56)."""
    name = ckpt_name
    if name.endswith(":0"):
        name = name[:-2]
    if bare_names:
        if name.startswith(_PREFIX):
            name = name[len(_PREFIX):]
        parts = name.split("/")
        if parts[0] not in _KNOWN_TOPS:
            return None
        return _translate_parts(parts)
    if not name.startswith(_PREFIX):
        return None
    parts = name[len(_PREFIX):].split("/")
    return _translate_parts(parts)


_KNOWN_TOPS = frozenset(
    ["Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3", "Logits"]
    + [f"Mixed_{s}" for s in ("3b", "3c", "4b", "4c", "4d", "4e", "4f", "5b", "5c")]
)


def _translate_parts(parts):
    # parts examples:
    #   [Conv3d_1a_7x7, conv_3d, w]
    #   [Mixed_3b, Branch_0, Conv3d_0a_1x1, batch_norm, beta]
    #   [Logits, Conv3d_0c_1x1, conv_3d, w]
    leaf = parts[-1]
    if leaf not in _LEAF_MAP:
        return None
    collection, flax_leaf = _LEAF_MAP[leaf]
    op = parts[-2]  # conv_3d | batch_norm
    if parts[0].startswith("Mixed_"):
        module_path = (parts[0], "/".join(parts[1:3]))
    elif parts[0] == "Logits":
        module_path = ("/".join(parts[0:2]),)
    else:
        module_path = (parts[0],)
    return collection, module_path + (op, flax_leaf)


def convert_i3d_var_map(
    var_map: Mapping[str, Any], eval_type: str = "rgb"
) -> Dict[str, Any]:
    """Convert {checkpoint_var_name: ndarray} to Flax variables.

    eval_type='rgb600' accepts the Kinetics-600 checkpoints' prefix-less
    variable names (kinetics_i3d_utils.py:47-56)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    matched = 0
    bare = eval_type == "rgb600"
    for name, value in var_map.items():
        translated = _flax_path(name, bare_names=bare)
        if translated is None:
            continue
        collection, path = translated
        arr = np.asarray(value)
        if path[-1] in ("mean", "var", "bias") and arr.ndim > 1:
            arr = arr.reshape(-1)  # sonnet keeps BN stats as [1,1,1,1,C]
        tree = params if collection == "params" else stats
        _set_nested(tree, path, jnp.asarray(arr))
        matched += 1
    if matched == 0:
        raise ValueError("no RGB/inception_i3d variables found in the map")
    return {"params": params, "batch_stats": stats}


def convert_i3d_checkpoint(ckpt_path: str, eval_type: str = "rgb") -> Dict[str, Any]:
    """Read a TF checkpoint from disk and convert (requires tensorflow)."""
    import tensorflow as tf  # local import: only needed for on-disk ckpts

    reader = tf.train.load_checkpoint(ckpt_path)
    shapes = reader.get_variable_to_shape_map()
    var_map = {name: reader.get_tensor(name) for name in shapes}
    return convert_i3d_var_map(var_map, eval_type=eval_type)
