"""I3D checkpoint-converter tests.

Builds a synthetic DeepMind-layout checkpoint (the exact variable names the
reference's Saver restores, utils/kinetics_i3d_utils.py:41-62), converts it,
and checks the resulting Flax tree is a drop-in replacement — including the
sonnet [1,1,1,1,C] -> [C] BN-statistic reshape and the Mixed_5b branch-name
quirk.  Also round-trips through an on-disk TF1 name-based checkpoint to
exercise convert_i3d_checkpoint end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flickering_adversarial_video_tpu.convert import (
    convert_i3d_checkpoint,
    convert_i3d_var_map,
)
from flickering_adversarial_video_tpu.models.i3d import InceptionI3D, init_i3d_params

tf = pytest.importorskip("tensorflow")


def flax_tree_to_ckpt_names(variables, rng):
    """Invert the converter's mapping: emit {ckpt_var_name: random ndarray}."""
    var_map = {}

    def visit(collection, tree, path):
        for k, v in tree.items():
            p = path + [k]
            if isinstance(v, dict):
                visit(collection, v, p)
                continue
            # p is like [Conv3d_1a_7x7, conv_3d, kernel]
            #        or [Mixed_3b, Branch_0/Conv3d_0a_1x1, batch_norm, bias]
            module = "/".join(p[:-1])
            leaf = p[-1]
            if collection == "params":
                name = {"kernel": "w", "bias": "b"}[leaf]
                if p[-2] == "batch_norm":
                    name = "beta"
            else:
                name = {"mean": "moving_mean", "var": "moving_variance"}[leaf]
            full = f"RGB/inception_i3d/{module}/{name}"
            shape = v.shape
            if name in ("moving_mean", "moving_variance"):
                shape = (1, 1, 1, 1) + tuple(v.shape)  # sonnet stat layout
            scale = 0.02 if name == "w" else 0.1
            var_map[full] = (rng.normal(size=shape) * scale).astype(np.float32)
            if name == "moving_variance":
                var_map[full] = np.abs(var_map[full]) + 0.5

    visit("params", variables["params"], [])
    visit("batch_stats", variables["batch_stats"], [])
    return var_map


@pytest.fixture(scope="module")
def ref_variables():
    # conv/BN variable shapes are geometry-independent; the tiny init
    # geometry keeps the module fixture cheap (was 43 s at 16x224 on 1 CPU)
    return init_i3d_params(jax.random.key(0), frames=8, size=64)


def test_var_map_roundtrip_shapes(ref_variables, rng):
    var_map = flax_tree_to_ckpt_names(ref_variables, rng)
    converted = convert_i3d_var_map(var_map)
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref_variables)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, converted)
    assert ref_shapes == got_shapes


def test_values_transfer_exactly(ref_variables, rng):
    var_map = flax_tree_to_ckpt_names(ref_variables, rng)
    converted = convert_i3d_var_map(var_map)
    w = np.asarray(converted["params"]["Conv3d_1a_7x7"]["conv_3d"]["kernel"])
    np.testing.assert_array_equal(
        w, var_map["RGB/inception_i3d/Conv3d_1a_7x7/conv_3d/w"]
    )
    mm = np.asarray(converted["batch_stats"]["Mixed_5b"]["Branch_2/Conv3d_0a_3x3"]["batch_norm"]["mean"])
    np.testing.assert_array_equal(
        mm,
        var_map[
            "RGB/inception_i3d/Mixed_5b/Branch_2/Conv3d_0a_3x3/batch_norm/moving_mean"
        ].reshape(-1),
    )
    b = np.asarray(converted["params"]["Logits/Conv3d_0c_1x1"]["conv_3d"]["bias"])
    np.testing.assert_array_equal(
        b, var_map["RGB/inception_i3d/Logits/Conv3d_0c_1x1/conv_3d/b"]
    )


def test_converted_params_run_forward(ref_variables, rng):
    var_map = flax_tree_to_ckpt_names(ref_variables, rng)
    converted = convert_i3d_var_map(var_map)
    model = InceptionI3D(num_classes=400)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 8, 64, 64, 3)), jnp.float32)
    logits, _ = model.apply(converted, x)
    assert logits.shape == (1, 400)
    assert np.isfinite(np.asarray(logits)).all()


def test_on_disk_checkpoint(ref_variables, rng, tmp_path):
    """Write a TF1 name-based checkpoint and read it back via the converter."""
    var_map = flax_tree_to_ckpt_names(ref_variables, rng)
    ckpt_prefix = str(tmp_path / "model.ckpt")

    g = tf.Graph()
    with g.as_default():
        tf_vars = []
        for name, value in var_map.items():
            tf_vars.append(tf.compat.v1.get_variable(name, initializer=value))
        saver = tf.compat.v1.train.Saver(var_list=tf_vars)
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, ckpt_prefix)

    converted = convert_i3d_checkpoint(ckpt_prefix)
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref_variables)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, converted)
    assert ref_shapes == got_shapes
    w = np.asarray(converted["params"]["Mixed_4f"]["Branch_1/Conv3d_0b_3x3"]["conv_3d"]["kernel"])
    np.testing.assert_array_equal(
        w, var_map["RGB/inception_i3d/Mixed_4f/Branch_1/Conv3d_0b_3x3/conv_3d/w"]
    )


def test_msgpack_cache_roundtrip(ref_variables, tmp_path):
    from flickering_adversarial_video_tpu.convert.cli import (
        load_variables,
        save_variables,
    )

    path = str(tmp_path / "w.msgpack")
    save_variables(ref_variables, path)
    restored = load_variables(path)
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref_variables)
    got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, restored)
    assert ref_shapes == got_shapes
    w0 = np.asarray(ref_variables["params"]["Conv3d_1a_7x7"]["conv_3d"]["kernel"])
    w1 = np.asarray(restored["params"]["Conv3d_1a_7x7"]["conv_3d"]["kernel"])
    np.testing.assert_array_equal(w0, w1)


def test_rgb600_bare_names(ref_variables, rng):
    """Kinetics-600 checkpoints store prefix-less variable names
    (kinetics_i3d_utils.py:47-56) — eval_type='rgb600' must map them."""
    var_map = flax_tree_to_ckpt_names(ref_variables, rng)
    bare_map = {
        name[len("RGB/inception_i3d/"):]: v for name, v in var_map.items()
    }
    converted = convert_i3d_var_map(bare_map, eval_type="rgb600")
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref_variables)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, converted)
    assert ref_shapes == got_shapes
