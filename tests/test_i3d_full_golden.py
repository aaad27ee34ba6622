"""Full-graph I3D golden test.

The real golden test (logits vs the DeepMind checkpoint on a recorded clip)
needs weights this environment cannot fetch; the strongest available stand-in
is a complete second implementation of the I3D forward in raw tf.nn ops —
TF's kernels being the reference's own numerics — driven by THE SAME
parameter tree as the Flax model.  Any composition error (padding mode, BN
placement/eps, branch order, pool geometry, logits averaging, the packed
stem) diverges immediately.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flickering_adversarial_video_tpu.models.i3d import (
    _MIXED_CHANNELS,
    InceptionI3D,
    init_i3d_params,
)

tf = pytest.importorskip("tensorflow")


def tf_unit3d(x, params, stats=None, activation=True, stride=(1, 1, 1)):
    w = params["conv_3d"]["kernel"]
    x = tf.nn.conv3d(x, np.asarray(w), strides=(1,) + stride + (1,), padding="SAME")
    if "bias" in params["conv_3d"]:
        x = x + np.asarray(params["conv_3d"]["bias"])
    if stats is not None:
        x = tf.nn.batch_normalization(
            x,
            np.asarray(stats["batch_norm"]["mean"]),
            np.asarray(stats["batch_norm"]["var"]),
            np.asarray(params["batch_norm"]["bias"]),
            None,
            1e-3,
        )
    if activation:
        x = tf.nn.relu(x)
    return x


def tf_max_pool(x, window, stride):
    return tf.nn.max_pool3d(
        x, ksize=(1,) + window + (1,), strides=(1,) + stride + (1,), padding="SAME"
    )


def tf_mixed(x, params, stats, branch2_name="Conv3d_0b_3x3"):
    b0 = tf_unit3d(x, params["Branch_0/Conv3d_0a_1x1"], stats["Branch_0/Conv3d_0a_1x1"])
    b1 = tf_unit3d(x, params["Branch_1/Conv3d_0a_1x1"], stats["Branch_1/Conv3d_0a_1x1"])
    b1 = tf_unit3d(b1, params["Branch_1/Conv3d_0b_3x3"], stats["Branch_1/Conv3d_0b_3x3"])
    b2 = tf_unit3d(x, params["Branch_2/Conv3d_0a_1x1"], stats["Branch_2/Conv3d_0a_1x1"])
    b2 = tf_unit3d(b2, params[f"Branch_2/{branch2_name}"], stats[f"Branch_2/{branch2_name}"])
    b3 = tf_max_pool(x, (3, 3, 3), (1, 1, 1))
    b3 = tf_unit3d(b3, params["Branch_3/Conv3d_0b_1x1"], stats["Branch_3/Conv3d_0b_1x1"])
    return tf.concat([b0, b1, b2, b3], axis=4)


def tf_i3d_forward(x, variables):
    p, s = variables["params"], variables["batch_stats"]
    net = tf_unit3d(x, p["Conv3d_1a_7x7"], s["Conv3d_1a_7x7"], stride=(2, 2, 2))
    net = tf_max_pool(net, (1, 3, 3), (1, 2, 2))
    net = tf_unit3d(net, p["Conv3d_2b_1x1"], s["Conv3d_2b_1x1"])
    net = tf_unit3d(net, p["Conv3d_2c_3x3"], s["Conv3d_2c_3x3"])
    net = tf_max_pool(net, (1, 3, 3), (1, 2, 2))
    net = tf_mixed(net, p["Mixed_3b"], s["Mixed_3b"])
    net = tf_mixed(net, p["Mixed_3c"], s["Mixed_3c"])
    net = tf_max_pool(net, (3, 3, 3), (2, 2, 2))
    for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        net = tf_mixed(net, p[name], s[name])
    net = tf_max_pool(net, (2, 2, 2), (2, 2, 2))
    net = tf_mixed(net, p["Mixed_5b"], s["Mixed_5b"], branch2_name="Conv3d_0a_3x3")
    net = tf_mixed(net, p["Mixed_5c"], s["Mixed_5c"])
    t = net.shape[1]
    net = tf.nn.avg_pool3d(
        net, ksize=(1, min(2, t), 7, 7, 1), strides=(1, 1, 1, 1, 1), padding="VALID"
    )
    logits = tf_unit3d(net, p["Logits/Conv3d_0c_1x1"], None, activation=False)
    logits = tf.squeeze(logits, axis=(2, 3))
    return tf.reduce_mean(logits, axis=1).numpy()


@pytest.mark.parametrize("packed_stem", [True, False])
@pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
def test_full_forward_matches_tf(rng, packed_stem):
    frames, size, classes = 16, 224, 12
    variables = init_i3d_params(jax.random.key(0), num_classes=classes, frames=frames, size=size)
    # He-style sqrt(2) correction on the conv kernels: lecun init does not
    # compensate the ReLUs, and 22 attenuating layers would crush the logits
    # toward 0 and make the comparison vacuous (the original x0.25 "temper"
    # did exactly that: logits ~1e-11, i.e. the test compared noise)
    variables = jax.tree_util.tree_map(
        lambda a: a * np.sqrt(2.0) if a.ndim == 5 else a, variables
    )

    x = rng.uniform(-1, 1, (1, frames, size, size, 3)).astype(np.float32)
    model = InceptionI3D(num_classes=classes, packed_stem=packed_stem)
    got, _ = model.apply(variables, jnp.asarray(x))
    expected = tf_i3d_forward(x, jax.tree_util.tree_map(np.asarray, variables))
    scale = np.abs(expected).max()
    assert scale > 1e-2, f"degenerate activations (scale {scale}) — vacuous test"
    np.testing.assert_allclose(
        np.asarray(got) / scale, expected / scale, atol=2e-5
    )


@pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
def test_stem_input_gradient_matches_tf(rng):
    """Gradient golden through the packed stem (+BN+ReLU) vs tf.GradientTape.

    The stem is this framework's most custom backward code (space-to-depth
    kernel repack, temporal unroll, packed-space custom VJPs), so its input
    gradient is pinned against TF exactly.

    Why not the FULL network: measured, a whole-net elementwise gradient
    golden across conv backends is ill-posed — (a) pool-gradient TIE routing
    is implementation-defined even within TF itself (its oneDNN stride-2
    kernel routes 8/1024 post-ReLU ties differently from its own stride-1
    kernel and from XLA's select-and-scatter; isolated-op check), and
    (b) ~1e-7 accumulation differences between conv backends flip near-tied
    pool argmaxes, and each flip reroutes O(1) cotangent mass — by Mixed_3b
    the input gradients of TF-CPU and XLA disagree almost everywhere
    pointwise while the forwards agree to 5e-7.  The reference's own cuDNN
    is a third tie/accumulation behavior, so pointwise full-net gradient
    parity does not exist between ANY two stacks; the per-op gradient
    goldens (here, tests/test_maxpool.py, tests/test_packed_apply.py,
    tests/test_video_resnet.py) are the well-posed granularity.
    """
    frames, size = 8, 64
    variables = init_i3d_params(
        jax.random.key(1), num_classes=5, frames=frames, size=size
    )
    np_vars = jax.tree_util.tree_map(np.asarray, variables)
    p, s = np_vars["params"], np_vars["batch_stats"]
    x = rng.uniform(-1, 1, (1, frames, size, size, 3)).astype(np.float32)
    dy_np = rng.normal(
        size=(1, frames // 2, size // 2, size // 2, 64)
    ).astype(np.float32)

    xt = tf.Variable(x)
    with tf.GradientTape() as tape:
        net = tf_unit3d(xt, p["Conv3d_1a_7x7"], s["Conv3d_1a_7x7"], stride=(2, 2, 2))
        loss = tf.reduce_sum(net * dy_np)
    expected = tape.gradient(loss, xt).numpy()

    model = InceptionI3D(
        num_classes=5, packed_stem=True, final_endpoint="Conv3d_1a_7x7"
    )

    def loss_fn(z):
        y, _ = model.apply(variables, z)
        return jnp.sum(y * jnp.asarray(dy_np))

    got = np.asarray(jax.grad(loss_fn)(jnp.asarray(x)))
    scale = np.abs(expected).max()
    assert scale > 1e-3, f"degenerate gradient (scale {scale})"
    np.testing.assert_allclose(got / scale, expected / scale, atol=1e-5)
