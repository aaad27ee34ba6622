"""I3D parity tests.

The reference model is TF1/sonnet (i3d.py:32-479); its numerics decompose into
tf.nn.conv3d SAME, sonnet BatchNorm (inference moving stats, eps 1e-3, no
scale), ReLU, tf.nn.max_pool3d/avg_pool3d.  TF2's tf.nn ops implement the same
kernels, so they serve as the golden oracle for each composition here, plus
full-model endpoint-shape checks against the documented architecture.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import flax.linen as nn

from flickering_adversarial_video_tpu.models.i3d import (
    I3D_ENDPOINTS,
    InceptionI3D,
    Unit3D,
    _max_pool_same,
    init_i3d_params,
)

tf = pytest.importorskip("tensorflow")


@pytest.fixture(scope="module", autouse=True)
def _tf_cpu():
    tf.config.set_visible_devices([], "GPU")


class TestUnit3DvsTF:
    @pytest.mark.parametrize(
        "kernel,stride,shape",
        [
            ((1, 1, 1), (1, 1, 1), (2, 5, 8, 8, 3)),
            ((3, 3, 3), (1, 1, 1), (2, 5, 8, 8, 3)),
            ((7, 7, 7), (2, 2, 2), (1, 9, 15, 15, 3)),  # odd sizes stress SAME
            ((3, 3, 3), (2, 2, 2), (1, 8, 14, 14, 4)),
        ],
    )
    def test_conv_bn_relu_matches_tf(self, rng, kernel, stride, shape):
        out_ch = 6
        x = rng.normal(size=shape).astype(np.float32)
        unit = Unit3D(out_ch, kernel, stride)
        variables = unit.init(jax.random.key(0), jnp.asarray(x))
        w = rng.normal(size=kernel + (shape[-1], out_ch)).astype(np.float32) * 0.1
        beta = rng.normal(size=(out_ch,)).astype(np.float32) * 0.1
        mean = rng.normal(size=(out_ch,)).astype(np.float32) * 0.1
        var = rng.uniform(0.5, 2.0, size=(out_ch,)).astype(np.float32)
        variables = {
            "params": {
                "conv_3d": {"kernel": jnp.asarray(w)},
                "batch_norm": {"bias": jnp.asarray(beta)},
            },
            "batch_stats": {
                "batch_norm": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}
            },
        }
        got = np.asarray(unit.apply(variables, jnp.asarray(x)))

        y = tf.nn.conv3d(x, w, strides=(1,) + stride + (1,), padding="SAME")
        y = tf.nn.batch_normalization(y, mean, var, beta, None, 1e-3)
        expected = tf.nn.relu(y).numpy()
        np.testing.assert_allclose(got, expected, atol=2e-5)

    def test_bias_no_bn_no_act(self, rng):
        x = rng.normal(size=(1, 3, 4, 4, 5)).astype(np.float32)
        unit = Unit3D(2, (1, 1, 1), use_batch_norm=False, use_bias=True, use_activation=False)
        w = rng.normal(size=(1, 1, 1, 5, 2)).astype(np.float32)
        b = rng.normal(size=(2,)).astype(np.float32)
        variables = {"params": {"conv_3d": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}}
        got = np.asarray(unit.apply(variables, jnp.asarray(x)))
        expected = (
            tf.nn.conv3d(x, w, strides=(1, 1, 1, 1, 1), padding="SAME") + b
        ).numpy()
        np.testing.assert_allclose(got, expected, atol=1e-5)


class TestPoolingVsTF:
    @pytest.mark.parametrize(
        "window,stride,shape",
        [
            ((1, 3, 3), (1, 2, 2), (1, 5, 9, 9, 4)),
            ((3, 3, 3), (2, 2, 2), (1, 7, 8, 8, 2)),
            ((2, 2, 2), (2, 2, 2), (1, 9, 7, 7, 2)),
            ((3, 3, 3), (1, 1, 1), (2, 4, 6, 6, 3)),
        ],
    )
    def test_max_pool_same(self, rng, window, stride, shape):
        x = rng.normal(size=shape).astype(np.float32)
        got = np.asarray(_max_pool_same(jnp.asarray(x), window, stride))
        expected = tf.nn.max_pool3d(
            x, ksize=(1,) + window + (1,), strides=(1,) + stride + (1,), padding="SAME"
        ).numpy()
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_avg_pool_valid(self, rng):
        x = rng.normal(size=(1, 4, 7, 7, 3)).astype(np.float32)
        got = np.asarray(
            nn.avg_pool(jnp.asarray(x), (2, 7, 7), (1, 1, 1), padding="VALID")
        )
        expected = tf.nn.avg_pool3d(
            x, ksize=(1, 2, 7, 7, 1), strides=(1, 1, 1, 1, 1), padding="VALID"
        ).numpy()
        np.testing.assert_allclose(got, expected, atol=1e-6)


class TestFullModel:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = InceptionI3D(num_classes=400)
        variables = init_i3d_params(jax.random.key(0), frames=16, size=224)
        return model, variables

    def test_endpoint_shapes(self, model_and_vars):
        """Shape trace of the reference architecture at T=16, 224x224."""
        model, variables = model_and_vars
        x = jnp.zeros((1, 16, 224, 224, 3))
        logits, eps = model.apply(variables, x)
        assert logits.shape == (1, 400)
        expected = {
            "Conv3d_1a_7x7": (1, 8, 112, 112, 64),
            "MaxPool3d_2a_3x3": (1, 8, 56, 56, 64),
            "Conv3d_2b_1x1": (1, 8, 56, 56, 64),
            "Conv3d_2c_3x3": (1, 8, 56, 56, 192),
            "MaxPool3d_3a_3x3": (1, 8, 28, 28, 192),
            "Mixed_3b": (1, 8, 28, 28, 256),
            "Mixed_3c": (1, 8, 28, 28, 480),
            "MaxPool3d_4a_3x3": (1, 4, 14, 14, 480),
            "Mixed_4b": (1, 4, 14, 14, 512),
            "Mixed_4c": (1, 4, 14, 14, 512),
            "Mixed_4d": (1, 4, 14, 14, 512),
            "Mixed_4e": (1, 4, 14, 14, 528),
            "Mixed_4f": (1, 4, 14, 14, 832),
            "MaxPool3d_5a_2x2": (1, 2, 7, 7, 832),
            "Mixed_5b": (1, 2, 7, 7, 832),
            "Mixed_5c": (1, 2, 7, 7, 1024),
            "Logits": (1, 400),
        }
        for name, shape in expected.items():
            assert eps[name].shape == shape, f"{name}: {eps[name].shape} != {shape}"

    def test_param_count(self, model_and_vars):
        """I3D RGB has ~12.3M parameters (12,697,264 incl. logits conv)."""
        _, variables = model_and_vars
        n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"]))
        assert 12_000_000 < n < 13_000_000, n

    def test_predictions_endpoint(self, model_and_vars):
        model, variables = model_and_vars
        pred_model = InceptionI3D(num_classes=400, final_endpoint="Predictions")
        x = jnp.zeros((1, 16, 224, 224, 3))
        probs, _ = pred_model.apply(variables, x)
        np.testing.assert_allclose(np.asarray(probs).sum(), 1.0, rtol=1e-5)

    def test_mixed5b_branch2_name_quirk(self, model_and_vars):
        """Reference i3d.py:418 names Mixed_5b Branch_2's 3x3 conv 'Conv3d_0a_3x3'."""
        _, variables = model_and_vars
        assert "Branch_2/Conv3d_0a_3x3" in variables["params"]["Mixed_5b"]
        assert "Branch_2/Conv3d_0b_3x3" in variables["params"]["Mixed_5c"]

    def test_jit_and_grad_wrt_input(self, model_and_vars):
        """The attack differentiates through the frozen model wrt its input."""
        model, variables = model_and_vars

        @jax.jit
        def loss_fn(x):
            logits, _ = model.apply(variables, x)
            return jnp.sum(logits[:, 0])

        x = jax.random.uniform(
            jax.random.key(1), (1, 16, 224, 224, 3), minval=-1.0, maxval=1.0
        )
        g = jax.grad(loss_fn)(x)
        assert g.shape == (1, 16, 224, 224, 3)
        assert bool(jnp.any(g != 0))


class TestPackedStem:
    """Space-to-depth stem (PackedStemUnit3D) must be numerically identical
    to the plain 7x7x7 stride-2 SAME conv — parity vs tf.nn.conv3d."""

    def test_packed_equals_plain_conv(self, rng):
        from flickering_adversarial_video_tpu.models.i3d import (
            _pack_stem_input,
            _pack_stem_kernel,
        )
        import jax.lax as lax

        x = rng.normal(size=(2, 8, 16, 16, 3)).astype(np.float32)
        w = (rng.normal(size=(7, 7, 7, 3, 5)) * 0.1).astype(np.float32)
        expected = tf.nn.conv3d(x, w, strides=(1, 2, 2, 2, 1), padding="SAME").numpy()

        packed = _pack_stem_input(jnp.asarray(x))
        pk = _pack_stem_kernel(jnp.asarray(w))
        got = lax.conv_general_dilated(
            packed, pk, (1, 1, 1), [(1, 2), (1, 2), (1, 2)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5)

    def test_full_model_packed_vs_plain(self):
        variables = init_i3d_params(jax.random.key(0), frames=16, size=224)
        x = jax.random.uniform(jax.random.key(1), (1, 16, 224, 224, 3), minval=-1, maxval=1)
        plain = InceptionI3D(num_classes=400, packed_stem=False)
        packed = InceptionI3D(num_classes=400, packed_stem=True)
        lp, _ = plain.apply(variables, x)
        lk, _ = packed.apply(variables, x)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lk), atol=2e-4)

    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_odd_geometry_falls_back(self):
        model = InceptionI3D(num_classes=10, packed_stem=True)
        x = jnp.zeros((1, 9, 224, 224, 3))  # odd T
        variables = model.init(jax.random.key(0), x)
        logits, _ = model.apply(variables, x)
        assert logits.shape == (1, 10)
