"""End-to-end rehearsal of the egress-day script chain (VERDICT r2 item 3).

The one egress-capable opportunity runs `scripts/download_assets.sh &&
scripts/real_weight_parity.sh`; a script bug would burn it.  This test
fabricates synthetic DeepMind-layout + torchvision-layout assets
(convert/fake_assets.py) and drives the ACTUAL script —
`sh scripts/real_weight_parity.sh --rehearsal` — through its full chain:

    fabricate -> convert (cli.py) -> msgpack -> --dump-golden ->
    pytest tests/test_real_weight_golden.py (0 skips) ->
    config #1 single-video attack -> config #3 universal attack

Also unit-covers the fabricators' layout fidelity: the fake TF checkpoint
round-trips through convert_i3d_checkpoint, the fake .pth through
convert_video_resnet_state_dict.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestFabricators:
    def test_torch_state_dict_roundtrip(self):
        """Fake torchvision state_dict feeds the real converter and yields a
        tree identical to the source Flax init (values transfer exactly)."""
        import jax

        from flickering_adversarial_video_tpu.convert.fake_assets import (
            video_resnet_state_dict,
        )
        from flickering_adversarial_video_tpu.convert.torch_video_resnet import (
            convert_video_resnet_state_dict,
        )
        from flickering_adversarial_video_tpu.models.registry import create_model

        sd = video_resnet_state_dict("r2plus1d_18", seed=3)
        converted = convert_video_resnet_state_dict(sd, "r2plus1d_18")
        import jax.numpy as jnp

        model, _ = create_model("r2plus1d_18")
        ref = model.init(jax.random.key(3), jnp.zeros((1, 4, 32, 32, 3)))
        ref_flat = jax.tree_util.tree_leaves_with_path(ref)
        got = dict(jax.tree_util.tree_leaves_with_path(converted))
        assert len(ref_flat) == len(got)
        for path, leaf in ref_flat:
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(got[path]), err_msg=str(path)
            )

    def test_torch_state_dict_ig65m_heads(self):
        """359/487-way heads survive the round trip (ig65m layouts)."""
        from flickering_adversarial_video_tpu.convert.fake_assets import (
            video_resnet_state_dict,
        )
        from flickering_adversarial_video_tpu.convert.torch_video_resnet import (
            convert_video_resnet_state_dict,
        )

        for nc in (359, 487):
            sd = video_resnet_state_dict("r2plus1d_34", num_classes=nc)
            assert sd["fc.weight"].shape == (nc, 512)
            converted = convert_video_resnet_state_dict(sd, "r2plus1d_34")
            assert converted["params"]["fc"]["kernel"].shape == (512, nc)

    @pytest.mark.slow  # >45 s single-worker (round-5 durations); runs in the serial slow phase
    def test_i3d_rgb600_saver_checkpoint_roundtrip(self, tmp_path):
        """Fake Kinetics-600-layout ckpt (prefix-less names, 600-way head)
        feeds the real converter with eval_type='rgb600'
        (kinetics_i3d_utils.py:47-56) — and the rgb layout must NOT parse
        as rgb600 (prefix mismatch fails loudly)."""
        import jax

        from flickering_adversarial_video_tpu.convert.fake_assets import (
            write_i3d_saver_checkpoint,
        )
        from flickering_adversarial_video_tpu.convert.tf_i3d import (
            convert_i3d_checkpoint,
        )
        from flickering_adversarial_video_tpu.models.i3d import init_i3d_params

        variables = init_i3d_params(
            jax.random.key(1), num_classes=600, frames=4, size=32
        )
        prefix = write_i3d_saver_checkpoint(
            str(tmp_path / "ck600" / "model.ckpt"),
            variables=variables,
            eval_type="rgb600",
        )
        converted = convert_i3d_checkpoint(prefix, eval_type="rgb600")
        assert converted["params"]["Logits/Conv3d_0c_1x1"]["conv_3d"][
            "bias"
        ].shape == (600,)
        np.testing.assert_array_equal(
            np.asarray(converted["params"]["Conv3d_1a_7x7"]["conv_3d"]["kernel"]),
            np.asarray(variables["params"]["Conv3d_1a_7x7"]["conv_3d"]["kernel"]),
        )
        with pytest.raises(ValueError, match="no RGB/inception_i3d"):
            convert_i3d_checkpoint(prefix, eval_type="rgb")

    def test_i3d_saver_checkpoint_roundtrip(self, tmp_path):
        """Fake DeepMind-layout Saver ckpt feeds the real TF converter."""
        from flickering_adversarial_video_tpu.convert.fake_assets import (
            write_i3d_saver_checkpoint,
        )
        from flickering_adversarial_video_tpu.convert.tf_i3d import (
            convert_i3d_checkpoint,
        )

        prefix = write_i3d_saver_checkpoint(str(tmp_path / "ck" / "model.ckpt"))
        converted = convert_i3d_checkpoint(prefix)
        assert "Conv3d_1a_7x7" in converted["params"]
        assert converted["params"]["Logits/Conv3d_0c_1x1"]["conv_3d"][
            "bias"
        ].shape == (400,)
        # sonnet [1,1,1,1,C] moving stats came back flat
        mv = converted["batch_stats"]["Conv3d_1a_7x7"]["batch_norm"]["var"]
        assert mv.ndim == 1


@pytest.mark.slow
def test_real_weight_parity_rehearsal(tmp_path):
    """The ACTUAL egress-day script, end to end against synthetic assets.

    Asserts the chain completes, the goldens exist, and the golden pytest
    stage ran with ZERO skips (the suite's real-weight hole closes in
    rehearsal mode).
    """
    data_dir = str(tmp_path / "rehearsal_data")
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        DATA_DIR=data_dir,
        REHEARSAL="1",
        CUDA_VISIBLE_DEVICES="-1",
        TF_CPP_MIN_LOG_LEVEL="2",
    )
    proc = subprocess.run(
        ["sh", os.path.join(REPO, "scripts", "real_weight_parity.sh")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3000,
    )
    tail = proc.stdout[-4000:] + "\n--- stderr ---\n" + proc.stderr[-4000:]
    assert proc.returncode == 0, tail
    assert "REHEARSAL COMPLETE" in proc.stdout, tail

    gold = os.path.join(data_dir, "golden")
    for name in (
        "i3d_kinetics400.msgpack",
        "i3d_kinetics400.npz",
        # VERDICT r4 item 4: the egress-day chain pins EVERY converter
        # family — rgb600 I3D and both ig65m r2plus1d_34 heads included
        "i3d_kinetics600.msgpack",
        "i3d_kinetics600.npz",
        "r3d_18.npz",
        "mc3_18.npz",
        "r2plus1d_18.npz",
        "r2plus1d_34_32_ig65m.npz",
        "r2plus1d_34_8_ig65m.npz",
        "run_config_real.yml",
    ):
        assert os.path.exists(os.path.join(gold, name)), name

    # the golden-test stage must have run the real-weight parametrization
    # (7 goldens: i3d rgb+rgb600, r3d/mc3/r2plus1d_18, both ig65m heads)
    # with no skips: pytest -q prints "N passed" with no "skipped" on that
    # summary line
    lines = [
        l for l in proc.stdout.splitlines() if " passed" in l and "==" not in l
    ]
    assert lines, tail
    assert all("skipped" not in l for l in lines), lines

    # both attack stages produced artifacts
    assert any(
        f.endswith(".pkl")
        for f in os.listdir(os.path.join(data_dir, "result", "single_video"))
    )
    assert "fooling=" in proc.stdout, tail
