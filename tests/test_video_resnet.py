"""VideoResNet parity tests against a torch oracle.

The reference's victims are `torchvision.models.video.{r3d_18, mc3_18,
r2plus1d_18}` (utils_cv/action_recognition/model.py:421).  torchvision is not
installed here, so the oracle below reconstructs the public torchvision
architecture with plain torch.nn modules *with the same state_dict key
layout*, randomizes all weights and BN running stats, converts via
convert/torch_video_resnet.py, and asserts logits parity — exercising both
the Flax model and the converter in one shot.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn

from flickering_adversarial_video_tpu.convert import convert_video_resnet_state_dict
from flickering_adversarial_video_tpu.models import VideoResNet


def torch_midplanes(inp, out):
    return (inp * out * 3 * 3 * 3) // (inp * 3 * 3 + 3 * out)


def make_conv(kind, in_planes, out_planes, mid, stride):
    if kind == "simple":
        return nn.Conv3d(in_planes, out_planes, (3, 3, 3), stride=stride, padding=1, bias=False)
    if kind == "no_temporal":
        return nn.Conv3d(
            in_planes, out_planes, (1, 3, 3),
            stride=(1, stride, stride), padding=(0, 1, 1), bias=False,
        )
    return nn.Sequential(
        nn.Conv3d(in_planes, mid, (1, 3, 3), stride=(1, stride, stride), padding=(0, 1, 1), bias=False),
        nn.BatchNorm3d(mid),
        nn.ReLU(inplace=True),
        nn.Conv3d(mid, out_planes, (3, 1, 1), stride=(stride, 1, 1), padding=(1, 0, 0), bias=False),
    )


class TorchBasicBlock(nn.Module):
    def __init__(self, inplanes, planes, kind, stride=1):
        super().__init__()
        mid = torch_midplanes(inplanes, planes)
        self.conv1 = nn.Sequential(
            make_conv(kind, inplanes, planes, mid, stride),
            nn.BatchNorm3d(planes),
            nn.ReLU(inplace=True),
        )
        self.conv2 = nn.Sequential(
            make_conv(kind, planes, planes, mid, 1), nn.BatchNorm3d(planes)
        )
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            ts = 1 if kind == "no_temporal" else stride
            self.downsample = nn.Sequential(
                nn.Conv3d(inplanes, planes, 1, stride=(ts, stride, stride), bias=False),
                nn.BatchNorm3d(planes),
            )

    def forward(self, x):
        residual = x
        out = self.conv1(x)
        out = self.conv2(out)
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.relu(out + residual)


LAYER_COUNTS = {"18": (2, 2, 2, 2), "34": (3, 4, 6, 3)}


class TorchVideoResNet(nn.Module):
    def __init__(self, variant, num_classes=400):
        super().__init__()
        if variant.startswith("r2plus1d"):
            self.stem = nn.Sequential(
                nn.Conv3d(3, 45, (1, 7, 7), stride=(1, 2, 2), padding=(0, 3, 3), bias=False),
                nn.BatchNorm3d(45),
                nn.ReLU(inplace=True),
                nn.Conv3d(45, 64, (3, 1, 1), stride=1, padding=(1, 0, 0), bias=False),
                nn.BatchNorm3d(64),
                nn.ReLU(inplace=True),
            )
            kinds = ["2plus1"] * 4
        else:
            self.stem = nn.Sequential(
                nn.Conv3d(3, 64, (3, 7, 7), stride=(1, 2, 2), padding=(1, 3, 3), bias=False),
                nn.BatchNorm3d(64),
                nn.ReLU(inplace=True),
            )
            kinds = (
                ["simple"] * 4
                if variant == "r3d_18"
                else ["simple", "no_temporal", "no_temporal", "no_temporal"]
            )
        planes = [64, 128, 256, 512]
        counts = LAYER_COUNTS[variant.rsplit("_", 1)[1]]
        inplanes = 64
        for i, (p, kind, n) in enumerate(zip(planes, kinds, counts), start=1):
            blocks = []
            for b in range(n):
                stride = 2 if (i > 1 and b == 0) else 1
                blocks.append(TorchBasicBlock(inplanes, p, kind, stride))
                inplanes = p
            setattr(self, f"layer{i}", nn.Sequential(*blocks))
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):
        x = self.stem(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        x = x.mean(dim=(2, 3, 4))
        return self.fc(x)


def randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv3d):
                m.weight.normal_(0, 0.02, generator=g)
            elif isinstance(m, nn.BatchNorm3d):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
                m.running_mean.normal_(0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
            elif isinstance(m, nn.Linear):
                m.weight.normal_(0, 0.05, generator=g)
                m.bias.normal_(0, 0.05, generator=g)


@pytest.mark.parametrize("variant", ["r3d_18", "mc3_18", "r2plus1d_18", "r2plus1d_34"])
def test_forward_parity(variant, rng):
    torch_model = TorchVideoResNet(variant)
    randomize(torch_model, seed=7)
    torch_model.eval()

    x = rng.normal(size=(2, 4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        expected = torch_model(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()

    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = convert_video_resnet_state_dict(sd, variant)
    flax_model = VideoResNet(variant)
    got = np.asarray(flax_model.apply(variables, jnp.asarray(x)))

    scale = np.abs(expected).max()
    np.testing.assert_allclose(got / scale, expected / scale, atol=2e-5)


@pytest.mark.parametrize("variant", ["r3d_18", "mc3_18", "r2plus1d_18"])
def test_converted_tree_matches_init_shapes(variant):
    """Converter output must be drop-in for randomly initialized variables."""
    torch_model = TorchVideoResNet(variant)
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    converted = convert_video_resnet_state_dict(sd, variant)

    flax_model = VideoResNet(variant)
    ref = flax_model.init(jax.random.key(0), jnp.zeros((1, 4, 32, 32, 3)))

    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, converted)
    assert ref_shapes == got_shapes


@pytest.mark.parametrize("variant", ["r3d_18", "mc3_18", "r2plus1d_18"])
def test_logit_shape_and_param_count(variant):
    model = VideoResNet(variant)
    x = jnp.zeros((1, 8, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (1, 400)
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"]))
    # published torchvision sizes: r3d 33.4M, mc3 11.7M, r2+1d 31.5M
    expected = {"r3d_18": 33.4e6, "mc3_18": 11.7e6, "r2plus1d_18": 31.5e6}[variant]
    assert abs(n - expected) / expected < 0.02, n


@pytest.mark.parametrize("num_classes", [359, 487])
def test_ig65m_head_sizes_convert_and_run(num_classes, rng):
    """ig65m r2plus1d_34 checkpoints keep the torchvision layout but carry
    359-way (IG65M) / 487-way (Kinetics+IG65M) heads
    (reference model.py:46-52 torch.hub ig65m load); the converter must be
    head-size agnostic end to end."""
    torch_model = TorchVideoResNet("r2plus1d_34", num_classes=num_classes)
    randomize(torch_model, seed=11)
    torch_model.eval()
    x = rng.normal(size=(1, 4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        expected = torch_model(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = convert_video_resnet_state_dict(sd, "r2plus1d_34")
    got = np.asarray(
        VideoResNet("r2plus1d_34", num_classes=num_classes).apply(
            variables, jnp.asarray(x)
        )
    )
    assert got.shape == (1, num_classes)
    scale = np.abs(expected).max()
    np.testing.assert_allclose(got / scale, expected / scale, atol=2e-5)
