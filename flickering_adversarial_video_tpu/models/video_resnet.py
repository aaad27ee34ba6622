"""Video ResNet family (R3D-18, MC3-18, R(2+1)D-18), TPU-native Flax.

Parity target: the torchvision `video_resnet` victims the reference loads via
`getattr(torchvision.models.video, base_model)(True, True)`
(utils_cv/action_recognition/model.py:402-441).  Architecture (public
torchvision definition, Tran et al. 2018, arXiv:1711.11248):

  * stem:
      r3d/mc3:  Conv3d(3->64, k=(3,7,7), s=(1,2,2), p=(1,3,3)) + BN + ReLU
      r2plus1d: Conv3d(3->45, k=(1,7,7), s=(1,2,2), p=(0,3,3)) + BN + ReLU
                + Conv3d(45->64, k=(3,1,1), p=(1,0,0)) + BN + ReLU
  * 4 stages of 2 BasicBlocks (64/128/256/512 channels; stages 2-4 stride 2),
    each block conv-BN-ReLU-conv-BN + residual (1x1x1 conv-BN downsample);
    conv type per variant:
      r3d:      full 3x3x3
      mc3:      3x3x3 in stage 1, (1,3,3) spatial-only in stages 2-4
      r2plus1d: every 3x3x3 factored into (1,3,3) -> BN+ReLU -> (3,1,1) with
                midplanes = floor(t*3*3*in*out / (3*3*in + t*out)), t=3
  * global average pool over (T, H, W), then Linear(512 -> num_classes).

TPU-first choices: NDHWC layout; *explicit symmetric padding numbers* (NOT
'SAME') because torch's fixed symmetric padding differs from SAME semantics at
stride 2 — parity is asserted against a torch oracle in
tests/test_video_resnet.py; torch BN eps 1e-5 with affine scale+bias; compute
dtype configurable (bf16 on MXU), params f32.

Inputs are mean/std-normalized pixels in [B, T, H, W, 3]
(utils_cv/action_recognition/dataset.py:28-29 Kinetics statistics).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bn(dt, name: str) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=True,
        use_scale=True,
        use_bias=True,
        epsilon=1e-5,
        momentum=0.9,
        dtype=dt,
        param_dtype=jnp.float32,
        name=name,
    )


def _conv(
    features: int,
    kernel: Sequence[int],
    stride: Sequence[int],
    padding: Sequence[int],
    dt,
    name: str,
):
    pad = [(p, p) for p in padding]

    def make_conv():
        return nn.Conv(
            features=features,
            kernel_size=tuple(kernel),
            strides=tuple(stride),
            padding=pad,
            use_bias=False,
            dtype=dt,
            param_dtype=jnp.float32,
            name=name,
        )

    if os.environ.get("FLICKER_RESNET_OUTPACK", "1") == "0":
        return make_conv()
    # stride-2-W output-packed backward-input for the under-laned stride-1
    # convs (xplane round 2: layer1 bwd fusions at 47 TF/s, dx C=64 = half
    # the MXU lanes).  Forward values identical; parameter path identical
    # (<name>/kernel).  Default ON since the round-3 chip A/B: 22.83 ->
    # 23.53 steps/s on the r2plus1d_18 T=16 B=16 step; FLICKER_RESNET_OUTPACK=0
    # opts out.  Module construction is deferred into the branch so only ONE
    # of the two claims `name` in the parent compact scope.
    from ..ops.conv_wpack import conv_s1_outpack, outpack_eligible_resnet

    def apply(x):
        if outpack_eligible_resnet(x.shape, kernel, stride, padding):
            k = _Kernel((*kernel, x.shape[-1], features), name=name)()
            return conv_s1_outpack(x.astype(dt), k.astype(dt))
        return make_conv()(x)

    return apply


def _midplanes(in_planes: int, out_planes: int) -> int:
    return (in_planes * out_planes * 3 * 3 * 3) // (
        in_planes * 3 * 3 + 3 * out_planes
    )


class Conv3DSimple(nn.Module):
    """Full 3x3x3 conv (torchvision Conv3DSimple)."""

    in_planes: int
    out_planes: int
    mid_planes: int = 0  # unused; uniform builder signature
    stride: int = 1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = self.stride
        return _conv(
            self.out_planes, (3, 3, 3), (s, s, s), (1, 1, 1), self.compute_dtype, "conv"
        )(x)


class Conv3DNoTemporal(nn.Module):
    """(1,3,3) spatial-only conv; temporal stride stays 1 (torchvision)."""

    in_planes: int
    out_planes: int
    mid_planes: int = 0  # unused; uniform builder signature
    stride: int = 1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = self.stride
        return _conv(
            self.out_planes, (1, 3, 3), (1, s, s), (0, 1, 1), self.compute_dtype, "conv"
        )(x)


class Conv2Plus1D(nn.Module):
    """(1,3,3) -> BN -> ReLU -> (3,1,1) factorization (torchvision Conv2Plus1D).

    mid_planes is computed ONCE per BasicBlock from (block in, block out) and
    shared by both of the block's convs, matching torchvision exactly.
    """

    in_planes: int
    out_planes: int
    mid_planes: int
    stride: int = 1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = self.stride
        dt = self.compute_dtype
        x = _conv(self.mid_planes, (1, 3, 3), (1, s, s), (0, 1, 1), dt, "conv_s")(x)
        x = _bn(dt, "bn_mid")(x)
        x = nn.relu(x)
        x = _conv(self.out_planes, (3, 1, 1), (s, 1, 1), (1, 0, 0), dt, "conv_t")(x)
        return x


_CONV_BUILDERS: Dict[str, Any] = {
    "simple": Conv3DSimple,
    "no_temporal": Conv3DNoTemporal,
    "2plus1": Conv2Plus1D,
}


class BasicBlock(nn.Module):
    """Residual BasicBlock (expansion 1)."""

    in_planes: int
    planes: int
    conv_builder: str
    stride: int = 1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        builder = _CONV_BUILDERS[self.conv_builder]
        mid = _midplanes(self.in_planes, self.planes)
        residual = x
        out = builder(self.in_planes, self.planes, mid, self.stride, dt, name="conv1")(x)
        out = _bn(dt, "bn1")(out)
        out = nn.relu(out)
        out = builder(self.planes, self.planes, mid, 1, dt, name="conv2")(out)
        out = _bn(dt, "bn2")(out)
        if self.stride != 1 or self.in_planes != self.planes:
            s = self.stride
            ts = 1 if self.conv_builder == "no_temporal" else s
            residual = _conv(
                self.planes, (1, 1, 1), (ts, s, s), (0, 0, 0), dt, "downsample_conv"
            )(x)
            residual = _bn(dt, "downsample_bn")(residual)
        return nn.relu(out + residual)


class _Kernel(nn.Module):
    """Bare kernel holder keeping the packed stems' parameter paths identical
    to the plain nn.Conv layout (<name>/kernel)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )


def _packed_spatial_conv(x, kernel, dt, prepacked=False):
    """Stride-(1,2,2) C_in=3 stem conv via spatial space-to-depth: identical
    math (torch symmetric pad 3 -> packed pads (2,1)), 4x the MXU input
    lanes.  The stem is the dominant cost of the video-ResNet forward on TPU
    (C_in=3 uses 3/128 lanes); see ops/space_to_depth.py.
    prepacked=True: x already arrives in the packed layout."""
    from ..ops.space_to_depth import pack_conv_spatial, pack_input

    xp = x.astype(dt) if prepacked else pack_input(x.astype(dt), axes=(2, 3))
    kp, pad_h, pad_w = pack_conv_spatial(kernel, 3, 3)
    kt = kernel.shape[0]
    pad_t = (kt // 2, kt // 2)  # torch padding=(1,3,3) or (0,3,3)
    if kt == 1:
        pad_t = (0, 0)
    return jax.lax.conv_general_dilated(
        xp,
        kp.astype(dt),
        window_strides=(1, 1, 1),
        padding=[pad_t, pad_h, pad_w],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=dt,
    )


def _deep_packed_spatial_conv(xp, kernel, dt):
    """Stride-(*,2,2) stem conv on FACTOR-4 spatially packed input
    ([B,T,H/4,W/4,16*Cin], pack_input_factors((1,4,4)) channel order) with
    factor-2 packed output sub-positions ([..., H/4, W/4, 4*Cout], order
    (s_h, s_w, Cout)).

    Why: the classic 2x2 pack leaves 12-lane input / 45-lane mid tensors in
    the r2plus1d stem — every HBM transaction on them is ~35% full, and the
    backward's d(x_packed) conv (C_out=12) ran at 5.2 TF/s with the d(delta)
    reduce fused behind it (xplane 2026-08-20: 2.6 + 1.2 ms).  At 16x pack
    the dgrad fills 48 lanes and the mid tensor 180; the 12*12 receptive
    window costs 2.25x the classic pack's structural MACs, which the fill
    buys back several times over on these pathological shapes."""
    from ..ops.space_to_depth import pack_conv_spatial_s2

    kp, pad_h, pad_w = pack_conv_spatial_s2(kernel, 3, 3)
    kt = kernel.shape[0]
    pad_t = (kt // 2, kt // 2) if kt > 1 else (0, 0)
    return jax.lax.conv_general_dilated(
        xp,
        kp.astype(dt),
        window_strides=(1, 1, 1),
        padding=[pad_t, pad_h, pad_w],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=dt,
    )


class _BNParams(nn.Module):
    """BatchNorm parameter holder with nn.BatchNorm's exact variable paths
    (params/<name>/{scale,bias}, batch_stats/<name>/{mean,var}) for manual
    tiled application on packed-channel tensors."""

    c: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.c,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (self.c,), jnp.float32
        )
        var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (self.c,), jnp.float32
        )
        return scale, bias, mean.value, var.value


def _bn_tiled(x, bn_params, tile, dt, eps=1e-5):
    """Inference BatchNorm applied with each [C] vector tiled `tile`x on the
    packed channel dim (sub-position-major order).  Same op order as flax
    BatchNorm._normalize: y = (x - mean) * (rsqrt(var+eps) * scale) + bias,
    promoted to the compute dtype."""
    scale, bias, mean, var = (jnp.tile(v, tile).astype(dt) for v in bn_params)
    mul = jax.lax.rsqrt(var + jnp.asarray(eps, dt)) * scale
    return (x.astype(dt) - mean) * mul + bias


def _stem_can_pack(x) -> bool:
    return x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0


class R3DStem(nn.Module):
    compute_dtype: Any = jnp.float32
    packed: bool = True
    # input arrives already spatially packed ([B,T,H/2,W/2,4C]): the engine
    # fused the pack into the uint8 preprocess (ops/packed_apply.py)
    prepacked_input: bool = False

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        if self.prepacked_input:
            cin = x.shape[-1] // 4
            kernel = _Kernel((3, 7, 7, cin, 64), name="conv")()
            x = _packed_spatial_conv(x, kernel, dt, prepacked=True)
        elif self.packed and _stem_can_pack(x):
            kernel = _Kernel((3, 7, 7, x.shape[-1], 64), name="conv")()
            x = _packed_spatial_conv(x, kernel, dt)
        else:
            x = _conv(64, (3, 7, 7), (1, 2, 2), (1, 3, 3), dt, "conv")(x)
        x = _bn(dt, "bn")(x)
        return nn.relu(x)


class R2Plus1DStem(nn.Module):
    compute_dtype: Any = jnp.float32
    packed: bool = True
    prepacked_input: bool = False

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        if self.prepacked_input and x.shape[-1] == 48:
            # deep (factor-4) spatial pack: conv_s with packed output
            # sub-positions (the 48-lane dgrad / 180-lane mid fix),
            # BN/relu/conv_t applied packed (conv_t is spatially pointwise
            # -> block-diagonal over the 4 sub-positions), one
            # depth-to-space at the stem exit.  Unpacking straight after
            # conv_s instead measured WORSE (22.6 vs 23.6 steps/s chip A/B
            # 2026-08-20): the two depth-to-space transposes on the mid
            # tensor cost more than the 45-channel fill tax they avoid.
            from ..ops.space_to_depth import depth_to_space_hw

            kernel = _Kernel((1, 7, 7, 3, 45), name="conv_s")()
            x = _deep_packed_spatial_conv(x, kernel, dt)  # [B,T,H/4,W/4,180]
            x = _bn_tiled(x, _BNParams(45, name="bn_s")(), 4, dt)
            x = nn.relu(x)
            kt = _Kernel((3, 1, 1, 45, 64), name="conv_t")()
            ktp = jnp.einsum("ab,tuvio->tuvaibo", jnp.eye(4, dtype=kt.dtype), kt)
            ktp = ktp.reshape(3, 1, 1, 180, 256)
            x = jax.lax.conv_general_dilated(
                x,
                ktp.astype(dt),
                window_strides=(1, 1, 1),
                padding=[(1, 1), (0, 0), (0, 0)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=dt,
            )
            x = _bn_tiled(x, _BNParams(64, name="bn_t")(), 4, dt)
            return depth_to_space_hw(nn.relu(x), 2)
        if self.prepacked_input:
            cin = x.shape[-1] // 4
            kernel = _Kernel((1, 7, 7, cin, 45), name="conv_s")()
            x = _packed_spatial_conv(x, kernel, dt, prepacked=True)
        elif self.packed and _stem_can_pack(x):
            kernel = _Kernel((1, 7, 7, x.shape[-1], 45), name="conv_s")()
            x = _packed_spatial_conv(x, kernel, dt)
        else:
            x = _conv(45, (1, 7, 7), (1, 2, 2), (0, 3, 3), dt, "conv_s")(x)
        x = _bn(dt, "bn_s")(x)
        x = nn.relu(x)
        x = _conv(64, (3, 1, 1), (1, 1, 1), (1, 0, 0), dt, "conv_t")(x)
        x = _bn(dt, "bn_t")(x)
        return nn.relu(x)


# BasicBlock counts per stage: 18-layer [2,2,2,2]; 34-layer [3,4,6,3]
# (the reference's torch.hub r2plus1d_34 ig65m/kinetics victims, model.py:47-52).
_LAYER_COUNTS = {"18": (2, 2, 2, 2), "34": (3, 4, 6, 3)}


class VideoResNet(nn.Module):
    """Generic video ResNet (BasicBlock).

    `variant` in {'r3d_18', 'mc3_18', 'r2plus1d_18', 'r2plus1d_34'};
    __call__ takes [B, T, H, W, 3] normalized input, returns
    [B, num_classes] logits.
    """

    variant: str = "r3d_18"
    num_classes: int = 400
    compute_dtype: Any = jnp.float32
    # __call__ receives the video already spatially packed
    # ([B,T,H/2,W/2,4C]); parameters identical to the unpacked model
    # (ops/packed_apply.py apply_torch_flicker_packed path).
    prepacked_stem_input: bool = False

    def _stage_convs(self) -> Tuple[str, str, str, str]:
        family = self.variant.rsplit("_", 1)[0]
        if family == "r3d":
            return ("simple",) * 4
        if family == "mc3":
            return ("simple", "no_temporal", "no_temporal", "no_temporal")
        if family == "r2plus1d":
            return ("2plus1",) * 4
        raise ValueError(f"unknown variant {self.variant}")

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = self.compute_dtype
        x = x.astype(dt)
        if self.variant.startswith("r2plus1d"):
            x = R2Plus1DStem(
                dt, prepacked_input=self.prepacked_stem_input, name="stem"
            )(x)
        else:
            x = R3DStem(
                dt, prepacked_input=self.prepacked_stem_input, name="stem"
            )(x)

        convs = self._stage_convs()
        depth = self.variant.rsplit("_", 1)[1]
        counts = _LAYER_COUNTS[depth]
        planes = (64, 128, 256, 512)
        in_planes = 64
        for i, (p, conv, n_blocks) in enumerate(
            zip(planes, convs, counts), start=1
        ):
            for b in range(n_blocks):
                stride = 2 if (i > 1 and b == 0) else 1
                x = BasicBlock(
                    in_planes, p, conv, stride, dt, name=f"layer{i}/block{b}"
                )(x)
                in_planes = p

        x = jnp.mean(x, axis=(1, 2, 3))  # global avgpool over T,H,W
        x = nn.Dense(
            self.num_classes, dtype=dt, param_dtype=jnp.float32, name="fc"
        )(x)
        return x.astype(jnp.float32)


def r3d_18(num_classes: int = 400, compute_dtype: Any = jnp.float32) -> VideoResNet:
    return VideoResNet("r3d_18", num_classes, compute_dtype)


def mc3_18(num_classes: int = 400, compute_dtype: Any = jnp.float32) -> VideoResNet:
    return VideoResNet("mc3_18", num_classes, compute_dtype)


def r2plus1d_18(num_classes: int = 400, compute_dtype: Any = jnp.float32) -> VideoResNet:
    return VideoResNet("r2plus1d_18", num_classes, compute_dtype)


def r2plus1d_34(num_classes: int = 400, compute_dtype: Any = jnp.float32) -> VideoResNet:
    """The torch.hub ig65m/kinetics victim family (model.py:46-52); pass
    num_classes 359/487 for the ig65m checkpoints."""
    return VideoResNet("r2plus1d_34", num_classes, compute_dtype)


def make_packed_apply_fn(
    variant: str, num_classes: int = 400, compute_dtype: Any = jnp.bfloat16
):
    """(variables, packed_x) -> logits over the prepacked-stem VideoResNet.

    Shares the variables of the unpacked model (packing is apply-time);
    consumed by the engine's torch-world packed fast path
    (ops/packed_apply.py apply_torch_flicker_packed)."""
    packed_model = VideoResNet(
        variant, num_classes, compute_dtype, prepacked_stem_input=True
    )
    fn = lambda variables, packed_x: packed_model.apply(variables, packed_x)
    # advertise deep (factor-4) stem support to the engine's pack-factor
    # choice (ops/packed_apply.torch_pack_factor): the r2plus1d stems accept
    # the 48-channel deep layout, the r3d/mc3 3-D stems keep the classic 2x2
    fn.deep_stem = variant.startswith("r2plus1d")
    return fn
