"""Inception-v1 Inflated 3D ConvNet (I3D), TPU-native Flax implementation.

Architecture parity target: the reference's sonnet/TF1 model (i3d.py:32-479 in
/root/reference): 5 conv/pool stem stages, 9 Inception "Mixed" blocks, a
[2,7,7] VALID average pool, a 1x1x1 logits conv with bias, spatial squeeze and
a mean over remaining time steps.  Endpoint names match the reference's
VALID_ENDPOINTS (i3d.py:94-113) so converted checkpoints and endpoint-keyed
tests line up 1:1.

TPU-first choices:
  * NDHWC layout ([B, T, H, W, C]) — channels-last puts C on the 128-wide
    lanes; XLA maps the conv3d contractions onto the MXU directly.
  * `padding='SAME'` on convs and pools — XLA's SAME semantics equal TF's
    (the reference uses snt.SAME throughout), verified by golden tests
    against tf.nn.conv3d / max_pool3d in tests/test_i3d.py.
  * BatchNorm is inference-only with frozen moving statistics
    (sonnet BatchNorm with test_local_stats=False, i3d.py:66-68): beta offset
    only, no gamma scale, eps 1e-3 — matching sonnet v1 defaults.  The victim
    is frozen for the attack, so no train-mode BN exists at all.
  * compute dtype is configurable (bf16 activations on the MXU by default in
    the engine; f32 in tests); parameters stay f32 and are cast on entry.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

I3D_ENDPOINTS = (
    "Conv3d_1a_7x7",
    "MaxPool3d_2a_3x3",
    "Conv3d_2b_1x1",
    "Conv3d_2c_3x3",
    "MaxPool3d_3a_3x3",
    "Mixed_3b",
    "Mixed_3c",
    "MaxPool3d_4a_3x3",
    "Mixed_4b",
    "Mixed_4c",
    "Mixed_4d",
    "Mixed_4e",
    "Mixed_4f",
    "MaxPool3d_5a_2x2",
    "Mixed_5b",
    "Mixed_5c",
    "Logits",
    "Predictions",
)

# (branch0 1x1, branch1 1x1, branch1 3x3, branch2 1x1, branch2 3x3, branch3 1x1)
_MIXED_CHANNELS: Dict[str, Tuple[int, int, int, int, int, int]] = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}

# Reference quirk (i3d.py:418): Mixed_5b's second Branch_2 conv is named
# 'Conv3d_0a_3x3' instead of 'Conv3d_0b_3x3'. Kept for checkpoint parity.
_BRANCH2_SECOND_NAME = {"Mixed_5b": "Conv3d_0a_3x3"}


def _pack_stem_input(x: jax.Array) -> jax.Array:
    """Space-to-depth by 2 over (T, H, W): [B,T,H,W,C] -> [B,T/2,H/2,W/2,8C]
    (shared impl: ops/space_to_depth.py)."""
    from ..ops.space_to_depth import pack_input

    return pack_input(x, axes=(1, 2, 3))


def _pack_stem_kernel(kernel: jax.Array) -> jax.Array:
    """Repack a [7,7,7,Cin,Cout] stride-2 SAME kernel (pads (2,3) at even
    extents) for the packed input: -> [4,4,4,8*Cin,Cout], stride 1, packed
    pads (1,2).  The taps split by parity; math identical to the original
    conv (shared impl + derivation: ops/space_to_depth.py)."""
    from ..ops.space_to_depth import pack_conv_spatiotemporal

    kp, pads = pack_conv_spatiotemporal(kernel, (2, 2, 2))
    assert pads == ((1, 2), (1, 2), (1, 2)), pads
    return kp


class _StemKernel(nn.Module):
    """Bare kernel holder so the packed stem's parameter path matches
    Unit3D's (<stem>/conv_3d/kernel)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32)


class _BNVars(nn.Module):
    """Variable mirror of nn.BatchNorm(use_running_average=True,
    use_scale=False, use_bias=True): same collections/names/shapes, but
    returns the raw (mean, var, bias) so a fused op can consume them."""

    features: int

    @nn.compact
    def __call__(self):
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return mean.value, var.value, bias


def _apply_stem_conv(packed: jax.Array, pk: jax.Array) -> jax.Array:
    """Packed 4-tap stem conv: forward/backward implementations are chosen
    independently (all exact; see ops/space_to_depth.py).

    Default: unrolled 2-D forward + concat-kernel backward (stem_conv_catbwd
    — one wide transposed conv + fusible shift-add; 11.31 -> 11.52 steps/s,
    round 3).  Measured alternatives, all env-gated for A/B:
      FLICKER_STEM_AUTODIFF=1  unrolled fwd+bwd autodiff (round-2 default)
      FLICKER_STEM_ONEPASS=1   3-D single-pass fwd (10.01 steps/s, negative)
      FLICKER_STEM_BWD3D=1     3-D fused bwd (7.51 steps/s, strongly negative
                               — XLA's 3-D conv lowering)
    A hand-packed transposed-conv backward also exists (packed_stem_conv,
    exact-parity tested) but measured slower end to end (153 vs 127 ms/step,
    round 1): the gradient's pack/unpack transposes cost more HBM traffic
    than the wider MXU lanes save."""
    from ..ops.space_to_depth import (
        _stem_fwd_impl,
        stem_conv_catbwd,
        stem_conv_fused_bwd,
        stem_conv_onepass,
    )

    if os.environ.get("FLICKER_STEM_ONEPASS", "") == "1":
        return stem_conv_onepass(packed, pk)
    if os.environ.get("FLICKER_STEM_BWD3D", "") == "1":
        return stem_conv_fused_bwd(packed, pk)
    if os.environ.get("FLICKER_STEM_AUTODIFF", "") == "1":
        return _stem_fwd_impl(packed, pk)
    # default: concat-kernel backward — one wide transposed conv (96/128
    # lanes, single read of g) + fusible temporal shift-add; measured
    # 11.31 -> 11.52 steps/s, bytes 48.0 -> 46.9 GB (round 3)
    return stem_conv_catbwd(packed, pk)


class PackedStemUnit3D(nn.Module):
    """The Conv3d_1a_7x7 stem executed via space-to-depth.

    The naive stem is the single most expensive op in the network on TPU:
    C_in=3 uses 3 of the MXU's 128 lanes (measured ~3% of peak, ~80% of the
    whole forward pass).  Packing 2x2x2 blocks into channels turns it into a
    4x4x4 stride-1 conv with C_in=24 — identical math (parity-split kernel,
    zero padding matches SAME), ~5x faster.  The parameter tree is identical
    to Unit3D's (conv_3d/kernel [7,7,7,3,C] + batch_norm), so converted
    DeepMind checkpoints load unchanged; packing happens at apply time and
    XLA hoists it out of the step as a constant-folded gather.
    """

    output_channels: int = 64
    compute_dtype: Any = jnp.float32
    # 4x spatial pack with output depth-to-space: fills MXU lanes both ways
    # but inflates stem FLOPs 3.4x — measured net-slower (145 vs 127 ms/step
    # at T=64 B=8), kept as an option for other geometries.
    deep_stem: bool = False
    # input arrives already space-to-depth packed ([B,T/2,H/2,W/2,8C]): the
    # engine fused the pack into the uint8 preprocess (ops/packed_apply.py),
    # killing the f32 relayout copies the apply-time pack costs.
    prepacked_input: bool = False
    # emit the MaxPool3d_2a_3x3 output directly: the stem conv is
    # output-packed over H/W so the pool's window structure lives in output
    # CHANNELS (ops/stem_pool.py) — no reduce-window forward (76 GiB/s,
    # PERF.md round 2) and no select-and-scatter backward.  The caller must
    # then SKIP MaxPool3d_2a_3x3.
    fuse_pool2a: bool = False
    # run the stem in the T-major batch-in-lanes view (ops/stem_tmajor.py):
    # input transposed to [H',W',Cin,T'B] (t*B+b lane order) so the four
    # temporal tap slices are contiguous lane windows of one tensor; RETURNS
    # THE VIEW [H',W',Cout,T'B] — the caller pools on it (strided_pool_view)
    # and unviews after.
    tmajor: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.prepacked_input:
            cin = x.shape[-1] // 8
            kernel = _StemKernel(
                (7, 7, 7, cin, self.output_channels), name="conv_3d"
            )()
            packed = x.astype(self.compute_dtype)
            pk = _pack_stem_kernel(kernel).astype(self.compute_dtype)
            if self.fuse_pool2a:
                from ..ops.stem_pool import (
                    pack_stem_kernel_outpack,
                    stem_pool_outpack,
                )

                mean, var, bias = _BNVars(
                    self.output_channels, name="batch_norm"
                )()
                pko = pack_stem_kernel_outpack(pk)
                return stem_pool_outpack(packed, pk, pko, mean, var, bias)
            if self.tmajor:
                from ..ops.stem_tmajor import stem_bn_relu_tmajor, to_tmajor_view

                mean, var, bias = _BNVars(
                    self.output_channels, name="batch_norm"
                )()
                xv = to_tmajor_view(packed)
                return stem_bn_relu_tmajor(xv, pk, mean, var, bias, x.shape[0])
            if os.environ.get("FLICKER_STEM_FUSED_BN", "1") == "1":
                # DEFAULT: conv+BN+relu as one custom-VJP op — the forward
                # fusion writes only the relu output (XLA otherwise keeps
                # the pre-activation alive for the backward relu mask, a
                # second 411 MB write; 11.92 -> 12.03 steps/s, round 3).
                # FLICKER_STEM_FUSED_BN=0 restores the separate BN module.
                from ..ops.space_to_depth import stem_conv_bn_relu

                mean, var, bias = _BNVars(
                    self.output_channels, name="batch_norm"
                )()
                return stem_conv_bn_relu(packed, pk, mean, var, bias)
            y = _apply_stem_conv(packed, pk)
            y = nn.BatchNorm(
                use_running_average=True,
                use_scale=False,
                use_bias=True,
                epsilon=1e-3,
                momentum=0.999,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name="batch_norm",
            )(y)
            return nn.relu(y)
        cin = x.shape[-1]
        kernel = _StemKernel(
            (7, 7, 7, cin, self.output_channels), name="conv_3d"
        )()
        deep = self.deep_stem and x.shape[2] % 4 == 0 and x.shape[3] % 4 == 0
        if deep:
            # Deep pack (T by 2, H/W by 4 with output sub-positions):
            # C_in 3 -> 96 and C_out 64 -> 256 fill the MXU's input AND
            # output lanes; output depth-to-space restores the geometry.
            from ..ops.space_to_depth import (
                depth_to_space_hw,
                pack_input_factors,
                pack_stem_kernel_deep,
            )

            packed = pack_input_factors(x.astype(self.compute_dtype), (2, 4, 4))
            pk = pack_stem_kernel_deep(kernel).astype(self.compute_dtype)
            spatial_pads = [(1, 1), (1, 1)]
        else:
            packed = _pack_stem_input(x.astype(self.compute_dtype))
            pk = _pack_stem_kernel(kernel).astype(self.compute_dtype)
            spatial_pads = [(1, 2), (1, 2)]
        if deep:
            # Temporal unroll with the generic pads (deep path keeps autodiff).
            b, tt, hh, ww, c = packed.shape
            xpad = jnp.pad(packed, ((0, 0), (1, 2), (0, 0), (0, 0), (0, 0)))
            y = None
            for m in range(pk.shape[0]):
                sl = xpad[:, m : m + tt].reshape(b * tt, hh, ww, c)
                ym = jax.lax.conv_general_dilated(
                    sl,
                    pk[m],
                    window_strides=(1, 1),
                    padding=spatial_pads,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=self.compute_dtype,
                )
                y = ym if y is None else y + ym
            y = y.reshape(b, tt, hh, ww, -1)
            from ..ops.space_to_depth import depth_to_space_hw

            y = depth_to_space_hw(y, 2)
        else:
            y = _apply_stem_conv(packed, pk)
        y = nn.BatchNorm(
            use_running_average=True,
            use_scale=False,
            use_bias=True,
            epsilon=1e-3,
            momentum=0.999,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="batch_norm",
        )(y)
        return nn.relu(y)


class TmajorUnit3D(nn.Module):
    """Unit3D (stride-1 SAME odd-kernel conv + frozen BN + relu) executed on
    the T-major batch-in-lanes view [H, W, Cin, T'B]
    (ops/stem_tmajor.conv_bn_relu_tmajor): the temporal kernel taps read
    contiguous lane windows, so no b-major relayout exists anywhere in the
    unit.  Parameter tree identical to Unit3D's (conv_3d/kernel
    [kt,kh,kw,Cin,Cout] + batch_norm), so converted checkpoints load
    unchanged."""

    output_channels: int
    kernel_shape: Tuple[int, int, int] = (1, 1, 1)
    compute_dtype: Any = jnp.float32
    return_params: bool = False

    @nn.compact
    def __call__(self, xv: jax.Array, b: int):
        from ..ops.stem_tmajor import conv_bn_relu_tmajor

        kernel = _StemKernel(
            (*self.kernel_shape, xv.shape[2], self.output_channels),
            name="conv_3d",
        )()
        mean, var, bias = _BNVars(self.output_channels, name="batch_norm")()
        if self.return_params:
            # merged-branch mode (TmajorInceptionMixed): declare the unit's
            # params under the usual tree path but let the CALLER run the
            # conv (channel-concatenated with its sibling 1x1 branches)
            return kernel, mean, var, bias
        return conv_bn_relu_tmajor(
            xv, kernel.astype(self.compute_dtype), mean, var, bias, b
        )


def _merge11() -> bool:
    """FLICKER_MIXED_MERGE11=1: run each Mixed block's three 1x1 branch
    convs as one channel-concatenated conv (one input read instead of
    three).  Default off pending the chip A/B; exactness vs the separate
    convs in tests/test_mixed_merge11.py."""
    import os

    return os.environ.get("FLICKER_MIXED_MERGE11", "0") == "1"


class TmajorInceptionMixed(nn.Module):
    """InceptionMixed on the T-major view: the four branches are
    TmajorUnit3D convs plus the stride-1 (3,3,3) branch_3 pool in the view
    (ops/stem_tmajor.stride1_pool333_view, first-match routing backward);
    the channel concat is dim 2.  Parameter tree identical to
    InceptionMixed's."""

    channels: Tuple[int, int, int, int, int, int]
    branch2_second_name: str = "Conv3d_0b_3x3"
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xv: jax.Array, b: int) -> jax.Array:
        from ..ops.stem_tmajor import conv_bn_relu_tmajor, stride1_pool333_view

        c0, c1a, c1b, c2a, c2b, c3 = self.channels
        dt = self.compute_dtype
        if _merge11():
            # FLICKER_MIXED_MERGE11: the three 1x1 branch convs read the
            # SAME input — run them as ONE channel-concatenated conv+BN+relu
            # (one x traversal instead of three, and the tiny-Cout branches
            # (16-64 lanes) ride the wide conv's MXU fill).  Param tree
            # unchanged (return_params mode); math is the same per-output-
            # channel contraction over Cin.
            k0, m0, v0, g0 = TmajorUnit3D(
                c0, (1, 1, 1), compute_dtype=dt,
                name="Branch_0/Conv3d_0a_1x1", return_params=True,
            )(xv, b)
            k1, m1, v1, g1 = TmajorUnit3D(
                c1a, (1, 1, 1), compute_dtype=dt,
                name="Branch_1/Conv3d_0a_1x1", return_params=True,
            )(xv, b)
            k2, m2, v2, g2 = TmajorUnit3D(
                c2a, (1, 1, 1), compute_dtype=dt,
                name="Branch_2/Conv3d_0a_1x1", return_params=True,
            )(xv, b)
            ycat = conv_bn_relu_tmajor(
                xv,
                jnp.concatenate([k0, k1, k2], axis=-1).astype(dt),
                jnp.concatenate([m0, m1, m2]),
                jnp.concatenate([v0, v1, v2]),
                jnp.concatenate([g0, g1, g2]),
                b,
            )
            b0 = ycat[:, :, :c0]
            b1 = ycat[:, :, c0 : c0 + c1a]
            b2 = ycat[:, :, c0 + c1a :]
        else:
            b0 = TmajorUnit3D(
                c0, (1, 1, 1), compute_dtype=dt, name="Branch_0/Conv3d_0a_1x1"
            )(xv, b)
            b1 = TmajorUnit3D(
                c1a, (1, 1, 1), compute_dtype=dt, name="Branch_1/Conv3d_0a_1x1"
            )(xv, b)
            b2 = TmajorUnit3D(
                c2a, (1, 1, 1), compute_dtype=dt, name="Branch_2/Conv3d_0a_1x1"
            )(xv, b)
        b1 = TmajorUnit3D(
            c1b, (3, 3, 3), compute_dtype=dt, name="Branch_1/Conv3d_0b_3x3"
        )(b1, b)
        b2 = TmajorUnit3D(
            c2b,
            (3, 3, 3),
            compute_dtype=dt,
            name=f"Branch_2/{self.branch2_second_name}",
        )(b2, b)
        b3 = stride1_pool333_view(xv, b)
        b3 = TmajorUnit3D(
            c3, (1, 1, 1), compute_dtype=dt, name="Branch_3/Conv3d_0b_1x1"
        )(b3, b)
        return jnp.concatenate([b0, b1, b2, b3], axis=2)


class Unit3D(nn.Module):
    """Conv3D + (inference) BatchNorm + activation (reference i3d.py:32-71)."""

    output_channels: int
    kernel_shape: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_batch_norm: bool = True
    use_bias: bool = False
    use_activation: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.conv_wpack import (
            conv3x3s1_outpack,
            conv3x3s1_wpack,
            wpack_eligible,
        )

        # default: stride-2-W pair-packed backward for the half-lane Conv2c
        # bwd-input (11.52 -> 11.92 steps/s, round 3); FLICKER_CONV2C_OUTPACK=0
        # restores plain autodiff, FLICKER_CONV2C_WPACK=1 selects the
        # both-sides pack (measured negative, kept for A/B)
        _wpack_mode = None
        if os.environ.get("FLICKER_CONV2C_OUTPACK", "1") == "1":
            _wpack_mode = conv3x3s1_outpack
        if os.environ.get("FLICKER_CONV2C_WPACK", "") == "1":
            _wpack_mode = conv3x3s1_wpack
        if (
            _wpack_mode is not None
            and not self.use_bias
            and wpack_eligible(x.shape, self.kernel_shape, self.stride)
        ):
            # identical forward conv, lane-packed backward-input
            # (ops/conv_wpack.py); parameter path matches nn.Conv's.
            kernel = _StemKernel(
                (*self.kernel_shape, x.shape[-1], self.output_channels),
                name="conv_3d",
            )()
            x = _wpack_mode(x, kernel.astype(self.compute_dtype))
        else:
            x = nn.Conv(
                features=self.output_channels,
                kernel_size=tuple(self.kernel_shape),
                strides=tuple(self.stride),
                padding="SAME",
                use_bias=self.use_bias,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name="conv_3d",
            )(x)
        if self.use_batch_norm:
            # Frozen inference BN: offset (beta) only, sonnet v1 eps.
            x = nn.BatchNorm(
                use_running_average=True,
                use_scale=False,
                use_bias=True,
                epsilon=1e-3,
                momentum=0.999,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name="batch_norm",
            )(x)
        if self.use_activation:
            x = nn.relu(x)
        return x


def _max_pool_same(
    x: jax.Array, window: Sequence[int], strides: Sequence[int],
    naive: bool = False, force_custom: bool = False,
) -> jax.Array:
    """tf.nn.max_pool3d(..., padding='SAME') equivalent over NDHWC.

    Routed through ops/maxpool.py max_pool_same: identical forward values,
    but the backward replaces XLA's select-and-scatter (28-37 GiB/s on the
    overlapping stride-1 Inception-branch pools, ~27 ms of the round-1 attack
    step) with a scatter-free separable routing that reproduces the same
    first-match tie rule (tests/test_maxpool.py asserts routing equality).

    naive=True keeps XLA's plain reduce-window + select-and-scatter autodiff
    on every pool — the lowering the reference's TF1 graph gets, used by the
    bench's reference-protocol baseline so the denominator does not silently
    inherit this framework's pool optimizations."""
    if naive:
        from jax import lax

        return lax.reduce_window(
            x, -jnp.inf, lax.max, (1, *window, 1), (1, *strides, 1), "SAME"
        )
    from ..ops.maxpool import max_pool_same

    return max_pool_same(x, tuple(window), tuple(strides), force_custom=force_custom)


class InceptionMixed(nn.Module):
    """One Inception block: 4 parallel branches, channel concat
    (reference i3d.py:194-220 et seq.)."""

    channels: Tuple[int, int, int, int, int, int]
    branch2_second_name: str = "Conv3d_0b_3x3"
    compute_dtype: Any = jnp.float32
    naive_pools: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c0, c1a, c1b, c2a, c2b, c3 = self.channels
        dt = self.compute_dtype
        b0 = Unit3D(c0, (1, 1, 1), compute_dtype=dt, name="Branch_0/Conv3d_0a_1x1")(x)
        b1 = Unit3D(c1a, (1, 1, 1), compute_dtype=dt, name="Branch_1/Conv3d_0a_1x1")(x)
        b1 = Unit3D(c1b, (3, 3, 3), compute_dtype=dt, name="Branch_1/Conv3d_0b_3x3")(b1)
        b2 = Unit3D(c2a, (1, 1, 1), compute_dtype=dt, name="Branch_2/Conv3d_0a_1x1")(x)
        b2 = Unit3D(
            c2b, (3, 3, 3), compute_dtype=dt, name=f"Branch_2/{self.branch2_second_name}"
        )(b2)
        b3 = _max_pool_same(x, (3, 3, 3), (1, 1, 1), naive=self.naive_pools)
        b3 = Unit3D(c3, (1, 1, 1), compute_dtype=dt, name="Branch_3/Conv3d_0b_1x1")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=4)


class InceptionI3D(nn.Module):
    """Full I3D (reference i3d.py:74-479).

    __call__(x) -> (averaged_logits, endpoints): x is [B, T, H, W, 3] in
    [-1, 1]; averaged_logits is [B, num_classes].  `final_endpoint` truncates
    construction exactly like the reference's flag.
    """

    num_classes: int = 400
    spatial_squeeze: bool = True
    final_endpoint: str = "Logits"
    compute_dtype: Any = jnp.float32
    # execute the 7x7x7/s2 stem via space-to-depth (PackedStemUnit3D):
    # bit-identical math, ~5x faster on the MXU. Requires even T/H/W;
    # falls back to the plain Unit3D stem otherwise.
    packed_stem: bool = True
    # __call__ receives the video already space-to-depth packed
    # ([B,T/2,H/2,W/2,24]); parameters are identical to the unpacked model,
    # so one variables dict serves both (ops/packed_apply.py path).
    prepacked_stem_input: bool = False
    # plain XLA reduce-window + select-and-scatter on every pool (the TF1
    # graph's lowering) — the bench baseline's honest configuration
    naive_pools: bool = False
    # __call__ receives the STEM OUTPUT (post conv+BN+relu, [B,T',H,W,64]):
    # the engine computed the stem inside the fused preprocess head
    # (ops/packed_apply.py flicker_stem_head); stem parameters in the
    # variables dict are simply left untouched.
    skip_stem: bool = False
    # __call__ receives the stem output as the T-MAJOR VIEW [H,W,64,T',B]
    # (ops/stem_tmajor.flicker_stem_tmajor): MaxPool3d_2a_3x3 pools the view
    # in place, then the unview hands the Mixed region its b-major layout.
    skip_stem_view: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        if self.final_endpoint not in I3D_ENDPOINTS:
            raise ValueError(f"Unknown final endpoint {self.final_endpoint}")
        dt = self.compute_dtype
        x = x.astype(dt)
        end_points: Dict[str, jax.Array] = {}

        def done(name: str) -> bool:
            end_points[name] = x
            return self.final_endpoint == name

        # Fused stem+pool (FLICKER_STEM_OUTPACK): the stem op emits the
        # MaxPool3d_2a_3x3 value directly (ops/stem_pool.py), so the
        # Conv3d_1a_7x7 endpoint is never materialized — only eligible when
        # nothing downstream asks for it.  Round-3 chip A/B: a clear LOSS at
        # B=8 (11.85 -> 8.22 steps/s; the outpacked stem conv adds 24 GB of
        # HBM traffic) but, COMBINED with force-custom strided pools, the
        # single-video B=1 winner (29.47 -> 31.71 steps/s, the select-and-
        # scatter collapse at B=1 is worse than the outpack overhead).  So
        # the default is batch-aware: ON at B==1, OFF otherwise; env "1"/"0"
        # force either way.
        stem_env = os.environ.get("FLICKER_STEM_OUTPACK", "")
        fuse_pool2a = (
            self.prepacked_stem_input
            and not self.skip_stem
            and (stem_env == "1" or (stem_env != "0" and x.shape[0] == 1))
            and self.final_endpoint != "Conv3d_1a_7x7"
            and not self.naive_pools
            and x.shape[2] % 2 == 0
            and x.shape[3] % 2 == 0
        )
        # Second half of the B=1 winning combo: route the strided pools
        # (3a/4a/5a; 2a is gone inside the fused stem) through the custom
        # separable backward instead of XLA's select-and-scatter, which
        # collapses to 17 GiB/s at B=1 (PERF.md round 2).  Only with the
        # fused stem — force-custom ALONE measured 27.36 steps/s (a loss).
        force_custom_strided = fuse_pool2a and x.shape[0] == 1
        # T-major batch-in-lanes stem region (ops/stem_tmajor.py): the stem
        # runs on a [H',W',Cin,T'B] view whose default layout IS the tap
        # convs' preferred physical order, the temporal tap slices become
        # contiguous lane windows, and MaxPool3d_2a_3x3 pools the view in
        # place — the stem-tap relayout chain (~2.5 ms, PERF.md round-3 SoL
        # table) never exists.  Chip A/B 2026-08-19 (T=64 B=8 headline):
        # 12.87 -> 13.92 steps/s (+8.1%), HBM bytes 45.3 -> 43.0 GB.
        # DEFAULT ON for single-device processes with 128-aligned B*T'
        # lanes; the t*B+b lane merge shards badly under a data mesh (B
        # minor in the merged dim forces GSPMD gathers), so multi-device
        # keeps the b-major path unless FLICKER_STEM_TMAJOR=1 forces it.
        tmj_env = os.environ.get("FLICKER_STEM_TMAJOR", "")
        tmajor = (
            self.prepacked_stem_input
            and not self.skip_stem
            and not fuse_pool2a
            and not self.naive_pools
            and self.final_endpoint not in ("Conv3d_1a_7x7",)
            and x.shape[2] % 2 == 0
            and x.shape[3] % 2 == 0
            and (
                tmj_env == "1"
                or (
                    tmj_env != "0"
                    and jax.device_count() == 1
                    and (x.shape[0] * x.shape[1]) % 128 == 0
                )
            )
        )
        view_b = None
        if self.skip_stem_view:
            h_, w_, c_, t_, view_b = x.shape
            xv = x.reshape(h_, w_, c_, t_ * view_b)
        elif self.skip_stem:
            pass  # x IS the stem output; fall through to the endpoint check
        elif tmajor:
            view_b = x.shape[0]
            xv = PackedStemUnit3D(
                64,
                compute_dtype=dt,
                prepacked_input=True,
                tmajor=True,
                name="Conv3d_1a_7x7",
            )(x)
        elif fuse_pool2a:
            x = PackedStemUnit3D(
                64,
                compute_dtype=dt,
                prepacked_input=True,
                fuse_pool2a=True,
                name="Conv3d_1a_7x7",
            )(x)
            if done("MaxPool3d_2a_3x3"):
                return x, end_points
        elif self.prepacked_stem_input:
            x = PackedStemUnit3D(
                64, compute_dtype=dt, prepacked_input=True, name="Conv3d_1a_7x7"
            )(x)
        elif self.packed_stem and all(s % 2 == 0 for s in x.shape[1:4]):
            x = PackedStemUnit3D(64, compute_dtype=dt, name="Conv3d_1a_7x7")(x)
        else:
            x = Unit3D(
                64, (7, 7, 7), (2, 2, 2), compute_dtype=dt, name="Conv3d_1a_7x7"
            )(x)
        view_2bc = False
        vdepth = 0
        if view_b is not None:
            # ---- T-major view region: pool2a, then (gated) 2b/2c/3a ----
            from ..ops.stem_tmajor import from_tmajor_view, strided_pool_view

            b = view_b
            # endpoint values materialize only if a consumer asks (DCE'd in
            # the attack step, which uses logits alone)
            end_points["Conv3d_1a_7x7"] = from_tmajor_view(xv, b)
            yv = strided_pool_view(xv)
            x = from_tmajor_view(yv, b)
            if done("MaxPool3d_2a_3x3"):
                return x, end_points
            # FLICKER_TMAJOR_2BC: continue 2b/2c/3a in the view — Conv2b is
            # a plain 1x1 view conv, Conv2c's temporal-3 taps are lane
            # windows (same trick as the stem), pool3a is spatial-only so
            # strided_pool_view pools the view in place.  The b-major<->view
            # frontier moves from pool2a's output to pool3a's (4/3x fewer
            # bytes) and pool3a's select-and-scatter backward binds in the
            # view orientation (354 -> ~590 GiB/s, xplane 2026-08-19).
            if (
                os.environ.get("FLICKER_TMAJOR_2BC", "1") != "0"
                and yv.shape[0] % 2 == 0
                and yv.shape[1] % 2 == 0
            ):
                view_2bc = True
                yv = TmajorUnit3D(
                    64, (1, 1, 1), compute_dtype=dt, name="Conv3d_2b_1x1"
                )(yv, b)
                x = from_tmajor_view(yv, b)
                if done("Conv3d_2b_1x1"):
                    return x, end_points
                yv = TmajorUnit3D(
                    192, (3, 3, 3), compute_dtype=dt, name="Conv3d_2c_3x3"
                )(yv, b)
                x = from_tmajor_view(yv, b)
                if done("Conv3d_2c_3x3"):
                    return x, end_points
                yv = strided_pool_view(yv)
                x = from_tmajor_view(yv, b)
                if done("MaxPool3d_3a_3x3"):
                    return x, end_points
                # FLICKER_TMAJOR_DEPTH: how deep the view region extends.
                # "3a": unview after pool3a.  "4a": Mixed_3b/3c + MaxPool4a
                # in the view (ops/stem_tmajor.pool4a_view — temporal
                # stride-2 is a free parity reshape on the lanes).  "5a":
                # + Mixed_4b-4f + MaxPool5a.  "5c" (default): + Mixed_5b/5c —
                # the whole network runs in the view, unviewing only before
                # the logits head.  Chip A/B 2026-08-19 (T=64 B=8 headline,
                # ms/step xplane): 3a 67.15, 4a 63.75, 5a 60.53, 5c 60.42 —
                # bench 14.76 -> 16.35 steps/s (8.03x -> 8.9x).
                depth_env = os.environ.get("FLICKER_TMAJOR_DEPTH", "5c")
                vdepth = {"3a": 0, "4a": 1, "5a": 2, "5c": 3}.get(depth_env, 0)
                tq = yv.shape[3] // b  # T' at pool3a's output
                if vdepth >= 1 and not (
                    yv.shape[0] % 2 == 0
                    and yv.shape[1] % 2 == 0
                    and tq % 2 == 0
                ):
                    vdepth = 0  # pool4a's parity forms need even extents
                if vdepth >= 2 and not (
                    yv.shape[0] % 4 == 0
                    and yv.shape[1] % 4 == 0
                    and tq % 4 == 0
                ):
                    vdepth = 1  # pool5a halves everything once more
                if vdepth >= 1:
                    from ..ops.stem_tmajor import pool4a_view

                    for name in ("Mixed_3b", "Mixed_3c"):
                        yv = TmajorInceptionMixed(
                            _MIXED_CHANNELS[name],
                            branch2_second_name=_BRANCH2_SECOND_NAME.get(
                                name, "Conv3d_0b_3x3"
                            ),
                            compute_dtype=dt,
                            name=name,
                        )(yv, b)
                        x = from_tmajor_view(yv, b)
                        if done(name):
                            return x, end_points
                    yv = pool4a_view(yv, b)
                    x = from_tmajor_view(yv, b)
                    if done("MaxPool3d_4a_3x3"):
                        return x, end_points
                if vdepth >= 2:
                    from ..ops.stem_tmajor import pool5a_view

                    for name in (
                        "Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                        "Mixed_4f",
                    ):
                        yv = TmajorInceptionMixed(
                            _MIXED_CHANNELS[name],
                            branch2_second_name=_BRANCH2_SECOND_NAME.get(
                                name, "Conv3d_0b_3x3"
                            ),
                            compute_dtype=dt,
                            name=name,
                        )(yv, b)
                        x = from_tmajor_view(yv, b)
                        if done(name):
                            return x, end_points
                    yv = pool5a_view(yv, b)
                    x = from_tmajor_view(yv, b)
                    if done("MaxPool3d_5a_2x2"):
                        return x, end_points
                if vdepth >= 3:
                    for name in ("Mixed_5b", "Mixed_5c"):
                        yv = TmajorInceptionMixed(
                            _MIXED_CHANNELS[name],
                            branch2_second_name=_BRANCH2_SECOND_NAME.get(
                                name, "Conv3d_0b_3x3"
                            ),
                            compute_dtype=dt,
                            name=name,
                        )(yv, b)
                        x = from_tmajor_view(yv, b)
                        if done(name):
                            return x, end_points
        elif not fuse_pool2a:
            # (the excluded paths already produced the 2a pool value)
            if done("Conv3d_1a_7x7"):
                return x, end_points
            # FLICKER_POOL_CUSTOM2A=1: custom routing for THIS pool only —
            # the HLO round-3 copy analysis shows the relayout copies
            # (copy.85/86/89/91, ~4.9 ms) cluster around pool2a's
            # reduce-window/select-and-scatter layout preferences; the
            # elementwise routing backward is layout-agnostic.
            x = _max_pool_same(
                x, (1, 3, 3), (1, 2, 2),
                naive=self.naive_pools,
                force_custom=force_custom_strided
                or os.environ.get("FLICKER_POOL_CUSTOM2A", "") == "1",
            )
            if done("MaxPool3d_2a_3x3"):
                return x, end_points
        if not view_2bc:
            x = Unit3D(64, (1, 1, 1), compute_dtype=dt, name="Conv3d_2b_1x1")(x)
            if done("Conv3d_2b_1x1"):
                return x, end_points
            x = Unit3D(192, (3, 3, 3), compute_dtype=dt, name="Conv3d_2c_3x3")(x)
            if done("Conv3d_2c_3x3"):
                return x, end_points
            x = _max_pool_same(
                x, (1, 3, 3), (1, 2, 2),
                naive=self.naive_pools, force_custom=force_custom_strided,
            )
            if done("MaxPool3d_3a_3x3"):
                return x, end_points

        if vdepth < 1:
            for name in ("Mixed_3b", "Mixed_3c"):
                x = InceptionMixed(
                    _MIXED_CHANNELS[name],
                    branch2_second_name=_BRANCH2_SECOND_NAME.get(name, "Conv3d_0b_3x3"),
                    compute_dtype=dt,
                    naive_pools=self.naive_pools,
                    name=name,
                )(x)
                if done(name):
                    return x, end_points

            x = _max_pool_same(
                x, (3, 3, 3), (2, 2, 2),
                naive=self.naive_pools, force_custom=force_custom_strided,
            )
            if done("MaxPool3d_4a_3x3"):
                return x, end_points

        if vdepth < 2:
            for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
                x = InceptionMixed(
                    _MIXED_CHANNELS[name],
                    branch2_second_name=_BRANCH2_SECOND_NAME.get(name, "Conv3d_0b_3x3"),
                    compute_dtype=dt,
                    naive_pools=self.naive_pools,
                    name=name,
                )(x)
                if done(name):
                    return x, end_points

            x = _max_pool_same(
                x, (2, 2, 2), (2, 2, 2),
                naive=self.naive_pools, force_custom=force_custom_strided,
            )
            if done("MaxPool3d_5a_2x2"):
                return x, end_points

        if vdepth < 3:
            for name in ("Mixed_5b", "Mixed_5c"):
                x = InceptionMixed(
                    _MIXED_CHANNELS[name],
                    branch2_second_name=_BRANCH2_SECOND_NAME.get(name, "Conv3d_0b_3x3"),
                    compute_dtype=dt,
                    naive_pools=self.naive_pools,
                    name=name,
                )(x)
                if done(name):
                    return x, end_points

        # Logits head (reference i3d.py:459-474): VALID avg pool [2,7,7],
        # (dropout is identity at keep_prob=1 inference), 1x1x1 conv w/ bias,
        # spatial squeeze, mean over time.  At the canonical 224x224 input the
        # feature map is [T', 7, 7]; for smaller (test/dryrun) inputs the
        # window clamps to the feature size — identical behavior at 224.
        window = (min(2, x.shape[1]), min(7, x.shape[2]), min(7, x.shape[3]))
        x = nn.avg_pool(x, window_shape=window, strides=(1, 1, 1), padding="VALID")
        logits = Unit3D(
            self.num_classes,
            (1, 1, 1),
            use_batch_norm=False,
            use_bias=True,
            use_activation=False,
            compute_dtype=dt,
            name="Logits/Conv3d_0c_1x1",
        )(x)
        if self.spatial_squeeze:
            logits = jnp.squeeze(logits, axis=(2, 3))
        averaged_logits = jnp.mean(logits.astype(jnp.float32), axis=1)
        end_points["Logits"] = averaged_logits
        if self.final_endpoint == "Logits":
            return averaged_logits, end_points

        predictions = jax.nn.softmax(averaged_logits)
        end_points["Predictions"] = predictions
        return predictions, end_points


def make_packed_apply_fn(num_classes: int = 400, compute_dtype: Any = jnp.bfloat16):
    """(variables, packed_x) -> logits over the prepacked-stem I3D.

    The single factory for the packed-input forward (engine fast path,
    ops/packed_apply.py) — shares the variables of the unpacked model, so
    one converted checkpoint serves both."""
    packed_model = InceptionI3D(
        num_classes=num_classes,
        compute_dtype=compute_dtype,
        prepacked_stem_input=True,
    )
    return lambda variables, packed_x: packed_model.apply(variables, packed_x)[0]


def build_stem_head(
    variables: Any,
    num_classes: int = 400,
    compute_dtype: Any = jnp.bfloat16,
    tmajor: bool = False,
):
    """StemHead for the fused preprocess+stem path (engine `stem_head=`):
    packed 4-tap stem kernel + frozen BN stats from `variables`, and the
    skip_stem forward over the SAME variables (the stem entries are simply
    not consumed by it).  tmajor=True builds the T-major head
    (ops/stem_tmajor.flicker_stem_tmajor + skip_stem_view model)."""
    from ..ops.packed_apply import StemHead

    stem_p = variables["params"]["Conv3d_1a_7x7"]
    stats = variables["batch_stats"]["Conv3d_1a_7x7"]["batch_norm"]
    pk = _pack_stem_kernel(jnp.asarray(stem_p["conv_3d"]["kernel"])).astype(
        compute_dtype
    )
    model = InceptionI3D(
        num_classes=num_classes,
        compute_dtype=compute_dtype,
        skip_stem=not tmajor,
        skip_stem_view=tmajor,
    )
    return StemHead(
        pk=pk,
        mean=jnp.asarray(stats["mean"]),
        var=jnp.asarray(stats["var"]),
        bias=jnp.asarray(stem_p["batch_norm"]["bias"]),
        apply_fn=lambda v, y: model.apply(v, y)[0],
        out_dtype=compute_dtype,
        tmajor=tmajor,
    )


def init_i3d_params(
    key: jax.Array,
    num_classes: int = 400,
    frames: int = 16,
    size: int = 224,
    compute_dtype: Any = jnp.float32,
) -> Dict[str, Any]:
    """Random-init variables dict (params + batch_stats) for tests and for
    shaping converted checkpoints."""
    model = InceptionI3D(num_classes=num_classes, compute_dtype=compute_dtype)
    dummy = jnp.zeros((1, frames, size, size, 3), jnp.float32)
    # jit: eager init dispatches hundreds of tiny ops (painful over a
    # tunneled device); one compiled program initializes everything.
    return jax.jit(model.init)(key, dummy)
