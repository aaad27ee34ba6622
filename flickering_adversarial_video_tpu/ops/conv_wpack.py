"""W-packed backward for stride-1 3x3x3 convs with half-lane input channels.

Motivation (xplane, PERF.md round 3): the attack step's backward-input conv
for Conv3d_2c_3x3 (gradient [B,T,56,56,192] -> input grad [B,T,56,56,64])
runs at ~70 TF/s because its OUTPUT has only 64 channels — half the MXU's
128 lanes.  Packing the W axis by 2 into channels on both sides makes the
same contraction run with 2*192=384 input and 2*64=128 output channels
(full lanes), at identical FLOPs.

Derivation (W axis; T and H are ordinary flipped transposed-conv axes):
forward y[w] = sum_a k[a] x[w+a-1] (SAME, k=3, s=1, pads (1,1)); backward
dx[v] = sum_a k^T[a] g[v+1-a].  Pack v=2u+s and the gradient index 2d+q:
2d+q = 2u+s+1-a is solvable iff s+1-a-q is even, with cell offset
n = (s+1-a-q)/2 in {-1,0,1} — a 3-tap conv over the W-packed gradient whose
kernel blocks are

    (s=0,q=0): a=1 -> n=0        (s=0,q=1): a=0 -> n=0,  a=2 -> n=-1
    (s=1,q=1): a=1 -> n=0        (s=1,q=0): a=0 -> n=+1, a=2 -> n=0

Kernel cotangent is ZERO (frozen victim; the attack differentiates wrt
delta only) — do not reuse where weight gradients are needed.

Exactness: tests/test_pallas_ops.py::TestConvWpack (forward identical HLO,
backward equal to XLA autodiff to float tolerance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .space_to_depth import pack_input


def _fwd_conv(x: jax.Array, k: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
    )


def build_wpack_bwd_kernel(k: jax.Array) -> jax.Array:
    """[3,3,3,Cin,Cout] -> [3,3,3,2*Cout,2*Cin] transposed-conv kernel over
    the W-packed gradient ((q,Cout) in, (s,Cin) out, pads (1,1) each axis)."""
    cin, cout = k.shape[-2], k.shape[-1]
    kt = jnp.flip(k, axis=(0, 1)).swapaxes(-1, -2)  # [3,3,3,Cout,Cin], T/H flipped
    pw = jnp.zeros((3, 3, 3, 2 * cout, 2 * cin), k.dtype)
    # T/H kernel index j reads g at offset j-1 already handled by flip; the
    # W-packed taps come from the (s,q,a,n) table in the module docstring.
    for s, q, a, n in (
        (0, 0, 1, 0),
        (0, 1, 0, 0),
        (0, 1, 2, -1),
        (1, 1, 1, 0),
        (1, 0, 0, 1),
        (1, 0, 2, 0),
    ):
        # kt W axis must also map a -> conv index 2-a'... the a here indexes
        # the ORIGINAL kernel W tap; kt flipped only T/H, so take kt[:, :, a].
        pw = pw.at[
            :, :, n + 1, q * cout : (q + 1) * cout, s * cin : (s + 1) * cin
        ].add(kt[:, :, a])
    return pw


@jax.custom_vjp
def conv3x3s1_wpack(x: jax.Array, k: jax.Array) -> jax.Array:
    """SAME stride-1 3x3x3 conv, forward identical to nn.Conv; backward-input
    computed as a W-packed transposed conv (full MXU lanes)."""
    return _fwd_conv(x, k)


def _wpack_fwd(x, k):
    return _fwd_conv(x, k), (x.shape, k)


def _wpack_bwd(res, g):
    shape, k = res
    b, t, h, w, cin = shape
    g = g.astype(k.dtype)
    gp = pack_input(g, axes=(3,))  # [B,T,H,W/2,2*Cout], (q, Cout) order
    pw = build_wpack_bwd_kernel(k)
    dxp = jax.lax.conv_general_dilated(
        gp,
        pw,
        window_strides=(1, 1, 1),
        padding=[(1, 1), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=k.dtype,
    )  # [B,T,H,W/2,2*Cin], (s, Cin) order
    dx = dxp.reshape(b, t, h, w // 2, 2, cin).reshape(b, t, h, w, cin)
    return dx, jnp.zeros_like(k)


conv3x3s1_wpack.defvjp(_wpack_fwd, _wpack_bwd)


@jax.custom_vjp
def conv3x3s1_outpack(x: jax.Array, k: jax.Array) -> jax.Array:
    """SAME stride-1 3x3x3 conv; backward-input as ONE stride-2-W conv whose
    output channels are W-position pairs ((s, Cin), 2*Cin lanes).

    Unlike the both-sides W-pack (conv3x3s1_wpack: 2x MACs — measured
    negative), the gradient stays UNPACKED and the conv itself strides by 2
    over W with a width-4 kernel:

        dxp[u, (s,c)] = sum_a k^T[a] g[2u + (s+1-a)]      (offsets -1..2)

    Only the width-4 kernel's structural zeros add work: 4/3x the MACs for
    2x the output lanes.  Kernel cotangent is ZERO (frozen victim)."""
    return _fwd_conv(x, k)


def build_outpack_bwd_kernel(k: jax.Array) -> jax.Array:
    """[kT,kH,3,Cin,Cout] -> [kT,kH,4,Cout,2*Cin]: stride-2-W transposed-conv
    kernel with W-pair-packed output channels ((s, Cin) order).  T/H are
    ordinary flipped transposed-conv axes (any odd extents, symmetric pads);
    W must be the 3-tap pads-(1,1) axis of the forward."""
    kt_, kh_, kw_, cin, cout = k.shape
    assert kw_ == 3, kw_
    kt = jnp.flip(k, axis=(0, 1)).swapaxes(-1, -2)  # [kT,kH,3,Cout,Cin]
    kk = jnp.zeros((kt_, kh_, 4, cout, 2 * cin), k.dtype)
    for s in (0, 1):
        for a in (0, 1, 2):
            j = (s + 1 - a) + 1  # W kernel index; reads g[2u + j - 1]
            kk = kk.at[:, :, j, :, s * cin : (s + 1) * cin].add(kt[:, :, a])
    return kk


def _outpack_bwd_impl(g, k, shape, pad_t: int, pad_h: int):
    b, t, h, w, cin = shape
    g = g.astype(k.dtype)
    kk = build_outpack_bwd_kernel(k)
    dxp = jax.lax.conv_general_dilated(
        g,
        kk,
        window_strides=(1, 1, 2),
        padding=[(pad_t, pad_t), (pad_h, pad_h), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=k.dtype,
    )  # [B,T,H,W/2,2*Cin], (s, Cin) order
    return dxp.reshape(b, t, h, w // 2, 2, cin).reshape(b, t, h, w, cin)


def _outpack_fwd(x, k):
    return _fwd_conv(x, k), (x.shape, k)


def _outpack_bwd(res, g):
    shape, k = res
    return _outpack_bwd_impl(g, k, shape, 1, 1), jnp.zeros_like(k)


conv3x3s1_outpack.defvjp(_outpack_fwd, _outpack_bwd)


# ---- generalized variant: any odd (kT,kH,3) stride-1 conv with torch
# symmetric padding (kT//2, kH//2, 1) — covers the video-ResNet (1,3,3)
# spatial convs whose backward-input fusions run C_out-bound (xplane round 2:
# r2plus1d_18 layer1, 4 x 3.6 ms at 47 TF/s with dx C=64 = half lanes).


def _fwd_conv_sym(x: jax.Array, k: jax.Array) -> jax.Array:
    """Stride-1 conv with torch symmetric padding (k//2 per axis) — for odd
    kernels identical to SAME, spelled explicitly to match the video-ResNet
    convs' padding lists (models/video_resnet.py _conv)."""
    pads = [(k.shape[i] // 2,) * 2 for i in range(3)]
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1, 1),
        padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
    )


@jax.custom_vjp
def conv_s1_outpack(x: jax.Array, k: jax.Array) -> jax.Array:
    """Stride-1 (kT,kH,3) conv, symmetric torch padding; backward-input as
    the stride-2-W output-packed transposed conv (full lanes at 4/3x W MACs).
    Kernel cotangent is ZERO (frozen victim)."""
    return _fwd_conv_sym(x, k)


def _s1_outpack_fwd(x, k):
    return _fwd_conv_sym(x, k), (x.shape, k)


def _s1_outpack_bwd(res, g):
    shape, k = res
    dx = _outpack_bwd_impl(g, k, shape, k.shape[0] // 2, k.shape[1] // 2)
    return dx, jnp.zeros_like(k)


conv_s1_outpack.defvjp(_s1_outpack_fwd, _s1_outpack_bwd)


def outpack_eligible_resnet(x_shape, kernel, stride, padding) -> bool:
    """Gate for the video-ResNet convs: stride-1, kW=3 with symmetric torch
    pads, even W, half-lane-or-less input channels (dx C_out <= 64 is the
    measured under-laned case; wider inputs stay on autodiff)."""
    return (
        len(x_shape) == 5
        and tuple(stride) == (1, 1, 1)
        and len(kernel) == 3
        and kernel[2] == 3
        and kernel[0] % 2 == 1
        and kernel[1] % 2 == 1
        and tuple(padding) == (kernel[0] // 2, kernel[1] // 2, 1)
        and x_shape[3] % 2 == 0
        and x_shape[-1] <= 64
    )


def wpack_eligible(x_shape, kernel_shape, stride) -> bool:
    """Gate: stride-1 3x3x3, even W, exactly half-lane input channels.

    ==64 targets Conv3d_2c_3x3 (the measured 70 TF/s bwd-input, 7.3 ms);
    the <64 Mixed Branch_2 convs stay on autodiff — their packed backward
    would still be under-laned and they are far smaller."""
    return (
        tuple(kernel_shape) == (3, 3, 3)
        and tuple(stride) == (1, 1, 1)
        and len(x_shape) == 5
        and x_shape[3] % 2 == 0
        and x_shape[-1] == 64
    )
