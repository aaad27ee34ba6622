"""Space-to-depth stem transforms — generic kernel/input repacking.

A stride-2 conv with C_in=3 uses 3 of the MXU's 128 input lanes; packing 2x2
(spatial) or 2x2x2 (spatiotemporal) pixel blocks into channels makes the same
convolution run with 12/24 input channels at stride 1 — identical math, the
kernel taps split by parity.  Used by the I3D stem (models/i3d.py
PackedStemUnit3D) and the video-ResNet stems (models/video_resnet.py).

`pack_kernel_axis` handles both padding conventions on the attack path:
  * SAME with k=7, s=2, even extent -> pad (2, 3)   (TF/I3D stem)
  * torch symmetric padding=3       -> pad (3, 3)   (video-ResNet stems)
For a packed axis, an output index i reads original positions 2i + j - pad_lo
(j in [0, K)); with cell u = floor(pos/2) and parity pos%2, tap j lands in
cell offset floor((j - pad_lo)/2) with parity (j - pad_lo) % 2 — so the
packed kernel has ceil((K + pad_lo%2)/2) taps and the packed conv pads
(ceil(pad_lo/2), ...) computed here exactly.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_input(x: jax.Array, axes: Sequence[int]) -> jax.Array:
    """Pack factor-2 blocks of the given spatial axes into channels.

    x: [..., C] with even extents on `axes`; channel order is
    (parity_axis0, parity_axis1, ..., C), matching pack_kernel.
    """
    for ax in axes:
        if x.shape[ax] % 2 != 0:
            raise ValueError(f"axis {ax} extent {x.shape[ax]} is odd")
    out = x
    # split each packed axis into (half, parity), one at a time
    for idx, ax in enumerate(sorted(axes)):
        ax_eff = ax + idx  # prior splits inserted one axis before each parity
        s = list(out.shape)
        s[ax_eff : ax_eff + 1] = [s[ax_eff] // 2, 2]
        out = out.reshape(s)
    # now parity axes sit right after their halves; move them to just
    # before the channel axis, in axis order
    nd = out.ndim
    parity_axes = [ax + 1 + i for i, ax in enumerate(sorted(axes))]
    others = [i for i in range(nd - 1) if i not in parity_axes]
    out = out.transpose(others + parity_axes + [nd - 1])
    new_shape = [out.shape[i] for i in range(len(others))] + [
        (2 ** len(axes)) * out.shape[-1]
    ]
    return out.reshape(new_shape)


def pack_kernel_axis(
    kernel: jax.Array, axis: int, pad_lo: int
) -> Tuple[jax.Array, Tuple[int, int]]:
    """Split one kernel tap axis by parity given the original pad_lo.

    Returns (packed kernel with the parity dim appended at position -2 — the
    caller folds parities into C_in — here we fold immediately into a new
    axis just before the input-channel axis) and the packed (pad_lo, pad_hi).
    """
    k = kernel.shape[axis]
    shift = pad_lo % 2
    padded_len = k + shift
    if padded_len % 2 == 1:
        padded_len += 1
    pad_cfg = [(0, 0)] * kernel.ndim
    pad_cfg[axis] = (shift, padded_len - k - shift)
    kp = jnp.pad(kernel, pad_cfg)
    # reshape axis -> (taps, parity)
    s = list(kp.shape)
    s[axis : axis + 1] = [padded_len // 2, 2]
    kp = kp.reshape(s)

    # packed conv padding: output i reads cells i + m - ceil(pad_lo/2)
    lo = (pad_lo + 1) // 2
    n_taps = padded_len // 2
    # output index i reads cells i - lo .. i - lo + n_taps - 1
    hi = n_taps - 1 - lo
    return kp, (lo, hi)


def pack_conv_spatial(
    kernel: jax.Array, pad_lo_h: int, pad_lo_w: int
) -> Tuple[jax.Array, Tuple[int, int], Tuple[int, int]]:
    """Pack a [kT, kH, kW, Cin, Cout] kernel on H and W only.

    Returns kernel [kT, kH', kW', 4*Cin, Cout] + packed pads for H and W.
    Channel order (parity_h, parity_w, C) — matches pack_input(x, axes=(2,3))
    for NDHWC inputs.
    """
    kp, pad_h = pack_kernel_axis(kernel, 1, pad_lo_h)  # -> [kT,kH',2,kW,Cin,Cout]
    kp, pad_w = pack_kernel_axis(kp, 3, pad_lo_w)  # -> [kT,kH',2,kW',2,Cin,Cout]
    kt, kh, ph, kw, pw, cin, cout = kp.shape
    kp = kp.transpose(0, 1, 3, 2, 4, 5, 6)  # [kT,kH',kW',2,2,Cin,Cout]
    kp = kp.reshape(kt, kh, kw, ph * pw * cin, cout)
    return kp, pad_h, pad_w


def _spread_matrix_s2(k: int, pad_lo: int):
    """Per-axis spread map for a stride-2 conv on factor-4 packed input with
    factor-2 packed output sub-positions.

    Original: out[o] = sum_j x[2o + j - pad_lo] * K[j].  Packed: input cell
    u holds x[4u + q] (q in 0..3), output cell U holds outputs o = 2U + s
    (s in 0, 1).  Then 2(2U+s) + j - pad_lo = 4(U+m) + q with
    m = floor((2s + j - pad_lo)/4), q = (2s + j - pad_lo) mod 4.

    Returns (A [k, 2, n_taps, 4] 0/1 spread matrix, (pl, ph) packed pads).
    """
    mlo = (0 - pad_lo) // 4  # floor division (most negative r at j=0, s=0)
    mhi = (2 + k - 1 - pad_lo) // 4
    n = mhi - mlo + 1
    A = np.zeros((k, 2, n, 4), dtype=np.float32)
    for j in range(k):
        for s in range(2):
            r = 2 * s + j - pad_lo
            A[j, s, (r // 4) - mlo, r % 4] = 1.0
    return A, (-mlo, n - 1 - (-mlo))


def pack_conv_spatial_s2(
    kernel: jax.Array, pad_lo_h: int, pad_lo_w: int
) -> Tuple[jax.Array, Tuple[int, int], Tuple[int, int]]:
    """Pack a stride-(2,2) [kT, kH, kW, Cin, Cout] kernel for factor-4
    spatial input packing with factor-2 output sub-position packing.

    Returns kernel [kT, nH, nW, 16*Cin, 4*Cout] + packed pads.  Input
    channel order (q_h, q_w, Cin) — matches pack_input_factors((1, 4, 4));
    output channel order (s_h, s_w, Cout) — matches depth_to_space_hw(2).
    The resulting conv runs stride (1, 1) over H/4 x W/4 cells."""
    kt, kh, kw, cin, cout = kernel.shape
    Ah, pad_h = _spread_matrix_s2(kh, pad_lo_h)
    Aw, pad_w = _spread_matrix_s2(kw, pad_lo_w)
    kp = jnp.einsum(
        "jsmq,JSMQ,tjJio->tmMqQiSso",
        jnp.asarray(Ah, kernel.dtype),
        jnp.asarray(Aw, kernel.dtype),
        kernel,
    )
    # dims: t, mh, mw, qh, qw, ci, sw, sh, co -> fix output order to
    # (s_h, s_w, co) and fold
    kp = kp.transpose(0, 1, 2, 3, 4, 5, 7, 6, 8)
    nh, nw = Ah.shape[2], Aw.shape[2]
    return (
        kp.reshape(kt, nh, nw, 16 * cin, 4 * cout),
        pad_h,
        pad_w,
    )


def pack_input_factors(x: jax.Array, factors: Sequence[int]) -> jax.Array:
    """Pack (T, H, W) blocks of the given per-axis factors into channels.

    x: [B, T, H, W, C] -> [B, T/ft, H/fh, W/fw, ft*fh*fw*C], channel order
    (parity_t, parity_h, parity_w, C).
    """
    b, t, h, w, c = x.shape
    ft, fh, fw = factors
    x = x.reshape(b, t // ft, ft, h // fh, fh, w // fw, fw, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, t // ft, h // fh, w // fw, ft * fh * fw * c)


def _deep_stem_index_maps():
    """Static scatter maps for the deep-packed I3D stem kernel.

    Original: [7,7,7,Cin,Cout], stride (2,2,2), SAME pads (2,*) per axis at
    even extents (input position = 2*out + j - 2).
    Deep packing: T by 2 (as pack_kernel_axis: tap mt=jt//2, parity pt=jt%2,
    4 taps, packed pads (1,2)); H and W by 4 with output sub-position
    s in {0,1} per axis: position p = 2(2u+s) + j - 2 = 4u + (2s + j - 2),
    so cell offset m = floor((2s+j-2)/4) in {-1,0,1} (3 taps, pads (1,1))
    and in-cell parity q = (2s+j-2) mod 4.

    Returns integer arrays (dst_tap, dst_par, dst_sub, src_tap) flattened
    over all (jt, jh, jw, sh, sw) combinations, for one vectorized .at[].set:
      dst_tap: (mt*3 + (mh+1))*3 + (mw+1)        in [0, 4*3*3)
      dst_par: (pt*4 + qh)*4 + qw                in [0, 32)
      dst_sub: sh*2 + sw                         in [0, 4)
      src_tap: (jt*7 + jh)*7 + jw                in [0, 343)
    """
    import numpy as np

    dst_tap, dst_par, dst_sub, src_tap = [], [], [], []
    for jt in range(7):
        mt, pt = jt // 2, jt % 2
        for jh in range(7):
            for jw in range(7):
                for sh in range(2):
                    vh = 2 * sh + jh - 2
                    mh, qh = vh // 4, vh % 4
                    for sw in range(2):
                        vw = 2 * sw + jw - 2
                        mw, qw = vw // 4, vw % 4
                        dst_tap.append((mt * 3 + (mh + 1)) * 3 + (mw + 1))
                        dst_par.append((pt * 4 + qh) * 4 + qw)
                        dst_sub.append(sh * 2 + sw)
                        src_tap.append((jt * 7 + jh) * 7 + jw)
    return (
        np.asarray(dst_tap),
        np.asarray(dst_par),
        np.asarray(dst_sub),
        np.asarray(src_tap),
    )


_DEEP_MAPS = None


def pack_stem_kernel_deep(kernel: jax.Array) -> jax.Array:
    """[7,7,7,Cin,Cout] -> [4,3,3, 32*Cin, 4*Cout] for the deep-packed stem.

    Input channel order (pt,qh,qw,Cin) matches pack_input_factors(x,(2,4,4));
    output channel order (sh,sw,Cout) is unpacked by depth_to_space_hw.
    Packed conv pads: T (1,2), H (1,1), W (1,1), stride 1.
    """
    global _DEEP_MAPS
    if _DEEP_MAPS is None:
        _DEEP_MAPS = _deep_stem_index_maps()
    dst_tap, dst_par, dst_sub, src_tap = _DEEP_MAPS
    kt, kh, kw, cin, cout = kernel.shape
    assert (kt, kh, kw) == (7, 7, 7), (kt, kh, kw)
    k_flat = kernel.reshape(343, cin, cout)
    deep = jnp.zeros((4 * 3 * 3, 32, cin, 4, cout), kernel.dtype)
    deep = deep.at[dst_tap, dst_par, :, dst_sub, :].set(k_flat[src_tap])
    deep = deep.reshape(4, 3, 3, 32 * cin, 4 * cout)
    return deep


def depth_to_space_hw(y: jax.Array, factor: int = 2) -> jax.Array:
    """[B,T,Hc,Wc,f*f*C] -> [B,T,f*Hc,f*Wc,C], sub-position order (sh,sw,C)."""
    b, t, hc, wc, fc = y.shape
    c = fc // (factor * factor)
    y = y.reshape(b, t, hc, wc, factor, factor, c)
    y = y.transpose(0, 1, 2, 4, 3, 5, 6)
    return y.reshape(b, t, hc * factor, wc * factor, c)


def _stem_bwd_axis_maps():
    """Static maps for the packed transposed-conv stem backward.

    Forward (per temporal tap): y[u] = sum_a k[a] xp[u + a - 1] (pads (1,2));
    backward: dxp[v] = sum_a k[a]^T g[v + 1 - a].  Packing both v = 2c+s and
    the gradient positions 2d+q gives cell taps n = d - c = (s+1-a-q)/2 in
    {-1,0,1} whenever s+1-a-q is even — a 3-tap conv with input channels
    (q, C_out) and output channels (s, C_in), both MXU-wide.
    Returns (n+1, q, s, a) index arrays over the valid combinations.
    """
    import numpy as np

    ns, qs, ss, aa = [], [], [], []
    for a in range(4):
        for s in range(2):
            for q in range(2):
                num = s + 1 - a - q
                if num % 2 == 0:
                    ns.append(num // 2 + 1)
                    qs.append(q)
                    ss.append(s)
                    aa.append(a)
    return np.asarray(ns), np.asarray(qs), np.asarray(ss), np.asarray(aa)


def build_stem_bwd_kernel(pk_tap: jax.Array) -> jax.Array:
    """Transposed-conv kernel for one temporal tap of the packed stem.

    pk_tap: [4, 4, Cin, Cout] (one T-tap of the packed forward kernel)
    -> [3, 3, 4*Cout, 4*Cin] for a stride-1 pads-(1,1) conv over the
    2x2-packed upstream gradient, producing the 2x2-packed input gradient
    (unpack with depth_to_space_hw)."""
    nh, qh, sh, ah = _stem_bwd_axis_maps()
    _, _, cin, cout = pk_tap.shape
    kt = jnp.transpose(pk_tap, (0, 1, 3, 2))  # [4,4,Cout,Cin]
    # combine the two spatial axes' maps via outer product of valid entries
    n = len(nh)
    kb = jnp.zeros((3, 3, 2, 2, cout, 2, 2, cin), pk_tap.dtype)
    # dims: [n_h, n_w, q_h, q_w, Cout, s_h, s_w, Cin]
    idx_nh = jnp.asarray(np.repeat(nh, n))
    idx_nw = jnp.asarray(np.tile(nh, n))
    idx_qh = jnp.asarray(np.repeat(qh, n))
    idx_qw = jnp.asarray(np.tile(qh, n))
    idx_sh = jnp.asarray(np.repeat(sh, n))
    idx_sw = jnp.asarray(np.tile(sh, n))
    idx_ah = jnp.asarray(np.repeat(ah, n))
    idx_aw = jnp.asarray(np.tile(ah, n))
    kb = kb.at[idx_nh, idx_nw, idx_qh, idx_qw, :, idx_sh, idx_sw, :].set(
        kt[idx_ah, idx_aw]
    )
    return kb.reshape(3, 3, 4 * cout, 4 * cin)


def _stem_fwd_impl(xp: jax.Array, pk: jax.Array) -> jax.Array:
    """Temporally-unrolled packed stem conv: xp [B,T',H',W',Cin] with the
    4-tap packed kernel pk [4,4,4,Cin,Cout], pads T (1,2) / spatial (1,2)."""
    b, tt, hh, ww, c = xp.shape
    cout = pk.shape[-1]
    xpad = jnp.pad(xp, ((0, 0), (1, 2), (0, 0), (0, 0), (0, 0)))
    y = None
    for m in range(4):
        sl = xpad[:, m : m + tt].reshape(b * tt, hh, ww, c)
        ym = jax.lax.conv_general_dilated(
            sl,
            pk[m],
            window_strides=(1, 1),
            padding=[(1, 2), (1, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=xp.dtype,
        )
        y = ym if y is None else y + ym
    return y.reshape(b, tt, hh, ww, cout)


def _stem_fwd_3d(xp: jax.Array, pk: jax.Array) -> jax.Array:
    """The packed stem as ONE 3-D conv — a single pass over the input.

    The 4-tap temporal unroll (_stem_fwd_impl) reads xpad four times and
    materializes four partial outputs before the add fusion; the 3-D form
    reads xp once.  Kept behind a custom VJP (stem_conv_onepass) because
    XLA's 3-D *backward* lowering measured slower than the unrolled 2-D
    transposed convs (PERF.md round 1 v2) — fwd and bwd are chosen
    independently."""
    return jax.lax.conv_general_dilated(
        xp,
        pk,
        window_strides=(1, 1, 1),
        padding=[(1, 2), (1, 2), (1, 2)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=xp.dtype,
    )


@jax.custom_vjp
def stem_conv_onepass(xp: jax.Array, pk: jax.Array) -> jax.Array:
    """Packed stem: 3-D single-input-pass forward, unrolled-2-D backward.

    Kernel cotangent is ZERO (frozen victim; the attack differentiates wrt
    delta only) — do not reuse where weight gradients are needed."""
    return _stem_fwd_3d(xp, pk)


def _onepass_fwd(xp, pk):
    return _stem_fwd_3d(xp, pk), (xp, pk)


def _onepass_bwd(res, g):
    xp, pk = res
    # input gradient via the unrolled 2-D formulation's OWN autodiff — the
    # backward that measured fastest (PERF.md round 1 v2 / round 2 notes)
    _, pullback = jax.vjp(lambda x: _stem_fwd_impl(x, pk), xp)
    (dxp,) = pullback(g)
    return dxp, jnp.zeros_like(pk)


stem_conv_onepass.defvjp(_onepass_fwd, _onepass_bwd)


@jax.custom_vjp
def stem_conv_fused_bwd(xp: jax.Array, pk: jax.Array) -> jax.Array:
    """Packed stem: unrolled 2-D forward, ONE 3-D transposed-conv backward.

    XLA autodiff of the 4-tap unroll emits four 2-D transposed convs that
    each re-read the full upstream gradient (xplane round 3: fusion.824-827,
    4x411 MB, 5.9 ms/step at T=64 B=8); algebraically they are one stride-1
    3-D conv of g with the fully-flipped kernel:

        dx[v,r,s] = sum_{j,c,d} pk[3-j,3-c,3-d]^T g[v+j-2, r+c-2, s+d-2]

    i.e. conv3d(g, flip(pk)^T, pads (2,1) each axis) — one pass over g, no
    packing relayouts.  Kernel cotangent is ZERO (frozen victim)."""
    return _stem_fwd_impl(xp, pk)


def _fused_bwd_fwd(xp, pk):
    return _stem_fwd_impl(xp, pk), (xp.shape, pk)


def _fused_bwd_bwd(res, g):
    shape, pk = res
    g = g.astype(pk.dtype)
    kflip = jnp.flip(pk, axis=(0, 1, 2)).swapaxes(-1, -2)  # [4,4,4,Cout,Cin]
    dxp = jax.lax.conv_general_dilated(
        g,
        kflip,
        window_strides=(1, 1, 1),
        padding=[(2, 1), (2, 1), (2, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=pk.dtype,
    )
    return dxp, jnp.zeros_like(pk)


stem_conv_fused_bwd.defvjp(_fused_bwd_fwd, _fused_bwd_bwd)


@jax.custom_vjp
def stem_conv_catbwd(xp: jax.Array, pk: jax.Array) -> jax.Array:
    """Packed stem: unrolled 2-D forward, backward as ONE wide 2-D conv.

    XLA autodiff emits four transposed convs [B*T,H,W,Cout]->[...,Cin] with
    Cin=24 output channels (24/128 MXU lanes) that each re-read the full
    upstream gradient.  Concatenating the four spatially-flipped tap kernels
    along OUTPUT channels gives one conv g -> [B*T,H,W,4*Cin] (96/128 lanes,
    one read of g); the per-tap partials then combine by temporal shift+add,
    a pure elementwise chain that fuses into the consumer:

        dx[v] = sum_m  part[v + 1 - m, ..., m-th Cin block]

    Kernel cotangent is ZERO (frozen victim)."""
    return _stem_fwd_impl(xp, pk)


def _catbwd_fwd(xp, pk):
    return _stem_fwd_impl(xp, pk), (xp.shape, pk)


def catbwd_partials(g: jax.Array, pk: jax.Array) -> jax.Array:
    """The concat-kernel backward's per-tap partials: one wide 2-D conv of
    the (already dtype-matched) upstream gradient g [B,T',H',W',Cout] with
    all four spatially-flipped tap kernels concatenated on output channels
    -> [B,T',H',W',4*Cin].  dx[v] = sum_m part[v + 1 - m][tap m block]."""
    b, tt, hh, ww, cout = g.shape
    cin = pk.shape[-2]
    kflip = jnp.flip(pk, axis=(1, 2)).swapaxes(-1, -2)  # [4(m),4,4,Cout,Cin]
    kcat = jnp.concatenate([kflip[m] for m in range(4)], axis=-1)
    return jax.lax.conv_general_dilated(
        g.reshape(b * tt, hh, ww, cout),
        kcat,
        window_strides=(1, 1),
        padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pk.dtype,
    ).reshape(b, tt, hh, ww, 4 * cin)


def _catbwd_bwd(res, g):
    shape, pk = res
    b, tt, hh, ww, cin = shape
    g = g.astype(pk.dtype)
    part = catbwd_partials(g, pk)
    # temporal combine: dx[v] = sum_m part[v + 1 - m][tap m block]
    acc = None
    for m in range(4):
        blk = jax.lax.slice_in_dim(part, m * cin, (m + 1) * cin, 1, axis=4)
        shift = 1 - m  # source index v + 1 - m
        if shift >= 0:
            sl = jax.lax.slice_in_dim(blk, shift, tt, 1, axis=1)
            sl = jnp.pad(sl, ((0, 0), (0, shift), (0, 0), (0, 0), (0, 0)))
        else:
            sl = jax.lax.slice_in_dim(blk, 0, tt + shift, 1, axis=1)
            sl = jnp.pad(sl, ((0, 0), (-shift, 0), (0, 0), (0, 0), (0, 0)))
        acc = sl if acc is None else acc + sl
    return acc, jnp.zeros_like(pk)


stem_conv_catbwd.defvjp(_catbwd_fwd, _catbwd_bwd)


def _stem_bn_relu_math(xp, pk, mean, var, bias, eps):
    """Unrolled stem conv + inference BN (no scale) + relu.  Value-identical
    to nn.BatchNorm(dtype=compute): params promoted to the compute dtype,
    then (x - mean) * rsqrt(var + eps) + bias in that dtype."""
    y = _stem_fwd_impl(xp, pk)
    dt = y.dtype
    mean, var, bias = mean.astype(dt), var.astype(dt), bias.astype(dt)
    y = (y - mean) * jax.lax.rsqrt(var + jnp.asarray(eps, dt)) + bias
    return jax.nn.relu(y)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def stem_conv_bn_relu(xp, pk, mean, var, bias, eps=1e-3):
    """Stem conv + frozen-BN + relu as ONE custom-VJP op.

    Without it XLA keeps BOTH the pre-activation and the relu output of the
    stem alive for the backward (xplane round 3: the stem forward fusion
    writes two [256,112,112,64] tensors, 822 MB at 603 GiB/s — HBM-bound).
    Saving only the relu output y and recomputing the mask as y > 0 (exact:
    relu'(x) = [x > 0] = [y > 0] except at x == 0 where both give 0·g)
    halves the forward fusion's write traffic.  Backward = mask * rsqrt *
    concat-kernel conv (stem_conv_catbwd's backward).  BN/kernel cotangents
    are ZERO (frozen victim)."""
    return _stem_bn_relu_math(xp, pk, mean, var, bias, eps)


def _bn_relu_fwd(xp, pk, mean, var, bias, eps):
    y = _stem_bn_relu_math(xp, pk, mean, var, bias, eps)
    return y, (xp.shape, pk, var, y)


def _bn_relu_bwd(eps, res, g):
    shape, pk, var, y = res
    g = g.astype(pk.dtype)
    vdt = var.astype(pk.dtype)
    g2 = g * (y > 0) * jax.lax.rsqrt(vdt + jnp.asarray(eps, pk.dtype))
    dxp, _ = _catbwd_bwd((shape, pk), g2)
    zeros_f32 = jnp.zeros_like(var)
    return dxp, jnp.zeros_like(pk), zeros_f32, zeros_f32, zeros_f32


stem_conv_bn_relu.defvjp(_bn_relu_fwd, _bn_relu_bwd)


@jax.custom_vjp
def packed_stem_conv(xp: jax.Array, pk: jax.Array) -> jax.Array:
    """Packed stem conv with a hand-packed transposed-conv backward.

    The autodiff backward emits transposed convs whose OUTPUT has only Cin=24
    channels (3/16 of the MXU lanes); the custom rule computes the input
    gradient as a 2x2-output-packed conv with 4*Cout input and 4*Cin output
    channels instead (~full lanes), then depth-to-space unpacks it.

    NOTE: the kernel cotangent is ZERO — the victim is frozen by design
    (the attack differentiates wrt delta only); do not reuse this op where
    weight gradients are needed.
    """
    return _stem_fwd_impl(xp, pk)


def _packed_stem_fwd(xp, pk):
    return _stem_fwd_impl(xp, pk), (xp.shape, pk)


def _packed_stem_bwd(res, g):
    shape, pk = res
    b, tt, hh, ww, cin = shape
    cout = pk.shape[-1]
    g = g.astype(pk.dtype)
    gp = pack_input(g, axes=(2, 3))  # [B, T', H'/2, W'/2, 4*Cout]
    if os.environ.get("FLICKER_STEM_BWD3D", "") == "1":
        # All 4 temporal taps as ONE stride-1 3-D conv: the unrolled loop
        # re-reads overlapping slices of the same gradient 4x (xplane:
        # fusion.824-827, 4x411 MB reads, 5.9 ms); the 3-D form reads gp
        # once.  Tap m reads gp[u + 1 - m]; with temporal pad (2,1) the
        # conv's tap j reads gp[u - 2 + j], so k3d[j] = kb[3 - j].
        k3d = jnp.stack(
            [build_stem_bwd_kernel(pk[3 - j]) for j in range(4)], axis=0
        )  # [4, 3, 3, 4*Cout, 4*Cin]
        d = jax.lax.conv_general_dilated(
            gp,
            k3d,
            window_strides=(1, 1, 1),
            padding=[(2, 1), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=pk.dtype,
        )
        dxp = depth_to_space_hw(d, 2)
        return dxp, jnp.zeros_like(pk)
    gpad = jnp.pad(gp, ((0, 0), (2, 1), (0, 0), (0, 0), (0, 0)))
    acc = None
    for m in range(4):
        kb = build_stem_bwd_kernel(pk[m])  # [3,3,4*Cout,4*Cin]
        sl = gpad[:, 3 - m : 3 - m + tt].reshape(b * tt, hh // 2, ww // 2, 4 * cout)
        d = jax.lax.conv_general_dilated(
            sl,
            kb,
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pk.dtype,
        )
        acc = d if acc is None else acc + d
    dxp = depth_to_space_hw(acc.reshape(b, tt, hh // 2, ww // 2, 4 * cin), 2)
    return dxp, jnp.zeros_like(pk)


packed_stem_conv.defvjp(_packed_stem_fwd, _packed_stem_bwd)


def pack_conv_spatiotemporal(
    kernel: jax.Array, pad_lo: Tuple[int, int, int]
) -> Tuple[jax.Array, Tuple[Tuple[int, int], ...]]:
    """Pack a [kT, kH, kW, Cin, Cout] kernel on T, H and W.

    Returns kernel [kT', kH', kW', 8*Cin, Cout] + packed pads per axis.
    Channel order (parity_t, parity_h, parity_w, C) — matches
    pack_input(x, axes=(1,2,3)).
    """
    kp, pad_t = pack_kernel_axis(kernel, 0, pad_lo[0])  # [kT',2,kH,kW,Ci,Co]
    kp, pad_h = pack_kernel_axis(kp, 2, pad_lo[1])  # [kT',2,kH',2,kW,Ci,Co]
    kp, pad_w = pack_kernel_axis(kp, 4, pad_lo[2])  # [kT',2,kH',2,kW',2,Ci,Co]
    kt, pt, kh, ph, kw, pw, cin, cout = kp.shape
    kp = kp.transpose(0, 2, 4, 1, 3, 5, 6, 7)
    kp = kp.reshape(kt, kh, kw, pt * ph * pw * cin, cout)
    return kp, (pad_t, pad_h, pad_w)
