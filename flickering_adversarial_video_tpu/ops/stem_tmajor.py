"""T-major batch-in-lanes layout for the packed I3D stem region.

The worked-out round-3 lever (ROADMAP #3 / PERF.md post-campaign SoL table):
after the Pallas pool campaign the largest recoverable block in the 74 ms
headline step is the stem-tap layout chain (~2.5 ms) — `pad_slice_fusion.2`
(1.58 ms) plus three 0.44 ms copies that convert the packed-apply output's
four temporal tap slices into the tap convs' preferred batch-in-lanes
operand layout ([256,112,112,24]{0,3,2,1}, emitter `EmitInputBatchInLanes`,
physical order H,W,C,BT).  The taps are slices of a b-major (b*T'+t) fold,
so each is a strided gather in the lane dim — hence the copies.

This module expresses the whole stem region in that physical order as the
LOGICAL shape, with the (T', B) lane merge in **T-major (t*B+b) order**:

  * the adv tensor becomes one [H', W', Cin, T'*B] array whose default
    layout IS the conv emitter's preferred physical order — XLA's layout
    assignment has nothing to relayout;
  * the temporal SAME pad (1, 2) becomes a lane pad of (B, 2B) zeros;
  * the four temporal tap slices become CONTIGUOUS lane windows
    [m*B, (m+T')*B) of one padded tensor (b-major order makes them strided
    — unusable as conv operands without a copy);
  * the tap convs run with explicit ("HWCN", "HWIO", "HWCN") dimension
    numbers — identical contraction, batch on the minor dim;
  * the stride-2 MaxPool2a consumes the stem output [H, W, C, T'B] view
    DIRECTLY (the Pallas producer-layout kernel of ops/pallas_pool.py
    already computes in exactly this orientation; only its (un)view
    transposes disappear), and its select-and-scatter backward binds on the
    same view (FLICKER_POOL_2A_BWD_VIEW semantics, now with zero transposes).

The only layout frontier left is pool2a's OUTPUT -> Conv3d_2b_1x1 input
([56,56,64,T'B] -> [B,T',56,56,64]), 4x smaller than the stem-input
frontier the old chain paid.

Backward: the concat-kernel stem backward (ops/space_to_depth.py
stem_conv_catbwd derivation) ported to the view — ONE wide conv of the
(masked, rsqrt-scaled) upstream gradient with all four spatially-flipped
tap kernels concatenated on output channels, then a temporal shift+add
that is a pure LANE-shift elementwise chain (shift by (1-m)*B).  BN/kernel
cotangents are ZERO (frozen victim).

Exactness: tests/test_stem_tmajor.py — values vs stem_conv_bn_relu +
max_pool_same, gradients vs autodiff of the unfused reference, engineered
pool ties, full-model logits parity, engine trajectory parity, 8-device
mesh parity.  Gated FLICKER_STEM_TMAJOR (models/i3d.py).

Measured (chip A/B 2026-08-19, T=64 B=8 headline, each end to end):
12.87 -> 13.92 steps/s (+8.1%, vs_baseline 7.0 -> 7.57), HBM bytes/step
45.27 -> 43.01 GB, MFU 25.9 -> 28.0% — the win exceeds the 2.5 ms tap-chain
estimate because the pool2a view transposes vanish with it.  DEFAULT ON for
single-device processes with 128-aligned B*T' lanes (the t*B+b merge shards
badly under a data mesh: B is minor in the merged dim, so GSPMD would
insert gathers; multi-device keeps the b-major path unless forced).

Same-day extensions (PERF.md): the residual mask barrier, the 2b/2c/3a
units (conv_bn_relu_tmajor), and FLICKER_TMAJOR_DEPTH — Mixed blocks
(TmajorInceptionMixed) and the strided pools 4a/5a on the view, so at the
default depth "5c" the WHOLE network runs batch-in-lanes and the only
remaining b-major frontier is the [7,7,1024,T''B] tensor entering the
logits head.  Chip ms/step by depth: 3a 67.15, 4a 63.75, 5a 60.53,
5c 60.42 = 16.35 steps/s = 8.9x.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def to_tmajor_view(x: jax.Array) -> jax.Array:
    """[B, T, H, W, C] -> [H, W, C, T*B] with lanes in t*B+b order."""
    b, t, h, w, c = x.shape
    return jnp.transpose(x, (2, 3, 4, 1, 0)).reshape(h, w, c, t * b)


def from_tmajor_view(xv: jax.Array, b: int) -> jax.Array:
    """[H, W, C, T*B] (t*B+b lane order) -> [B, T, H, W, C]."""
    h, w, c, tb = xv.shape
    return jnp.transpose(xv.reshape(h, w, c, tb // b, b), (4, 3, 0, 1, 2))


def _tap_conv(xm: jax.Array, k: jax.Array, pads) -> jax.Array:
    """One spatial tap conv on the view: xm [H, W, Cin, N], k [kh, kw, Cin,
    Cout] -> [H, W, Cout, N].  Batch rides the minor (lane) dim."""
    return lax.conv_general_dilated(
        xm,
        k,
        window_strides=(1, 1),
        padding=pads,
        dimension_numbers=("HWCN", "HWIO", "HWCN"),
        preferred_element_type=xm.dtype,
    )


def _stem_fwd_view(xv: jax.Array, pk: jax.Array, b: int) -> jax.Array:
    """Temporally-unrolled packed stem conv on the T-major view.

    xv: [H', W', Cin, T'*B]; pk: [4, 4, 4, Cin, Cout] (packed kernel,
    pads T (1,2) / spatial (1,2)).  Tap m reads lane window
    [m*B, (m+T')*B) of the (B, 2B) zero-padded lane extent — four
    contiguous windows of ONE tensor (the whole point of T-major order).
    """
    import os

    h, w, c, tb = xv.shape
    if os.environ.get("FLICKER_STEM_CATFWD", "0") == "1":
        # Concat-kernel FORWARD (mirror of _catbwd_lane_combine): one conv
        # with all four tap kernels on output channels (4*64 = 256 = full
        # MXU fill vs the 50% of the per-tap convs), then the temporal
        # combine as lane shifts: y[v] = sum_m P_m[v + (m-1)*B].
        # Trades a [H,W,4*Cout,T'B] intermediate for the MXU fill — A/B'd
        # on the chip (see PERF.md round 4).
        kcat = jnp.concatenate([pk[m] for m in range(4)], axis=-1)
        part = _tap_conv(xv, kcat, [(1, 2), (1, 2)])
        cout = pk.shape[-1]
        y = None
        for m in range(4):
            blk = lax.slice_in_dim(part, m * cout, (m + 1) * cout, axis=2)
            sl = _lane_shift(blk, (m - 1) * b, 0)
            y = sl if y is None else y + sl
        return y
    xpad = jnp.pad(xv, ((0, 0), (0, 0), (0, 0), (b, 2 * b)))
    y = None
    for m in range(4):
        xm = lax.slice_in_dim(xpad, m * b, m * b + tb, axis=3)
        ym = _tap_conv(xm, pk[m], [(1, 2), (1, 2)])
        y = ym if y is None else y + ym
    return y


def _bn_relu_view(y, mean, var, bias, eps):
    """Inference BN (no scale) + relu on the view — channel is dim 2.
    Value-identical promotion order to nn.BatchNorm(dtype=compute)."""
    dt = y.dtype
    mean = mean.astype(dt)[:, None]
    var = var.astype(dt)[:, None]
    bias = bias.astype(dt)[:, None]
    y = (y - mean) * lax.rsqrt(var + jnp.asarray(eps, dt)) + bias
    return jax.nn.relu(y)


def stem_conv_bn_relu_view(xv, pk, mean, var, bias, b, eps=1e-3):
    """The stem forward on the view: packed tap convs + temporal combine +
    BN + relu, dispatched to the Pallas im2col kernel
    (ops/stem_conv_pallas.py, FLICKER_STEM_PALLAS, TPU-only) or the XLA
    tap-conv composition."""
    from .stem_conv_pallas import (
        eligible as _sp_ok,
        gate_on as _sp_on,
        stem_conv_bn_relu_view_pallas,
    )

    if (
        _sp_on()
        and jax.default_backend() == "tpu"
        and _sp_ok(xv.shape, pk.shape, b)
    ):
        return stem_conv_bn_relu_view_pallas(xv, pk, mean, var, bias, b, eps)
    return _bn_relu_view(_stem_fwd_view(xv, pk, b), mean, var, bias, eps)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def stem_bn_relu_tmajor(xv, pk, mean, var, bias, b, eps=1e-3):
    """Packed stem conv + frozen-BN + relu on the T-major view, as ONE
    custom-VJP op: saves only the relu output y (mask recomputed as y > 0,
    exact — see ops/space_to_depth.stem_conv_bn_relu) and runs the
    concat-kernel backward entirely in the view.

    xv: [H', W', Cin, T'*B] (t*B+b lanes); returns [H', W', Cout, T'*B].
    BN/kernel cotangents are ZERO (frozen victim)."""
    return stem_conv_bn_relu_view(xv, pk, mean, var, bias, b, eps)


def _res_y(y):
    """The saved relu output, pinned behind an optimization barrier.

    Without the barrier XLA's algebraic simplifier rewrites the backward's
    mask `y > 0` into `pre > 0` (valid for y = max(pre, 0)) — which forces
    the conv+BN+relu fusion to materialize the PRE-activation as a second
    full-tensor output next to y (the depth-5c xplane's dual-output
    broadcast_maximum_fusions: +206 MB write at the stem alone).  The
    barrier pins the residual to the tensor the VJP declared; it aliases y,
    so the forward emits one output and the backward reads it back.
    Same fix as the head's FLICKER_TMAJOR_MASK_BARRIER (PERF.md round 3);
    FLICKER_CBR_Y_BARRIER=0 restores the round-3 behavior for A/B."""
    import os

    if os.environ.get("FLICKER_CBR_Y_BARRIER", "1") == "1":
        return lax.optimization_barrier(y)
    return y


def _tmajor_fwd(xv, pk, mean, var, bias, b, eps):
    y = stem_conv_bn_relu_view(xv, pk, mean, var, bias, b, eps)
    return y, (pk, var, _res_y(y))


def _catbwd_lane_combine(g2, kt, b, t_plo, sp_bwd):
    """dx of the tap-unrolled view conv: ONE wide conv of the (masked,
    rsqrt-scaled) upstream gradient with ALL spatially-flipped tap kernels
    concatenated on output channels (single read of g — the stem_conv_catbwd
    derivation on the view), then the temporal combine
    dx[v] = sum_m part[v + t_plo - m][tap m block], which in T-major lanes
    is a pure LANE-shift by (t_plo - m)*B — a pad/slice/add chain XLA fuses
    into one pass over `part`.

    g2: [H, W, Cout, T'B]; kt: [KT, kh, kw, Cin, Cout]; sp_bwd: transposed
    spatial pads ((kh-1-pl, kh-1-ph), ...)."""
    n_taps, _, _, cin, _ = kt.shape
    part = _catbwd_part(g2, kt, sp_bwd)
    from .stem_combine_pallas import catbwd_lane_combine_pallas
    from .stem_combine_pallas import eligible as _cc_ok
    from .stem_combine_pallas import gate_on as _cc_on

    if (
        _cc_on()
        and jax.default_backend() == "tpu"
        and _cc_ok(part.shape, cin, b)
    ):
        # one-pass Pallas combine (reads part once; the XLA pad/slice/add
        # chain re-traverses it across 3 fusions — PERF.md round 5)
        return catbwd_lane_combine_pallas(part, b, cin, t_plo)
    tb = part.shape[3]
    acc = None
    for m in range(n_taps):
        blk = lax.slice_in_dim(part, m * cin, (m + 1) * cin, axis=2)
        sl = _lane_shift(blk, (t_plo - m) * b, 0)
        acc = sl if acc is None else acc + sl
    return acc


def _catbwd_part(g2, kt, sp_bwd):
    """The wide conv of _catbwd_lane_combine WITHOUT the temporal combine:
    returns part [H, W, KT*Cin, T'B] (tap m's input-gradient block in
    channels [m*Cin, (m+1)*Cin), still at unshifted lanes)."""
    n_taps = kt.shape[0]
    kflip = jnp.flip(kt, axis=(1, 2)).swapaxes(-1, -2)  # [KT,kh,kw,Cout,Cin]
    kcat = jnp.concatenate([kflip[m] for m in range(n_taps)], axis=-1)
    return _tap_conv(g2, kcat, sp_bwd)


def _tmajor_bwd(b, eps, res, g):
    pk, var, y = res
    g = g.astype(pk.dtype)
    vdt = var.astype(pk.dtype)[:, None]
    g2 = g * (y > 0) * lax.rsqrt(vdt + jnp.asarray(eps, pk.dtype))
    # packed stem: 4 taps, temporal pad (1,2), spatial fwd pads (1,2)
    acc = _catbwd_lane_combine(g2, pk, b, 1, [(2, 1), (2, 1)])
    zeros_bn = jnp.zeros_like(var)
    return acc, jnp.zeros_like(pk), zeros_bn, zeros_bn, zeros_bn


stem_bn_relu_tmajor.defvjp(_tmajor_fwd, _tmajor_bwd)


# --------- generic odd-kernel stride-1 SAME Unit3D on the view ------------
#
# Extends the T-major region past pool2a (ROADMAP: the pool2a-output ->
# Conv3d_2b frontier): Conv3d_2b_1x1 (KT=1 — a plain 1x1 view conv) and
# Conv3d_2c_3x3 (KT=3 — three lane-window taps, temporal SAME (1,1) = lane
# pad (B,B)) run directly on the [H, W, C, T'B] view, and MaxPool3d_3a_3x3
# is spatial-only ((1,3,3)/(1,2,2)) so strided_pool_view pools the view in
# place.  The b-major<->view frontier then moves from pool2a's output
# ([56,56,64,TB]) to pool3a's ([28,28,192,TB]) — 4/3x fewer boundary bytes —
# and the pool3a backward select-and-scatter binds in the view orientation
# (its b-major form ran at 354 GiB/s vs the view pool2a's 589, xplane
# 2026-08-19).


def _conv_fwd_view(xv: jax.Array, kt: jax.Array, b: int) -> jax.Array:
    """Odd-kernel stride-1 SAME conv on the view via temporal lane taps.

    xv: [H, W, Cin, T'B] (t*B+b lanes); kt: [KT, kh, kw, Cin, Cout].
    Temporal SAME pad ((KT-1)//2, KT//2) becomes a lane pad; tap m reads the
    contiguous lane window [m*B, m*B + T'B)."""
    n_taps, kh, kw = kt.shape[0], kt.shape[1], kt.shape[2]
    sp = [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)]
    tb = xv.shape[3]
    plo, phi = (n_taps - 1) // 2, n_taps // 2
    xpad = (
        jnp.pad(xv, ((0, 0), (0, 0), (0, 0), (plo * b, phi * b)))
        if n_taps > 1
        else xv
    )
    y = None
    for m in range(n_taps):
        xm = (
            lax.slice_in_dim(xpad, m * b, m * b + tb, axis=3)
            if n_taps > 1
            else xpad
        )
        ym = _tap_conv(xm, kt[m], sp)
        y = ym if y is None else y + ym
    return y


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def conv_bn_relu_tmajor(xv, kt, mean, var, bias, b, eps=1e-3):
    """Unit3D (conv + frozen-BN + relu, stride 1, SAME, odd kernel) on the
    T-major view as ONE custom-VJP op: saves only the relu output y (mask
    recomputed as y > 0, exact) and runs the concat-kernel backward entirely
    in the view.  Math identical to nn.Conv(SAME) + BN + relu up to the
    temporal tap-sum reassociation (the b-major path contracts all KT taps
    in one conv; this sums KT partial convs).

    xv: [H, W, Cin, T'B]; kt: [KT, kh, kw, Cin, Cout]; returns
    [H, W, Cout, T'B].  Kernel/BN cotangents are ZERO (frozen victim)."""
    return _bn_relu_view(_conv_fwd_view(xv, kt, b), mean, var, bias, eps)


def _cbr_fwd(xv, kt, mean, var, bias, b, eps):
    y = _bn_relu_view(_conv_fwd_view(xv, kt, b), mean, var, bias, eps)
    return y, (kt, var, _res_y(y))


def _cbr_bwd(b, eps, res, g):
    kt, var, y = res
    n_taps, kh, kw = kt.shape[0], kt.shape[1], kt.shape[2]
    g = g.astype(kt.dtype)
    vdt = var.astype(kt.dtype)[:, None]
    g2 = g * (y > 0) * lax.rsqrt(vdt + jnp.asarray(eps, kt.dtype))
    sp_bwd = [
        (kh - 1 - (kh - 1) // 2, kh - 1 - kh // 2),
        (kw - 1 - (kw - 1) // 2, kw - 1 - kw // 2),
    ]
    acc = _catbwd_lane_combine(g2, kt, b, (n_taps - 1) // 2, sp_bwd)
    zeros_bn = jnp.zeros_like(var)
    return acc, jnp.zeros_like(kt), zeros_bn, zeros_bn, zeros_bn


conv_bn_relu_tmajor.defvjp(_cbr_fwd, _cbr_bwd)


# ---------------- Pallas one-pass advT + clip-mask emitter -----------------
#
# The fused head's preprocess chain (xplane depth-5c, 2026-08-19) is XLA's
# 3-stage transpose emit: fusion.12 (u8+delta -> bf16 advT in a SPLIT
# [H,W,C,T',B] W-minor layout, 0.41 ms) + copy_bitcast_fusion (merge,
# 0.57 ms) + copy.263 (relayout to the conv-ready {3,2,1,0}, 0.51 ms), plus
# the u8 mask's own transpose (fusion.49, 0.59 ms) and merge — ~2.3 ms for
# a job whose byte floor (read 77 MB u8, write 147 MB bf16 + 77 MB u8) is
# ~0.37 ms.  This kernel does it in ONE pass: grid over H, each step reads
# the u8 slab [B,T',1,W,C], transposes in VMEM to the view, applies
# normalize+delta+clip, and writes the bf16 advT block AND the u8 2x-mask
# block directly in the consumer's layout.


def _emit_tmajor_kernel(u8_ref, dl_ref, adv_ref, mask_ref, *, lo, hi, out_dtype):
    x = u8_ref[:, :, 0]  # [B, T', W, C]
    b, t, w, c = x.shape
    xt = jnp.transpose(x, (2, 3, 1, 0)).reshape(w, c, t * b)
    # Mosaic has no direct u8 -> f32 cast; widen to i32 first
    pre = xt.astype(jnp.int32).astype(jnp.float32) / 128.0 - 1.0
    pre = pre + dl_ref[...][None]
    adv_ref[0] = jnp.clip(pre, lo, hi).astype(out_dtype)
    two_mmax = jnp.where(pre > lo, 2, 0) + jnp.where(pre == lo, 1, 0)
    two_mmin = jnp.where(pre < hi, 2, 0) + jnp.where(pre == hi, 1, 0)
    mask_ref[0] = ((two_mmax * two_mmin) // 2).astype(jnp.uint8)


def emit_tmajor(packed_u8, dl, lo, hi, out_dtype, interpret=False):
    """(advT bf16 [H,W,C,T'B], 2x clip mask u8 [H,W,C,T'B]) from the
    host-prepacked u8 batch and dl = flag * pack_flicker_delta(delta) laid
    out per (channel, lane) — one pass, outputs born in the view layout."""
    from functools import partial as _part

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, h, w, c = packed_u8.shape
    kernel = _part(
        _emit_tmajor_kernel, lo=float(lo), hi=float(hi), out_dtype=out_dtype
    )
    return pl.pallas_call(
        kernel,
        grid=(h,),
        in_specs=[
            pl.BlockSpec(
                (b, t, 1, w, c), lambda i: (0, 0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((c, t * b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, w, c, t * b), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, w, c, t * b), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w, c, t * b), out_dtype),
            jax.ShapeDtypeStruct((h, w, c, t * b), jnp.uint8),
        ],
        interpret=interpret,
    )(packed_u8, dl)


# ------------- fused preprocess + T-major stem head (tanh world) -----------
#
# xplane of the T-major step (2026-08-19, 70.3 ms): the d(delta) chain still
# pays ~3.4 ms — the combine materializes d(adv) in F32 (fusion.30, 1.36 ms,
# 308 MB), a relayout to the u8 operand's W-minor layout follows (copy.50,
# 1.07 ms) and the b-major masked reduce re-reads everything (fusion.8,
# 0.92 ms).  All of it exists only because the clip mask is recomputed from
# the B-MAJOR uint8 residual while the cotangent lives in the T-major view.
# This op fuses the preprocess INTO the stem and saves the clip-gradient
# mask IN THE VIEW during the forward (one extra u8 write, ~77 MB, fused
# into the existing transpose chain), so the backward reduces the masked
# cotangent straight to d(delta) — no f32 d(adv), no relayout, no u8 read.
#
# Mask semantics: jnp.clip is minimum(maximum(x, lo), hi) whose gradient at
# an EXACT boundary is 0.5 (tie-splitting max/min VJPs — verified against
# jax.grad).  The u8 residual stores 2*m in {0, 1, 2}; the backward
# multiplies by 0.5f.  Boundary hits are real: the clean u8 path produces
# exactly -1.0 at pixel value 0.
#
# Measured (chip A/B 2026-08-19, T=64 B=8 headline, warm-repeat-confirmed
# to 3 decimals): 13.905 -> 13.985 steps/s (+0.6%, vs_baseline 7.56 ->
# 7.61).  Far below the 3.4 ms xplane estimate: the saved-mask u8 write
# (+0.8 GB HBM/step, 43.01 -> 43.81) buys back most of the removed d(adv)
# materialization; the residual win is the dead relayout copy.  Kept
# DEFAULT ON (same eligibility gate as the stem): reproducibly positive,
# exact, and the in-op d(delta) reduction is the right structure for
# future XLA versions to fuse further.


def _clip_grad_mask2(pre: jax.Array, lo: float, hi: float) -> jax.Array:
    """2x the gradient of jnp.clip(pre, lo, hi) wrt pre, as uint8 {0,1,2}.

    jnp.clip = minimum(maximum(x, lo), hi); maximum/minimum VJPs give 0.5 at
    exact ties, 1/0 elsewhere — the product is m in {0, 0.5, 1} (0.25 needs
    x == lo AND max(x,lo) == hi, impossible for lo < hi)."""
    two_mmax = jnp.where(pre > lo, 2, 0) + jnp.where(pre == lo, 1, 0)
    two_mmin = jnp.where(pre < hi, 2, 0) + jnp.where(pre == hi, 1, 0)
    return ((two_mmax * two_mmin) // 2).astype(jnp.uint8)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def flicker_stem_tmajor(
    packed_u8: jax.Array,
    delta_applied: jax.Array,
    adv_flag: jax.Array,
    pk: jax.Array,
    bn_mean: jax.Array,
    bn_var: jax.Array,
    bn_bias: jax.Array,
    input_min: float,
    input_max: float,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """normalize+delta+clip AND the T-major stem conv+BN+relu as ONE
    custom-VJP op; returns [H', W', Cout, T', B] (a free reshape of the
    T-major view — the skip_stem_view model reads B from the last dim).

    packed_u8: [B, T', H', W', 8C] host-prepacked uint8 (tanh world);
    delta_applied: the already value-clipped/frame-masked [T, 1, 1, C]
    delta.  pk/BN cotangents are ZERO (frozen victim); d(delta) and
    d(adv_flag) reduce in the view against the saved clip mask — identical
    math to jax.vjp over the separate ops, up to f32 reduction
    reassociation."""
    y, _ = _head_fwd_impl(
        packed_u8, delta_applied, adv_flag, pk, bn_mean, bn_var, bn_bias,
        input_min, input_max, out_dtype,
    )
    return y


def _view_emit(u8v, dpk, adv_flag, t, b, input_min, input_max, out_dtype):
    """normalize+delta+clip on a view-layout u8 batch [H, W, 8C, T'B]:
    lane-broadcast the packed delta and emit (advT, 2x clip mask), both
    born in the view.  Bit-identical to the b-major order (same
    per-element op sequence)."""
    import os

    cin = u8v.shape[2]
    dl = dpk[:, 0, 0, :].T  # [8C, T']
    dlv = jnp.broadcast_to(dl[:, :, None], (cin, t, b)).reshape(cin, t * b)
    pre = u8v.astype(jnp.float32) / 128.0 - 1.0
    pre = pre + jnp.asarray(adv_flag, jnp.float32) * dlv[None, None]
    advT = jnp.clip(pre, input_min, input_max).astype(out_dtype)
    mask2T = _clip_grad_mask2(pre, input_min, input_max)
    if os.environ.get("FLICKER_TMAJOR_MASK_BARRIER", "1") == "1":
        mask2T = lax.optimization_barrier(mask2T)
    return advT, mask2T


def _head_fwd_impl(
    packed_u8, delta_applied, adv_flag, pk, bn_mean, bn_var, bn_bias,
    input_min, input_max, out_dtype,
):
    import os

    from .packed_apply import pack_flicker_delta

    b, t, h, w, cin = packed_u8.shape
    dpk = pack_flicker_delta(delta_applied)  # [T', 1, 1, 8C]
    # FLICKER_TMAJOR_EMIT=1: the Pallas one-pass emitter.  NEGATIVE RESULT
    # (2026-08-19): Mosaic's compiler CRASHES (tpu_compile_helper exit 1, no
    # diagnostic) lowering the in-kernel [B,T',W,C] -> [W,C,T'B] transpose —
    # the (major dims -> lanes) orientation the Pallas guide flags as the
    # relayout worst case.  Kept opt-in for future toolchains; interpret-mode
    # bit-equality is tested (tests/test_stem_tmajor.py::TestEmitTmajor).
    if (
        os.environ.get("FLICKER_TMAJOR_EMIT", "") == "1"
        and jax.default_backend() == "tpu"
    ):
        # one-pass Pallas emit of advT + mask in the view layout (see
        # emit_tmajor above); dl folds the flag so the kernel is a pure
        # function of the batch
        dl = jnp.asarray(adv_flag, jnp.float32) * dpk[:, 0, 0, :].T  # [8C,T']
        dl = jnp.broadcast_to(dl[:, :, None], (cin, t, b)).reshape(cin, t * b)
        advT, mask2T = emit_tmajor(
            packed_u8, dl, input_min, input_max, out_dtype
        )
    elif os.environ.get("FLICKER_TMAJOR_U8FIRST", "") == "1":
        # Transpose the U8 batch into the view FIRST, then do
        # normalize+delta+clip as pure in-view elementwise ops — targeting
        # the depth-5c emit chain (fusion.12 0.41 + copy_bitcast_fusion
        # 0.57 + copy.263 0.51 ms bf16 advT emit, + the mask's fusion.49
        # 0.59 ms at 244 GiB/s): one u8 transpose is the cheapest possible
        # layout crossing (77 MB each way) and everything after is
        # lane-layout elementwise.  NEGATIVE RESULT (chip A/B 2026-08-19,
        # headline): 16.371 -> 16.061 steps/s, HBM bytes 43.37 -> 44.56 GB
        # — XLA's u8 [B,T',H,W,C] -> [H,W,C,T'B] relayout is slower than
        # the fused bf16 chain it replaces (the same major-dims-to-lanes
        # worst-case orientation that crashes the Pallas emitter), and the
        # in-view f32 `pre` materializes for the mask+clip pair.  Values
        # are bit-identical either way (TestU8FirstGate); kept gated off.
        advT, mask2T = _view_emit(
            to_tmajor_view(packed_u8), dpk, adv_flag, t, b,
            input_min, input_max, out_dtype,
        )
    else:
        x32 = packed_u8.astype(jnp.float32) / 128.0 - 1.0
        pre = x32 + jnp.asarray(adv_flag, jnp.float32) * dpk[None]
        adv = jnp.clip(pre, input_min, input_max).astype(out_dtype)
        advT = to_tmajor_view(adv)  # [H', W', 8C, T'B]
        mask2T = to_tmajor_view(_clip_grad_mask2(pre, input_min, input_max))
        if os.environ.get("FLICKER_TMAJOR_MASK_BARRIER", "1") == "1":
            # Without the barrier XLA rematerializes the mask from a SAVED
            # F32 `pre` in a split [H,W,C,T',B] transpose layout — a 308 MB
            # write plus a 2-copy relayout chain (copy_bitcast_fusion
            # 1.08 ms + copy.54 1.01 ms in the 2026-08-19 xplane) before
            # the backward's d(delta) reduce can read it.  The barrier pins
            # the residual to what the op declares: the 77 MB u8 mask,
            # already in the view.
            mask2T = lax.optimization_barrier(mask2T)
    yv = stem_conv_bn_relu_view(
        advT, pk, bn_mean, bn_var, bn_bias, b, 1e-3
    )
    res = (pk, bn_var, _res_y(yv), mask2T, dpk, adv_flag, delta_applied.shape, b)
    return yv.reshape(h, w, pk.shape[-1], t, b), res


def _head_vjp_fwd(
    packed_u8, delta_applied, adv_flag, pk, bn_mean, bn_var, bn_bias,
    input_min, input_max, out_dtype,
):
    y, res = _head_fwd_impl(
        packed_u8, delta_applied, adv_flag, pk, bn_mean, bn_var, bn_bias,
        input_min, input_max, out_dtype,
    )
    return y, res + (packed_u8.shape,)


def _head_vjp_bwd(input_min, input_max, out_dtype, res, g):
    return _head_bwd_core(res, g)


def _head_bwd_core(res, g):
    import os

    pk, bn_var, yv, mask2T, dpk, adv_flag, delta_shape, b, u8_shape = res
    h, w, cout, t, _ = g.shape
    cin = pk.shape[-2]
    c = cin // 8
    g4 = g.reshape(h, w, cout, t * b).astype(pk.dtype)
    vdt = bn_var.astype(pk.dtype)[:, None]
    g2 = g4 * (yv > 0) * lax.rsqrt(vdt + jnp.asarray(1e-3, pk.dtype))
    if os.environ.get("FLICKER_HEAD_FUSED_REDUCE", "1") == "1":
        # Push the temporal lane-shift combine INTO the masked reduce: the
        # combined d(adv) tensor never exists — each lane-shifted tap block
        # of the wide conv's `part` is multiplied by the clip mask and
        # reduced over (H, W) directly.  The shifted blk reads are slices
        # that fuse into the reduce loop (part is still touched once per
        # element), killing the ~2 ms chain that materialized the shifted
        # sum ([112,112,24,248] pair + slice, xplane 2026-08-20) just to
        # feed this [8C, T'B] reduce.  The four per-tap partial reduces
        # accumulate in f32 instead of the bf16 pre-adds of the combined
        # path — gradients agree to reassociation (the stem_conv_catbwd
        # contract); the old path stays at FLICKER_HEAD_FUSED_REDUCE=0.
        part = _catbwd_part(g2, pk, [(2, 1), (2, 1)])
        maskf = mask2T.astype(jnp.float32) * 0.5
        s_ct = None
        for m in range(pk.shape[0]):
            blk = lax.slice_in_dim(part, m * cin, (m + 1) * cin, axis=2)
            blk = _lane_shift(blk, (1 - m) * b, 0)  # dadv tap m: blk[v+s_m]
            term = jnp.sum(blk.astype(jnp.float32) * maskf, axis=(0, 1))
            s_ct = term if s_ct is None else s_ct + term
    else:
        # concat-kernel backward + lane-shift combine (_catbwd_lane_combine)
        dadv = _catbwd_lane_combine(g2, pk, b, 1, [(2, 1), (2, 1)])
        # masked reduce straight to d(delta): the f32 d(adv) never exists
        dm = dadv.astype(jnp.float32) * (mask2T.astype(jnp.float32) * 0.5)
        s_ct = jnp.sum(dm, axis=(0, 1))  # [8C, T'B]
    s_tb = jnp.sum(s_ct.reshape(cin, t, b), axis=-1)  # [8C, T']
    flag32 = jnp.asarray(adv_flag, jnp.float32)
    d_dpk = flag32 * s_tb.T  # [T', 8C]
    d_flag = jnp.sum(s_tb.T * dpk[:, 0, 0, :])
    # transpose of pack_flicker_delta's (pt, ph, pw, c) broadcast fold
    d_delta = (
        d_dpk.reshape(t, 2, 2, 2, c).sum(axis=(2, 3)).reshape(delta_shape)
    )
    import numpy as np

    return (
        np.zeros(u8_shape, dtype=jax.dtypes.float0),
        d_delta,
        d_flag,
        jnp.zeros_like(pk),
        jnp.zeros_like(bn_var),  # mean ([Cout] f32, same as var)
        jnp.zeros_like(bn_var),
        jnp.zeros_like(bn_var),  # bias
    )


flicker_stem_tmajor.defvjp(_head_vjp_fwd, _head_vjp_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def flicker_stem_tmajor_view(
    u8v: jax.Array,
    delta_applied: jax.Array,
    adv_flag: jax.Array,
    pk: jax.Array,
    bn_mean: jax.Array,
    bn_var: jax.Array,
    bn_bias: jax.Array,
    input_min: float,
    input_max: float,
    out_dtype,
    b: int,
) -> jax.Array:
    """flicker_stem_tmajor for a HOST-view-prepacked batch: u8v is already
    [H', W', 8C, T'B] in t*B+b lane order (data/packing.batch_to_view_np /
    native tfr_batch_view), so the program contains NO layout crossing at
    all — the ~2.1 ms device emit chain (PERF.md: three measured negative
    replacements) moves to a 1.4 GB/s/core host transpose overlapped with
    device compute.  `b` is static (the lane dim merges T' and B).
    Output and gradients are identical to flicker_stem_tmajor over the
    b-major batch (same per-element op order; TestViewHead)."""
    y, _ = _head_view_fwd_impl(
        u8v, delta_applied, adv_flag, pk, bn_mean, bn_var, bn_bias,
        input_min, input_max, out_dtype, b,
    )
    return y


def _head_view_fwd_impl(
    u8v, delta_applied, adv_flag, pk, bn_mean, bn_var, bn_bias,
    input_min, input_max, out_dtype, b,
):
    from .packed_apply import pack_flicker_delta

    h, w, cin, tb = u8v.shape
    t = tb // b
    dpk = pack_flicker_delta(delta_applied)  # [T', 1, 1, 8C]
    advT, mask2T = _view_emit(
        u8v, dpk, adv_flag, t, b, input_min, input_max, out_dtype
    )
    yv = stem_conv_bn_relu_view(
        advT, pk, bn_mean, bn_var, bn_bias, b, 1e-3
    )
    res = (pk, bn_var, _res_y(yv), mask2T, dpk, adv_flag, delta_applied.shape, b)
    return yv.reshape(h, w, pk.shape[-1], t, b), res


def _head_view_vjp_fwd(
    u8v, delta_applied, adv_flag, pk, bn_mean, bn_var, bn_bias,
    input_min, input_max, out_dtype, b,
):
    y, res = _head_view_fwd_impl(
        u8v, delta_applied, adv_flag, pk, bn_mean, bn_var, bn_bias,
        input_min, input_max, out_dtype, b,
    )
    return y, res + (u8v.shape,)


def _head_view_vjp_bwd(input_min, input_max, out_dtype, b, res, g):
    return _head_bwd_core(res, g)


flicker_stem_tmajor_view.defvjp(_head_view_vjp_fwd, _head_view_vjp_bwd)


# ---------------- strided spatial pool directly on the view ----------------


def _pool_view_ref_fwd(xv):
    """reduce-window reference on [H, W, C, N] (SAME (0,1) pads, 3x3/s2)."""
    return lax.reduce_window(
        xv,
        -jnp.inf,
        lax.max,
        window_dimensions=(3, 3, 1, 1),
        window_strides=(2, 2, 1, 1),
        padding=((0, 1), (0, 1), (0, 0), (0, 0)),
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def strided_pool_view(xv: jax.Array, interpret: bool = False, block=None):
    """(3,3)/(2,2) SAME max pool on the [H, W, C, N] view: Pallas forward in
    place (the ops/pallas_pool.py producer-layout kernel WITHOUT its (un)view
    transposes — the T-major stem already emits this orientation), XLA
    select-and-scatter backward bound on the same view.  Off-TPU the forward
    is the bit-identical reduce-window (max is order-free), so the model
    gate is inert on CPU tests."""
    return _pool_view_fwd_impl(xv, interpret, block)


def _pool_view_fwd_impl(xv, interpret, block):
    if not interpret and jax.default_backend() != "tpu":
        return _pool_view_ref_fwd(xv)
    from .pallas_pool import _pick_hw_blocks, _strided_fwd_kernel
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w, c, n = xv.shape
    ho, wo = h // 2, w // 2
    hb, wb = block or _pick_hw_blocks(ho, wo, c, n, xv.dtype.itemsize)

    if not interpret:
        from .accounting import record

        isz = xv.dtype.itemsize
        # main blocks tile x exactly; per grid cell one halo row, one halo
        # column and one corner element; y written once
        record(
            f"s2pool_view_fwd_{h}x{w}x{c}",
            hbm_bytes=(
                h * w * c * n * isz
                + (ho // hb) * (wo // wb) * (2 * wb + 2 * hb + 1) * c * n * isz
                + ho * wo * c * n * isz
            ),
        )

    yt = pl.pallas_call(
        _strided_fwd_kernel,
        grid=(ho // hb, wo // wb),
        in_specs=[
            pl.BlockSpec(
                (2 * hb, 2 * wb, c, n), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2 * wb, c, n),
                lambda i, j: (jnp.minimum(2 * hb * (i + 1), h - 1), j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2 * hb, 1, c, n),
                lambda i, j: (i, jnp.minimum(2 * wb * (j + 1), w - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, c, n),
                lambda i, j: (
                    jnp.minimum(2 * hb * (i + 1), h - 1),
                    jnp.minimum(2 * wb * (j + 1), w - 1),
                    0,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (hb, wb, c, n), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ho, wo, c, n), xv.dtype),
        interpret=interpret,
    )(xv, xv, xv, xv)
    return yt


def _pool_view_vjp_fwd(xv, interpret, block):
    return _pool_view_fwd_impl(xv, interpret, block), xv


def _pool_view_vjp_bwd(interpret, block, xv, dy):
    # FLICKER_S2V_PALLAS=1: one-pass Pallas routing (x + dy read once, y
    # recomputed in VMEM; ops/pool_s2_view_pallas.py) instead of XLA's
    # select-and-scatter.  TPU-only so the gate is inert on CPU tests.
    from .pool_s2_view_pallas import eligible as _s2v_ok
    from .pool_s2_view_pallas import gate_on as _s2v_on
    from .pool_s2_view_pallas import s2_pool_view_bwd_pallas

    if (
        not interpret
        and _s2v_on()
        and jax.default_backend() == "tpu"
        and _s2v_ok(xv.shape, xv.dtype.itemsize)
    ):
        return (s2_pool_view_bwd_pallas(xv, dy),)
    # exactly the autodiff backward of the reduce-window path, on the view
    # (same (H, W) row-major first-match order); degrades to jax.vjp if the
    # private primitive disappears in a future JAX
    ssa = getattr(lax, "select_and_scatter_add_p", None)
    ge = getattr(lax, "ge_p", None)
    if ssa is None or ge is None:
        _, pullback = jax.vjp(_pool_view_ref_fwd, xv)
        return (pullback(dy)[0],)
    dxv = ssa.bind(
        dy,
        xv,
        select_prim=ge,
        window_dimensions=(3, 3, 1, 1),
        window_strides=(2, 2, 1, 1),
        padding=((0, 1), (0, 1), (0, 0), (0, 0)),
    )
    return (dxv,)


strided_pool_view.defvjp(_pool_view_vjp_fwd, _pool_view_vjp_bwd)


# --------------- Mixed-region pools on the view (tmajor depth) -------------
#
# Extending the view past pool3a needs three more pool shapes.  All reuse
# ops/maxpool.py's separable first-match machinery (_pool_axis/_route_axis —
# the tie rule is select-and-scatter's, asserted against reduce_window
# autodiff in tests/test_maxpool.py), with the TEMPORAL axis recovered from
# the merged lanes by a free [H,W,C,T'B] -> [H,W,C,T',B] reshape: slices
# and pads on the second-minor T' dim are static, fusible ops — the same
# form as the stem backward's lane-shift chain.  Axis order is T, then H,
# then W in every backward (the composite select-and-scatter window order
# for NDHWC), matching the b-major path bit for bit including ties.


def _t_axis_5d(xv: jax.Array, b: int):
    h, w, c, tb = xv.shape
    return xv.reshape(h, w, c, tb // b, b)


def _lane_shift(x: jax.Array, s: int, fill) -> jax.Array:
    """out[..., i] = x[..., i + s] with `fill` beyond the edge — one static
    slice + one pad on the merged lane dim, the fusible form the stem
    backward's combine uses (never a 5-D B-minor reshape, which XLA pays
    relayout copies to consume: copy.33/34 in the depth-5c xplane)."""
    tb = x.shape[3]
    if s == 0:
        return x
    if s > 0:
        sl = lax.slice_in_dim(x, s, tb, axis=3)
        return jnp.pad(sl, ((0, 0),) * 3 + ((0, s),), constant_values=fill)
    sl = lax.slice_in_dim(x, 0, tb + s, axis=3)
    return jnp.pad(sl, ((0, 0),) * 3 + ((-s, 0),), constant_values=fill)


def _pool_t_s1_lanes(x: jax.Array, b: int) -> jax.Array:
    """Stride-1 window-3 SAME temporal max on the merged lanes."""
    neg = jnp.asarray(-jnp.inf, x.dtype)
    return lax.max(
        x, lax.max(_lane_shift(x, -b, neg), _lane_shift(x, b, neg))
    )


def _route_t_s1_lanes(g, pooled, source, b):
    """First-match routing for _pool_t_s1_lanes: window for output t covers
    source t-1, t, t+1 in ascending order (select-and-scatter's rule)."""
    neg = jnp.asarray(-jnp.inf, source.dtype)
    taken = None
    acc = None
    for k in range(3):
        s = (k - 1) * b
        cand = _lane_shift(source, s, neg)
        eq = cand == pooled
        if taken is not None:
            eq = eq & ~taken
        taken = eq if taken is None else taken | eq
        contrib = g * eq.astype(g.dtype)
        back = _lane_shift(contrib, -s, 0)
        acc = back if acc is None else acc + back
    return acc


def stride1_pool333_view(xv: jax.Array, b: int) -> jax.Array:
    """(3,3,3)/(1,1,1) SAME max pool on the view (the Inception branch_3
    pool).  Default: separable slice-max chains forward (reduce-window over
    a B-minor 5-D tensor would relayout; the chains are the same lowering
    the routing backward uses at 350-770 GiB/s b-major), first-match routing
    backward.  FLICKER_S1V_PALLAS routes eligible TPU geometries through the
    fused one-pass kernels (ops/pool_s1_view_pallas.py — residual x only,
    bit-identical values and gradients)."""
    from .pool_s1_view_pallas import eligible, gate_on, s1_pool333_view_pallas

    if (
        gate_on()
        and jax.default_backend() == "tpu"
        and eligible(xv.shape, b, xv.dtype.itemsize)
    ):
        return s1_pool333_view_pallas(xv, b)
    return _stride1_pool333_view_chain(xv, b)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _stride1_pool333_view_chain(xv: jax.Array, b: int) -> jax.Array:
    y, _ = _s1v_fwd_impl(xv, b)
    return y


def _s1t_lanes() -> bool:
    """FLICKER_TMAJOR_S1T_LANES=1: the branch_3 pool's TEMPORAL stage as
    merged-lane shifts instead of the 5-D (T',B) reshape.  Measured WORSE
    (chip A/B 2026-08-19, depth-5c headline): 60.42 -> 63.74 ms/step — the
    three full-width -inf-padded lane candidates cost more than the 5-D
    form's relayout copies (copy.33/34).  Kept gated as the recorded
    negative; default is the 5-D form."""
    import os

    return os.environ.get("FLICKER_TMAJOR_S1T_LANES", "") == "1"


def _s1v_fwd_impl(xv, b):
    from .maxpool import _pool_axis_overlap

    m_w = _pool_axis_overlap(xv, 1, 3)
    m_hw = _pool_axis_overlap(m_w, 0, 3)
    if _s1t_lanes():
        return _pool_t_s1_lanes(m_hw, b), (xv, m_w, m_hw)
    y5 = _pool_axis_overlap(_t_axis_5d(m_hw, b), 3, 3)
    return y5.reshape(xv.shape), (xv, m_w, m_hw)


def _s1v_vjp_fwd(xv, b):
    y, (x, m_w, m_hw) = _s1v_fwd_impl(xv, b)
    return y, (x, m_w, m_hw, y)


def _s1v_vjp_bwd(b, res, dy):
    from .maxpool import _route_axis

    xv, m_w, m_hw, y = res
    if _s1t_lanes():
        g = _route_t_s1_lanes(dy, y, m_hw, b)
    else:
        g = _route_axis(
            dy.reshape(_t_axis_5d(dy, b).shape),
            _t_axis_5d(y, b),
            _t_axis_5d(m_hw, b),
            axis=3, w=3, s=1,
        ).reshape(dy.shape)
    g = _route_axis(g, m_hw, m_w, axis=0, w=3, s=1)
    g = _route_axis(g, m_w, xv, axis=1, w=3, s=1)
    return (g,)


_stride1_pool333_view_chain.defvjp(_s1v_vjp_fwd, _s1v_vjp_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def temporal_pool_view(xv: jax.Array, b: int, window: int = 3) -> jax.Array:
    """SAME stride-2 temporal max pool on the merged lanes (window 2 or 3,
    even T' — the parity split is a free reshape).  Composes with the
    spatial pools to form MaxPool4a ((3,3,3)/(2,2,2)) and MaxPool5a
    ((2,2,2)/(2,2,2)) on the view; spatial runs FIRST (forward) so the
    chained VJPs route temporal first — the b-major axis order."""
    from .maxpool import _pool_axis

    return _pool_axis(_t_axis_5d(xv, b), 3, window, 2).reshape(
        xv.shape[0], xv.shape[1], xv.shape[2], -1
    )


def _tpv_vjp_fwd(xv, b, window):
    return temporal_pool_view(xv, b, window), xv


def _tpv_vjp_bwd(b, window, xv, dy):
    from .maxpool import _pool_axis, _route_axis

    x5 = _t_axis_5d(xv, b)
    y5 = _pool_axis(x5, 3, window, 2)
    g5 = _route_axis(dy.reshape(y5.shape), y5, x5, axis=3, w=window, s=2)
    return (g5.reshape(xv.shape),)


temporal_pool_view.defvjp(_tpv_vjp_fwd, _tpv_vjp_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _spatial_pool22_axis(axis: int, w: int, s: int, xv: jax.Array):
    from .maxpool import _pool_axis

    return _pool_axis(xv, axis, w, s)


def _sp22_fwd(axis, w, s, xv):
    return _spatial_pool22_axis(axis, w, s, xv), xv


def _sp22_bwd(axis, w, s, xv, dy):
    from .maxpool import _pool_axis, _route_axis

    y = _pool_axis(xv, axis, w, s)
    return (_route_axis(dy, y, xv, axis=axis, w=w, s=s),)


_spatial_pool22_axis.defvjp(_sp22_fwd, _sp22_bwd)


def pool4a_view(xv: jax.Array, b: int) -> jax.Array:
    """MaxPool3d_4a_3x3 ((3,3,3)/(2,2,2)) on the view: spatial (3,3)/(2,2)
    via strided_pool_view (Pallas fwd + view-bound select-and-scatter bwd),
    then the temporal parity pool — chained VJPs give temporal-first
    routing, the b-major composite order."""
    return temporal_pool_view(strided_pool_view(xv), b, 3)


def pool5a_view(xv: jax.Array, b: int) -> jax.Array:
    """MaxPool3d_5a_2x2 ((2,2,2)/(2,2,2)) on the view: per-axis parity
    pools (H, then W forward — backward routes W... the b-major composite
    routes T,H,W; forward order here is W, H, T so chained VJPs reverse to
    T, H, W exactly)."""
    yv = _spatial_pool22_axis(1, 2, 2, xv)  # W
    yv = _spatial_pool22_axis(0, 2, 2, yv)  # H
    return temporal_pool_view(yv, b, 2)
