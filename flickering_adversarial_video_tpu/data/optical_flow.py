"""TV-L1 optical flow, TPU-native (the reference's flow preprocessing branch).

The reference computes dense optical flow between consecutive resized gray
frames with OpenCV's DualTVL1, clips it to +-20 px, scales by /20 and
center-crops (utils/pre_process_rgb_flow.py:104-124).  That branch is dead on
every attack path (`flow=False` throughout), but a switching user of the
reference finds it in the API, so it is rebuilt here rather than stubbed.

This is the duality-based TV-L1 algorithm of Zach, Pock & Bischof (DAGM 2007)
in the formulation OpenCV implements (Sanchez et al., "TV-L1 Optical Flow
Estimation", IPOL 2013): a coarse-to-fine pyramid; per scale, `warps`
relinearizations of the data term around the current flow; per warp, a fixed
number of primal-dual iterations alternating

    v   <- u + TH(rho(u), grad I1w)          (pointwise data-term proximal)
    u_d <- v_d + theta * div(p_d)            (primal update, d in {x, y})
    p_d <- (p_d + tau/theta * grad u_d) / (1 + tau/theta * |grad u_d|)

Deliberate deviations from OpenCV, chosen for the XLA compilation model and
documented rather than hidden:

* fixed-trip `lax.scan` iteration instead of the epsilon early-exit — no
  data-dependent control flow inside jit (the iteration count bounds the
  epsilon criterion; OpenCV's own default epsilon is rarely hit before its
  iteration cap);
* pyramid zoom 0.5 (IPOL's choice) instead of OpenCV's 0.8 scale step —
  halving keeps every pyramid level's shape a static function of the input
  shape;
* no median filtering of the flow field between warps (OpenCV
  `medianFiltering=5`); the TV regularizer already enforces smoothness.

Everything is jittable and batchable: `tvl1_flow` is a pure function of two
gray images, and `flow_for_video` vmaps it over the T-1 consecutive pairs of
a clip.  Numerical validation is against synthetic ground-truth warps plus a
cv2.Farneback cross-check (tests/test_optical_flow.py) — OpenCV's DualTVL1
itself lives in opencv-contrib, which is unavailable here.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# OpenCV DualTVL1OpticalFlow defaults (tau, lambda, theta, nscales, warps)
TAU = 0.25
LAMBDA = 0.15
THETA = 0.3
NSCALES = 5
WARPS = 5
ITERATIONS = 30  # primal-dual iterations per warp
_GRAD_EPS = 1e-9


def _forward_diff(u: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Forward differences with Neumann boundary (last row/col -> 0)."""
    ux = jnp.pad(u[:, 1:] - u[:, :-1], ((0, 0), (0, 1)))
    uy = jnp.pad(u[1:, :] - u[:-1, :], ((0, 1), (0, 0)))
    return ux, uy


def _divergence(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Adjoint of -_forward_diff: backward differences, matching boundary."""
    h, w = p1.shape
    d1 = p1 - jnp.pad(p1[:, :-1], ((0, 0), (1, 0)))
    d1 = d1.at[:, w - 1].set(-p1[:, w - 2]) if w > 1 else d1
    d2 = p2 - jnp.pad(p2[:-1, :], ((1, 0), (0, 0)))
    d2 = d2.at[h - 1, :].set(-p2[h - 2, :]) if h > 1 else d2
    return d1 + d2


def _centered_grad(img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Centered differences, one-sided at the borders."""
    gx = (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1)) * 0.5
    gx = gx.at[:, 0].set(img[:, 1] - img[:, 0])
    gx = gx.at[:, -1].set(img[:, -1] - img[:, -2])
    gy = (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0)) * 0.5
    gy = gy.at[0, :].set(img[1, :] - img[0, :])
    gy = gy.at[-1, :].set(img[-1, :] - img[-2, :])
    return gx, gy


def _warp(img: jax.Array, u1: jax.Array, u2: jax.Array) -> jax.Array:
    """Bilinear sample of img at (x + u1, y + u2), border-clamped."""
    h, w = img.shape
    yy, xx = jnp.mgrid[0:h, 0:w].astype(img.dtype)
    return jax.scipy.ndimage.map_coordinates(
        img, [yy + u2, xx + u1], order=1, mode="nearest"
    )


def _tvl1_scale(
    i0: jax.Array,
    i1: jax.Array,
    u1: jax.Array,
    u2: jax.Array,
    tau: float,
    lam: float,
    theta: float,
    warps: int,
    iterations: int,
) -> Tuple[jax.Array, jax.Array]:
    """Run `warps` relinearizations at one pyramid scale."""
    i1x, i1y = _centered_grad(i1)
    l_t = lam * theta
    taut = tau / theta

    def one_warp(carry, _):
        u1, u2, p11, p12, p21, p22 = carry
        u1_0, u2_0 = u1, u2  # linearization point
        i1w = _warp(i1, u1_0, u2_0)
        i1wx = _warp(i1x, u1_0, u2_0)
        i1wy = _warp(i1y, u1_0, u2_0)
        grad2 = i1wx * i1wx + i1wy * i1wy + _GRAD_EPS
        # rho(u) = I1w + <grad I1w, u - u0> - I0, affine in u
        rho_c = i1w - i1wx * u1_0 - i1wy * u2_0 - i0

        def one_iter(carry, _):
            u1, u2, p11, p12, p21, p22 = carry
            rho = rho_c + i1wx * u1 + i1wy * u2
            # pointwise proximal of the L1 data term (IPOL eq. 14)
            d1 = jnp.where(
                rho < -l_t * grad2,
                l_t * i1wx,
                jnp.where(rho > l_t * grad2, -l_t * i1wx, -rho * i1wx / grad2),
            )
            d2 = jnp.where(
                rho < -l_t * grad2,
                l_t * i1wy,
                jnp.where(rho > l_t * grad2, -l_t * i1wy, -rho * i1wy / grad2),
            )
            v1 = u1 + d1
            v2 = u2 + d2
            u1 = v1 + theta * _divergence(p11, p12)
            u2 = v2 + theta * _divergence(p21, p22)
            u1x, u1y = _forward_diff(u1)
            u2x, u2y = _forward_diff(u2)
            ng1 = 1.0 + taut * jnp.sqrt(u1x * u1x + u1y * u1y)
            ng2 = 1.0 + taut * jnp.sqrt(u2x * u2x + u2y * u2y)
            p11 = (p11 + taut * u1x) / ng1
            p12 = (p12 + taut * u1y) / ng1
            p21 = (p21 + taut * u2x) / ng2
            p22 = (p22 + taut * u2y) / ng2
            return (u1, u2, p11, p12, p21, p22), None

        carry, _ = lax.scan(one_iter, (u1, u2, p11, p12, p21, p22), length=iterations)
        return carry, None

    zeros = jnp.zeros_like(u1)
    carry = (u1, u2, zeros, zeros, zeros, zeros)
    carry, _ = lax.scan(one_warp, carry, length=warps)
    return carry[0], carry[1]


def _pyramid_shapes(h: int, w: int, nscales: int):
    """Static per-scale shapes, zoom 0.5, floor 16 px on the short side."""
    shapes = [(h, w)]
    for _ in range(1, nscales):
        nh, nw = shapes[-1][0] // 2, shapes[-1][1] // 2
        if min(nh, nw) < 16:
            break
        shapes.append((nh, nw))
    return shapes


@functools.partial(
    jax.jit, static_argnames=("nscales", "warps", "iterations")
)
def tvl1_flow(
    i0: jax.Array,
    i1: jax.Array,
    tau: float = TAU,
    lam: float = LAMBDA,
    theta: float = THETA,
    nscales: int = NSCALES,
    warps: int = WARPS,
    iterations: int = ITERATIONS,
) -> jax.Array:
    """Dense TV-L1 flow from gray image i0 to i1; returns [H, W, 2] (dx, dy).

    Inputs are expected on the 0..255 gray scale (uint8 or float) — the
    default `lam` is calibrated for that scale and the values are only CAST,
    never rescaled.  For [0, 1]-scaled images either multiply by 255 first or
    pass lam*255 (the data term scales linearly with image magnitude).
    """
    i0 = i0.astype(jnp.float32)
    i1 = i1.astype(jnp.float32)
    h, w = i0.shape
    shapes = _pyramid_shapes(h, w, nscales)

    pyr0 = [i0]
    pyr1 = [i1]
    for sh in shapes[1:]:
        pyr0.append(jax.image.resize(pyr0[-1], sh, "linear", antialias=True))
        pyr1.append(jax.image.resize(pyr1[-1], sh, "linear", antialias=True))

    sh = shapes[-1]
    u1 = jnp.zeros(sh, jnp.float32)
    u2 = jnp.zeros(sh, jnp.float32)
    for s in range(len(shapes) - 1, -1, -1):
        u1, u2 = _tvl1_scale(
            pyr0[s], pyr1[s], u1, u2, tau, lam, theta, warps, iterations
        )
        if s > 0:
            up = shapes[s - 1]
            # flow values are in pixels: scale by the zoom factor on upsample
            fy = up[0] / shapes[s][0]
            fx = up[1] / shapes[s][1]
            u1 = jax.image.resize(u1, up, "linear") * fx
            u2 = jax.image.resize(u2, up, "linear") * fy
    return jnp.stack([u1, u2], axis=-1)


def rgb_to_gray(frames: jax.Array) -> jax.Array:
    """ITU-R BT.601 luma, the cv2.COLOR_RGB2GRAY weighting ([..., H, W, 3])."""
    coeffs = jnp.asarray([0.299, 0.587, 0.114], frames.dtype)
    return jnp.tensordot(frames, coeffs, axes=[[-1], [0]])


def flow_for_video(
    gray: jax.Array,
    warps: int = WARPS,
    iterations: int = ITERATIONS,
    nscales: int = NSCALES,
) -> jax.Array:
    """Flow for each consecutive pair of a gray clip [T, H, W] -> [T-1, H, W, 2].

    Pairs are independent — vmapped, so the T-1 TV-L1 solves run as one
    batched XLA program.
    """
    fn = functools.partial(
        tvl1_flow, warps=warps, iterations=iterations, nscales=nscales
    )
    return jax.vmap(fn)(gray[:-1], gray[1:])


def postprocess_flow(flow: jax.Array, crop_size: int = 224) -> jax.Array:
    """The reference's flow normalization: clip +-20 px, /20, center-crop
    (pre_process_rgb_flow.py:110-114)."""
    flow = jnp.clip(flow, -20.0, 20.0) / 20.0
    h, w = flow.shape[-3], flow.shape[-2]
    y1 = (h - crop_size) // 2
    x1 = (w - crop_size) // 2
    return flow[..., y1 : y1 + crop_size, x1 : x1 + crop_size, :]
