"""Pyramidal Lucas-Kanade optical flow, batched over keypoints.

Capability parity with the reference's cv::calcOpticalFlowPyrLK usage
(reference src/ssvio/frontend.cpp:156-166 and :374-384): 11x11 window,
3 pyramid levels, up to 30 iterations, eps 0.01, WITH initial-flow seeding
(OPTFLOW_USE_INITIAL_FLOW — the constant-velocity / projection prior is the
start point at the finest level).

TPU-first design: no per-keypoint loops — the whole keypoint set advances
together. Each KLT iteration is a fused batch of bilinear gathers
([N, 121] window taps), elementwise VPU math, and a closed-form 2x2 solve.
Convergence is handled with a freeze mask inside `lax.fori_loop`, keeping
shapes static. Template gradients are sampled once per level (classic KLT:
the spatial-gradient matrix G comes from the template window and stays fixed
across iterations).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssvio_tpu.ops import pyramid as pyr_ops
from ssvio_tpu.ops import sampling


class LKParams(NamedTuple):
    window: int = 11
    levels: int = 3
    iters: int = 30
    eps: float = 0.01
    min_eig: float = 1e-4     # per-pixel min eigenvalue threshold (OpenCV-like)


@functools.lru_cache()
def _window_offsets(window: int) -> np.ndarray:
    r = window // 2
    ys, xs = np.mgrid[-r:r + 1, -r:r + 1]
    return np.stack([xs.ravel(), ys.ravel()], axis=-1).astype(np.float32)  # [K, 2]


def _track_level(img_prev: jnp.ndarray, img_cur: jnp.ndarray,
                 gx: jnp.ndarray, gy: jnp.ndarray,
                 pts_prev: jnp.ndarray, pts_guess: jnp.ndarray,
                 params: LKParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One pyramid level of KLT. Returns (pts_cur [N,2], ok [N])."""
    offs = jnp.asarray(_window_offsets(params.window))           # [K, 2]
    k = offs.shape[0]
    taps_prev = pts_prev[:, None, :] + offs[None]                # [N, K, 2]
    T = sampling.gather_bilinear(img_prev, taps_prev)            # [N, K]
    Gx = sampling.gather_bilinear(gx, taps_prev)
    Gy = sampling.gather_bilinear(gy, taps_prev)
    gxx = jnp.sum(Gx * Gx, axis=1)
    gxy = jnp.sum(Gx * Gy, axis=1)
    gyy = jnp.sum(Gy * Gy, axis=1)
    det = gxx * gyy - gxy * gxy
    trace = gxx + gyy
    min_eig = (trace - jnp.sqrt(jnp.maximum(trace * trace - 4 * det, 0.0))) * 0.5
    good_g = (min_eig / k) > params.min_eig
    inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)

    h, w = img_cur.shape
    r = params.window // 2

    def body(_, carry):
        pts, frozen = carry
        taps_cur = pts[:, None, :] + offs[None]
        I = sampling.gather_bilinear(img_cur, taps_cur)
        diff = T - I                                             # [N, K]
        bx = jnp.sum(diff * Gx, axis=1)
        by = jnp.sum(diff * Gy, axis=1)
        dx = (gyy * bx - gxy * by) * inv_det
        dy = (gxx * by - gxy * bx) * inv_det
        delta = jnp.stack([dx, dy], axis=-1)
        step = jnp.where((frozen | ~good_g)[:, None], 0.0, delta)
        new_pts = pts + step
        converged = jnp.sum(delta * delta, axis=-1) < params.eps ** 2
        oob = ~sampling.in_bounds(new_pts, h, w, border=r + 1)
        return new_pts, frozen | converged | oob

    pts0 = pts_guess
    frozen0 = ~sampling.in_bounds(pts0, h, w, border=r + 1)
    pts_out, _ = jax.lax.fori_loop(0, params.iters, body, (pts0, frozen0))
    ok = good_g & sampling.in_bounds(pts_out, h, w, border=1.0) \
        & sampling.in_bounds(pts_prev, img_prev.shape[0], img_prev.shape[1], border=1.0)
    return pts_out, ok


def track(pyr_prev: List[jnp.ndarray], pyr_cur: List[jnp.ndarray],
          pts_prev: jnp.ndarray, pts_init: jnp.ndarray,
          valid: jnp.ndarray, params: LKParams = LKParams()
          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Track keypoints from prev to cur through the pyramid.

    Args:
      pyr_prev/pyr_cur: power-of-two pyramids (finest first), see
        pyramid.build_lk_pyramid.
      pts_prev: [N, 2] positions in the prev frame (finest level coords).
      pts_init: [N, 2] initial guesses in cur frame (the USE_INITIAL_FLOW
        seed; pass pts_prev for none).
      valid:    [N] input validity mask.

    Returns (pts_cur [N, 2], ok [N] bool, err [N] mean abs window residual).
    """
    levels = min(params.levels, len(pyr_prev))
    # seed at the coarsest level: the flow prior scaled down; track the
    # DISPLACEMENT (pts_init - pts_prev) across levels like OpenCV.
    flow = (pts_init - pts_prev) / (2.0 ** (levels - 1))
    pts_lvl = pts_prev / (2.0 ** (levels - 1))
    ok = valid
    for l in range(levels - 1, -1, -1):
        img_p = pyr_prev[l]
        img_c = pyr_cur[l]
        gx, gy = pyr_ops.sobel_gradients(img_p)
        pts_cur_lvl, ok_lvl = _track_level(img_p, img_c, gx, gy,
                                           pts_lvl, pts_lvl + flow, params)
        flow = pts_cur_lvl - pts_lvl
        ok = ok & ok_lvl
        if l > 0:
            pts_lvl = pts_prev / (2.0 ** (l - 1))
            flow = flow * 2.0
    pts_cur = pts_prev + flow
    # final photometric error on the finest level
    offs = jnp.asarray(_window_offsets(params.window))
    T = sampling.gather_bilinear(pyr_prev[0], pts_prev[:, None, :] + offs[None])
    I = sampling.gather_bilinear(pyr_cur[0], pts_cur[:, None, :] + offs[None])
    err = jnp.mean(jnp.abs(T - I), axis=1)
    ok = ok & sampling.in_bounds(pts_cur, pyr_cur[0].shape[0], pyr_cur[0].shape[1],
                                 border=1.0)
    return pts_cur, ok, err
