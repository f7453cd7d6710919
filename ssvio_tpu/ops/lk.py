"""Pyramidal Lucas-Kanade optical flow, batched over keypoints.

Capability parity with the reference's cv::calcOpticalFlowPyrLK usage
(reference src/ssvio/frontend.cpp:156-166 and :374-384): 11x11 window,
3 pyramid levels, up to 30 iterations, eps 0.01, WITH initial-flow seeding
(OPTFLOW_USE_INITIAL_FLOW — the constant-velocity / projection prior is the
start point at the finest level).

TPU-first design — the key observation is that the KLT window moves as a
RIGID TRANSLATION, so every sample in the window shares one fractional
offset. Sampling the window therefore needs NO per-element gathers:

  1. Per level, each keypoint extracts one fixed-size patch around its
     integer position (template + gradients from the previous image, a
     margin-padded search patch from the current image) — a vmapped
     `lax.dynamic_slice`, the only "gather"-like op, once per level.
  2. Every KLT iteration then samples its 11x11 window as ONE dynamic
     slice of the small patch plus a 4-corner bilinear blend with scalar
     weights — pure VPU math on [N, 11, 11] tensors.

This removes the scattered image-wide gathers (which cost ~200 ms/frame on
TPU) from the 30-iteration hot loop. Convergence uses a freeze mask inside
`lax.fori_loop`; shapes are static everywhere. The spatial-gradient matrix
G comes from the template window and stays fixed across iterations
(classic forward-additive KLT, as in OpenCV).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax import lax

from ssvio_tpu.ops import pyramid as pyr_ops
from ssvio_tpu.ops import sampling


class LKParams(NamedTuple):
    window: int = 11
    levels: int = 3
    iters: int = 30
    eps: float = 0.01
    min_eig: float = 1e-4     # per-pixel min eigenvalue threshold (OpenCV-like)
    margin: int = 8           # search slack around the seed per level (px)
    # 'auto' = Pallas kernel on TPU, XLA elsewhere; 'xla' forces the
    # vmapped-dynamic-slice path; 'pallas_interpret' runs the kernel in
    # interpreter mode (CPU parity tests).
    backend: str = "auto"
    # VMEM-resident kernel flavor: 'serial' = per-keypoint roll/blend kernel
    # with individual early exit (default; fastest measured), 'sw' = serial
    # with the dynamic sublane roll replaced by a static-slice switch,
    # 'ymm'/'pkmm' = serial structure but window sampling via two-hot
    # interpolation matmuls (y only / both axes), 'mm' = lockstep
    # matmul-sampling groups (bf16 matmuls, f32 accumulation), 'mm_f32' =
    # same in full f32. 'mm' requires a Mosaic with mixed bf16->f32
    # tpu.matmul support; this image's rejects it ("Bad lhs type"), so
    # prefer 'mm_f32' on hardware.
    kernel: str = "serial"


def _pallas_mode(params: "LKParams"):
    """None = XLA path, else the `interpret` flag for the Pallas kernel."""
    if params.backend == "xla":
        return None
    if params.backend == "pallas_interpret":
        return True
    if params.backend == "pallas":
        return False
    import jax
    return False if jax.default_backend() == "tpu" else None


def _extract_patches(img: jnp.ndarray, top_left: jnp.ndarray, size: int):
    """Vmapped dynamic-slice patch extraction.

    top_left: [N, 2] INTEGER (x, y). Returns (patches [N, size, size],
    actual_top_left [N, 2]) — lax.dynamic_slice clamps at borders, so the
    clamped origin is returned for correct local coordinates.
    """
    h, w = img.shape
    x0 = jnp.clip(top_left[:, 0], 0, w - size)
    y0 = jnp.clip(top_left[:, 1], 0, h - size)

    def one(y, x):
        return lax.dynamic_slice(img, (y, x), (size, size))

    patches = jax.vmap(one)(y0, x0)
    return patches, jnp.stack([x0, y0], axis=-1)


def _sample_window(patches: jnp.ndarray, local_tl: jnp.ndarray, win: int):
    """Bilinear window sample from per-keypoint patches.

    patches: [N, P, P]; local_tl: [N, 2] float window top-left in patch
    coords. Returns [N, win, win]. One dynamic slice + 4-corner scalar blend
    per keypoint (vmapped) — no element gathers.
    """
    Pp = patches.shape[-1]
    base_x = jnp.clip(jnp.floor(local_tl[:, 0]), 0, Pp - win - 1)
    base_y = jnp.clip(jnp.floor(local_tl[:, 1]), 0, Pp - win - 1)
    fx = (local_tl[:, 0] - base_x)[:, None, None]
    fy = (local_tl[:, 1] - base_y)[:, None, None]

    def one(patch, y, x):
        return lax.dynamic_slice(patch, (y, x), (win + 1, win + 1))

    s = jax.vmap(one)(patches, base_y.astype(jnp.int32), base_x.astype(jnp.int32))
    return ((1 - fy) * (1 - fx) * s[:, :win, :win]
            + (1 - fy) * fx * s[:, :win, 1:win + 1]
            + fy * (1 - fx) * s[:, 1:win + 1, :win]
            + fy * fx * s[:, 1:win + 1, 1:win + 1])


def _track_level_pallas(img_prev, img_cur, gx, gy, pts_prev, pts_guess,
                        valid, params: LKParams, interpret: bool):
    """Pallas-kernel level: VMEM-resident kernel when the level fits
    (no per-keypoint DMA — see lk_pallas.lk_level_vmem), HBM-patch kernel
    otherwise."""
    from ssvio_tpu.ops import lk_pallas

    win = params.window
    r = win // 2
    margin = params.margin
    h, w = img_cur.shape

    hv = max(-(-h // 8) * 8, 32)
    wv = max(-(-w // 128) * 128, lk_pallas.LANES)
    if 4 * hv * wv * 4 <= lk_pallas.VMEM_PLANE_BUDGET:
        if (hv, wv) != (h, w):
            pad = ((0, hv - h), (0, wv - w))
            img_prev_p = jnp.pad(img_prev, pad)
            img_cur_p = jnp.pad(img_cur, pad)
            gx_p = jnp.pad(gx, pad)
            gy_p = jnp.pad(gy, pad)
        else:
            img_prev_p, img_cur_p, gx_p, gy_p = img_prev, img_cur, gx, gy
        frozen0 = (~valid | ~sampling.in_bounds(pts_guess, h, w, border=r + 1)) \
            .astype(jnp.int32)[:, None]
        if params.kernel in ("mm", "mm_f32"):
            from ssvio_tpu.ops import lk_pallas_variants
            pts_out, flag = lk_pallas_variants.lk_level_vmem_mm(
                img_prev_p, gx_p, gy_p, img_cur_p, pts_prev, pts_guess,
                frozen0, win=win, iters=params.iters, eps=params.eps,
                min_eig=params.min_eig, use_bf16=(params.kernel == "mm"),
                interpret=interpret)
        elif params.kernel in ("ymm", "pkmm"):
            from ssvio_tpu.ops import lk_pallas_variants
            pts_out, flag = lk_pallas_variants.lk_level_vmem_pk(
                img_prev_p, gx_p, gy_p, img_cur_p, pts_prev, pts_guess,
                frozen0, win=win, iters=params.iters, eps=params.eps,
                min_eig=params.min_eig, x_mm=(params.kernel == "pkmm"),
                interpret=interpret)
        elif params.kernel == "sw":
            from ssvio_tpu.ops import lk_pallas_variants
            pts_out, flag = lk_pallas_variants.lk_level_vmem_sw(
                img_prev_p, gx_p, gy_p, img_cur_p, pts_prev, pts_guess,
                frozen0, win=win, iters=params.iters, eps=params.eps,
                min_eig=params.min_eig, interpret=interpret)
        else:
            pts_out, flag = lk_pallas.lk_level_vmem(
                img_prev_p, gx_p, gy_p, img_cur_p, pts_prev, pts_guess,
                frozen0, win=win, iters=params.iters, eps=params.eps,
                min_eig=params.min_eig, interpret=interpret)
        ok = (flag[:, 0] > 0) & sampling.in_bounds(pts_out, h, w, border=1.0) \
            & sampling.in_bounds(pts_prev, img_prev.shape[0],
                                 img_prev.shape[1], border=1.0)
        return pts_out, ok

    LANES = lk_pallas.LANES
    rup8 = lambda v: -(-v // 8) * 8
    # patch footprints: +7 rows of slack so 8-aligned row origins still
    # cover the window; x gets a full second lane tile (128-aligned origin);
    # >= 32 rows so the kernel's 32-row power-of-2 slab always fits
    pty = max(rup8(win + 2 + 7), 32)
    pcy = max(rup8(win + 2 * margin + 2 + 7), 32)

    # pad tiny coarse levels so the patch footprint always fits (padding is
    # never sampled by ACCEPTED tracks — border gating keeps windows inside
    # the true image)
    hp = max(rup8(h), pcy)
    wp = max(-(-w // 128) * 128, LANES)
    if (hp, wp) != (h, w):
        pad = ((0, hp - h), (0, wp - w))
        img_prev_p = jnp.pad(img_prev, pad)
        img_cur_p = jnp.pad(img_cur, pad)
        gx_p = jnp.pad(gx, pad)
        gy_p = jnp.pad(gy, pad)
    else:
        img_prev_p, img_cur_p, gx_p, gy_p = img_prev, img_cur, gx, gy

    def aligned_origin(tl, py):
        ox = jnp.clip((tl[:, 0] // 128) * 128, 0, wp - LANES)
        oy = jnp.clip((tl[:, 1] // 8) * 8, 0, hp - py)
        return jnp.stack([ox, oy], axis=-1)

    tlp = jnp.stack([jnp.floor(pts_prev[:, 0]).astype(jnp.int32) - r,
                     jnp.floor(pts_prev[:, 1]).astype(jnp.int32) - r], axis=-1)
    org_T = aligned_origin(tlp, pty)
    localT = pts_prev - r - org_T.astype(pts_prev.dtype)
    tlc = jnp.stack([jnp.round(pts_guess[:, 0]).astype(jnp.int32) - r,
                     jnp.round(pts_guess[:, 1]).astype(jnp.int32) - r - margin],
                    axis=-1)
    org_C = aligned_origin(tlc, pcy)
    org_Cf = org_C.astype(pts_guess.dtype)
    local0 = pts_guess - r - org_Cf
    frozen0 = (~valid | ~sampling.in_bounds(pts_guess, h, w, border=r + 1)) \
        .astype(jnp.int32)[:, None]

    local_out, flag = lk_pallas.lk_level_pallas(
        img_prev_p, gx_p, gy_p, img_cur_p, org_T, org_C, localT, local0,
        frozen0, win=win, pty=pty, pcy=pcy, iters=params.iters,
        eps=params.eps, min_eig=params.min_eig, interpret=interpret)
    pts_out = org_Cf + r + local_out
    ok = (flag[:, 0] > 0) & sampling.in_bounds(pts_out, h, w, border=1.0) \
        & sampling.in_bounds(pts_prev, img_prev.shape[0], img_prev.shape[1],
                             border=1.0)
    return pts_out, ok


def _track_level(img_prev: jnp.ndarray, img_cur: jnp.ndarray,
                 gx: jnp.ndarray, gy: jnp.ndarray,
                 pts_prev: jnp.ndarray, pts_guess: jnp.ndarray,
                 valid: jnp.ndarray,
                 params: LKParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One pyramid level of KLT. Returns (pts_cur [N,2], ok [N]).

    `valid` pre-freezes dead keypoints: invalid slots of the fixed-capacity
    feature array would otherwise burn full iteration loops on stale
    positions (typically ~half the slots in steady state)."""
    mode = _pallas_mode(params)
    if mode is not None:
        return _track_level_pallas(img_prev, img_cur, gx, gy, pts_prev,
                                   pts_guess, valid, params, interpret=mode)
    win = params.window
    r = win // 2
    margin = params.margin
    h, w = img_cur.shape
    Pt = win + 2                      # template patch (fixed position)
    # search patch, capped so it fits the (possibly tiny coarse) level
    Pc = min(win + 2 * margin + 2, h, w)

    # --- template + gradient windows at the (fractional) prev position
    tl_prev_i = jnp.floor(pts_prev).astype(jnp.int32) - r
    patch_T, org_T = _extract_patches(img_prev, tl_prev_i, Pt)
    patch_gx, _ = _extract_patches(gx, tl_prev_i, Pt)
    patch_gy, _ = _extract_patches(gy, tl_prev_i, Pt)
    local_T = pts_prev - r - org_T.astype(pts_prev.dtype)
    T = _sample_window(patch_T, local_T, win)
    Gx = _sample_window(patch_gx, local_T, win)
    Gy = _sample_window(patch_gy, local_T, win)

    gxx = jnp.sum(Gx * Gx, axis=(1, 2))
    gxy = jnp.sum(Gx * Gy, axis=(1, 2))
    gyy = jnp.sum(Gy * Gy, axis=(1, 2))
    det = gxx * gyy - gxy * gxy
    trace = gxx + gyy
    min_eig = (trace - jnp.sqrt(jnp.maximum(trace * trace - 4 * det, 0.0))) * 0.5
    good_g = (min_eig / (win * win)) > params.min_eig
    inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)

    # --- current-image search patches around the integer seed
    tl_cur_i = jnp.round(pts_guess).astype(jnp.int32) - (r + margin)
    patch_C, org_C = _extract_patches(img_cur, tl_cur_i, Pc)
    org_Cf = org_C.astype(pts_guess.dtype)

    def body(_, carry):
        pts, frozen = carry
        local_tl = pts - r - org_Cf                     # window TL in patch
        I = _sample_window(patch_C, local_tl, win)
        diff = T - I
        bx = jnp.sum(diff * Gx, axis=(1, 2))
        by = jnp.sum(diff * Gy, axis=(1, 2))
        dx = (gyy * bx - gxy * by) * inv_det
        dy = (gxx * by - gxy * bx) * inv_det
        delta = jnp.stack([dx, dy], axis=-1)
        step = jnp.where((frozen | ~good_g)[:, None], 0.0, delta)
        new_pts = pts + step
        converged = jnp.sum(delta * delta, axis=-1) < params.eps ** 2
        # leaving the search patch (or the image) freezes the point
        new_local = new_pts - r - org_Cf
        oob = ((new_local[:, 0] < 0) | (new_local[:, 1] < 0)
               | (new_local[:, 0] > Pc - win - 1)
               | (new_local[:, 1] > Pc - win - 1)
               | ~sampling.in_bounds(new_pts, h, w, border=r + 1))
        return new_pts, frozen | converged | oob

    pts0 = pts_guess
    local0 = pts0 - r - org_Cf
    frozen0 = (~valid | (local0[:, 0] < 0) | (local0[:, 1] < 0)
               | (local0[:, 0] > Pc - win - 1) | (local0[:, 1] > Pc - win - 1)
               | ~sampling.in_bounds(pts0, h, w, border=r + 1))
    pts_out, _ = lax.fori_loop(0, params.iters, body, (pts0, frozen0))
    ok = good_g & sampling.in_bounds(pts_out, h, w, border=1.0) \
        & sampling.in_bounds(pts_prev, img_prev.shape[0], img_prev.shape[1],
                             border=1.0)
    return pts_out, ok


def track(pyr_prev: List[jnp.ndarray], pyr_cur: List[jnp.ndarray],
          pts_prev: jnp.ndarray, pts_init: jnp.ndarray,
          valid: jnp.ndarray, params: LKParams = LKParams(),
          compute_err: bool = True, grads_prev=None
          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Track keypoints from prev to cur through the pyramid.

    Args:
      pyr_prev/pyr_cur: power-of-two pyramids (finest first), see
        pyramid.build_lk_pyramid.
      pts_prev: [N, 2] positions in the prev frame (finest level coords).
      pts_init: [N, 2] initial guesses in cur frame (the USE_INITIAL_FLOW
        seed; pass pts_prev for none).
      valid:    [N] input validity mask.
      compute_err: when False, skip the final photometric window resample —
        it is a vmapped-dynamic-slice gather pass (the cost the Pallas
        kernel exists to avoid) and only callers that gate on `err` need it
        (the stereo matcher; the temporal tracker uses the FB check
        instead). err is returned as zeros in that case.
      grads_prev: optional ((gx per level), (gy per level)) Sobel gradients
        of pyr_prev, computed once per image and reused across the
        forward/backward/stereo track calls that share a template pyramid
        (recomputing them inside every call was ~20% of the per-frame
        device time). None recomputes them here.

    Returns (pts_cur [N, 2], ok [N] bool, err [N] mean abs window residual).
    """
    levels = min(params.levels, len(pyr_prev))
    flow = (pts_init - pts_prev) / (2.0 ** (levels - 1))
    pts_lvl = pts_prev / (2.0 ** (levels - 1))
    ok = valid
    for l in range(levels - 1, -1, -1):
        img_p = pyr_prev[l]
        img_c = pyr_cur[l]
        if grads_prev is not None:
            gx, gy = grads_prev[0][l], grads_prev[1][l]
        else:
            gx, gy = pyr_ops.sobel_gradients(img_p)
        pts_cur_lvl, ok_lvl = _track_level(img_p, img_c, gx, gy,
                                           pts_lvl, pts_lvl + flow, valid,
                                           params)
        flow = pts_cur_lvl - pts_lvl
        ok = ok & ok_lvl
        if l > 0:
            pts_lvl = pts_prev / (2.0 ** (l - 1))
            flow = flow * 2.0
    pts_cur = pts_prev + flow
    if compute_err:
        # final photometric error on the finest level (window resample)
        win = params.window
        r = win // 2
        tlp = jnp.floor(pts_prev).astype(jnp.int32) - r
        patch_T, org_T = _extract_patches(pyr_prev[0], tlp, win + 2)
        T = _sample_window(patch_T, pts_prev - r - org_T.astype(pts_prev.dtype),
                           win)
        tlc = jnp.floor(pts_cur).astype(jnp.int32) - r
        patch_I, org_I = _extract_patches(pyr_cur[0], tlc, win + 2)
        I = _sample_window(patch_I, pts_cur - r - org_I.astype(pts_cur.dtype),
                           win)
        err = jnp.mean(jnp.abs(T - I), axis=(1, 2))
    else:
        err = jnp.zeros(pts_cur.shape[0], pts_cur.dtype)
    ok = ok & sampling.in_bounds(pts_cur, pyr_cur[0].shape[0], pyr_cur[0].shape[1],
                                 border=1.0)
    return pts_cur, ok, err
