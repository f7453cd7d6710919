"""Pallas TPU kernel for one Lucas-Kanade pyramid level.

The XLA formulation of KLT (ops/lk.py) spends ~50 ms/level in vmapped
dynamic-slice gathers (TPU lowers them to gather ops). This kernel removes
them: one grid program per keypoint DMAs its template/gradient/search
patches from HBM into VMEM once, then runs the 30-iteration loop with
window sampling expressed as pure vector math — the KLT window moves
rigidly, so the whole window shares ONE fractional offset and sampling is
an aligned slab load + two power-of-2 dynamic rotates + a 4-corner scalar
blend. Zero gathers.

TPU layout constraints shape the design:
- HBM async-copy slice origins must be tile-aligned, so every patch is
  DMA'd as [rows, 256] with a 128-aligned x origin and 8-aligned row
  origin; the window's local x then starts in [0, 128). Small coarse
  levels are zero-padded by the wrapper to satisfy the minimum patch
  footprint.
- Per-keypoint scalars ride the scalar-prefetch channel (SMEM); outputs
  are whole [N, 2]/[N, 1] SMEM arrays written row-by-row.

The kernel is numerically identical to the XLA path (same template
gradients, same freeze/convergence rules); tests check parity in
interpreter mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 256          # patch width; HBM slice origins must be 128-aligned and
                     # dynamic_rotate needs multiple-of-128 lanes, so patches
                     # span two lane tiles and the window lands in the first.


def _blend(sub: jnp.ndarray, fx, fy, win: int) -> jnp.ndarray:
    """4-corner bilinear blend of a [win+1, win+1] slab with scalar fracs."""
    return ((1 - fy) * (1 - fx) * sub[:win, :win]
            + (1 - fy) * fx * sub[:win, 1:win + 1]
            + fy * (1 - fx) * sub[1:win + 1, :win]
            + fy * fx * sub[1:win + 1, 1:win + 1])


def _dyn_window(patch_ref, by_i, bx_i, win: int, rows: int):
    """[win+1, win+1] slab at dynamic (y, x) from a [rows, LANES] VMEM patch.

    Mosaic constraints (measured on v5e): dynamic sublane vector loads must
    be 8-aligned, and dynamic `pltpu.roll` is only CORRECT when the rolled
    dimension is a power of two. So: load a 32-row slab at an 8-aligned
    origin, rotate rows by the sub-8 remainder (32 = pow2), rotate lanes by
    x (256 = pow2), then slice statically. Since by <= rows - win - 1, the
    kept rows end at index 31 at most — never wrapping (needs rows >= 32,
    rows % 8 == 0).
    """
    base = jnp.minimum((by_i // 8) * 8, rows - 32)
    base = pl.multiple_of(base, 8)
    slab = patch_ref[pl.ds(base, 32), :]               # [32, LANES]
    slab = pltpu.roll(slab, -(by_i - base), axis=0)
    rolled = pltpu.roll(slab[:win + 1, :], -bx_i, axis=1)
    return rolled[:, :win + 1]


KP_PER_PROG = 8      # keypoints per grid program: their 4*KP patch DMAs are
                     # all issued before the first wait, overlapping the HBM
                     # latency that dominates a one-keypoint program
                     # (measured: iters=1 costs 80% of iters=30 at KP=1)


def _make_kernel(win: int, pty: int, pcy: int, iters: int, eps: float,
                 min_eig: float, kp: int):
    def kernel(tlp_ref, tlc_ref, localT_ref, local0_ref, frozen0_ref,
               # ^ scalar prefetch (SMEM), all FLAT 1-D: [2N] i32 x2,
               #   [2N] f32 x2, [N] i32. 2-D SMEM arrays get lane-padded to
               #   128 on v5e (a [N,2] block charges N*128 words), which
               #   overflows the 1MB SMEM for N>=256; 1-D arrays don't pad.
               prev_hbm, gx_hbm, gy_hbm, cur_hbm,      # ANY [H, W]
               out_ref, flag_ref,                      # SMEM flat [2N],[N]
               patchT, patchGx, patchGy, patchC, sems):
        pid = pl.program_id(0)

        # issue ALL patch copies for the kp keypoints up front
        copies = []
        for b in range(kp):
            i = pid * kp + b
            # origins are pre-aligned by the wrapper (x: 128, y: 8); the
            # multiple_of hints let Mosaic prove HBM slice tile alignment
            xt = pl.multiple_of(tlp_ref[2 * i], 128)
            yt = pl.multiple_of(tlp_ref[2 * i + 1], 8)
            for src, dst, k in ((prev_hbm, patchT, 0), (gx_hbm, patchGx, 1),
                                (gy_hbm, patchGy, 2)):
                c = pltpu.make_async_copy(
                    src.at[pl.ds(yt, pty), pl.ds(xt, LANES)],
                    dst.at[b], sems.at[b, k])
                c.start()
                copies.append(c)
            xc = pl.multiple_of(tlc_ref[2 * i], 128)
            yc = pl.multiple_of(tlc_ref[2 * i + 1], 8)
            c4 = pltpu.make_async_copy(
                cur_hbm.at[pl.ds(yc, pcy), pl.ds(xc, LANES)],
                patchC.at[b], sems.at[b, 3])
            c4.start()
            copies.append(c4)
        for c in copies:
            c.wait()

        lim_x = jnp.float32(LANES - win - 1)
        lim_y = jnp.float32(pcy - win - 1)

        for b in range(kp):
            i = pid * kp + b
            # --- template + gradient windows (fixed fractional offset)
            ltx = localT_ref[2 * i]
            lty = localT_ref[2 * i + 1]
            btx = jnp.clip(jnp.floor(ltx), 0, LANES - win - 1)
            bty = jnp.clip(jnp.floor(lty), 0, pty - win - 1)
            ftx = ltx - btx
            fty = lty - bty
            btx_i = btx.astype(jnp.int32)
            bty_i = bty.astype(jnp.int32)
            pT, pGx, pGy, pC = (patchT.at[b], patchGx.at[b], patchGy.at[b],
                                patchC.at[b])
            T = _blend(_dyn_window(pT, bty_i, btx_i, win, pty), ftx, fty, win)
            Gx = _blend(_dyn_window(pGx, bty_i, btx_i, win, pty), ftx, fty, win)
            Gy = _blend(_dyn_window(pGy, bty_i, btx_i, win, pty), ftx, fty, win)

            gxx = jnp.sum(Gx * Gx)
            gxy = jnp.sum(Gx * Gy)
            gyy = jnp.sum(Gy * Gy)
            det = gxx * gyy - gxy * gxy
            trace = gxx + gyy
            me = (trace - jnp.sqrt(jnp.maximum(trace * trace - 4 * det, 0.0))) * 0.5
            good_g = (me / (win * win)) > min_eig
            inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)

            def cond(carry):
                it, lx, ly, frozen = carry
                return (it < iters) & jnp.logical_not(frozen)

            def body(carry, T=T, Gx=Gx, Gy=Gy, gxx=gxx, gxy=gxy, gyy=gyy,
                     inv_det=inv_det, pC=pC):
                it, lx, ly, frozen = carry
                bx = jnp.clip(jnp.floor(lx), 0, lim_x)
                by = jnp.clip(jnp.floor(ly), 0, lim_y)
                fx = lx - bx
                fy = ly - by
                sub = _dyn_window(pC, by.astype(jnp.int32),
                                  bx.astype(jnp.int32), win, pcy)
                I = _blend(sub, fx, fy, win)
                diff = T - I
                bxs = jnp.sum(diff * Gx)
                bys = jnp.sum(diff * Gy)
                dx = (gyy * bxs - gxy * bys) * inv_det
                dy = (gxx * bys - gxy * bxs) * inv_det
                nlx = lx + dx
                nly = ly + dy
                converged = dx * dx + dy * dy < eps * eps
                oob = (nlx < 0.0) | (nly < 0.0) | (nlx > lim_x) | (nly > lim_y)
                return it + 1, nlx, nly, converged | oob

            lx0 = local0_ref[2 * i]
            ly0 = local0_ref[2 * i + 1]
            frozen0 = frozen0_ref[i] > 0
            oob0 = (lx0 < 0.0) | (ly0 < 0.0) | (lx0 > lim_x) | (ly0 > lim_y)
            # while_loop: each keypoint exits as soon as it converges or
            # leaves the patch — ~3x fewer iterations than a fixed 30 on
            # real imagery, and the gradient gate (good_g) skips the loop
            # entirely
            _, lx, ly, _ = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), lx0, ly0,
                 frozen0 | oob0 | jnp.logical_not(good_g)))
            out_ref[2 * i] = lx
            out_ref[2 * i + 1] = ly
            flag_ref[i] = good_g.astype(jnp.int32)

    return kernel


def _make_serial_vmem_kernel(win: int, H: int, W: int, iters: int, eps: float,
                             min_eig: float, kp: int, make_sample):
    """Shared serial per-keypoint KLT loop over VMEM-resident images.

    `make_sample(ref, bx_i, by_i, fx, fy)` returns the bilinearly sampled
    window at dynamic (bx+fx, by+fy) — a [win, win] (or row/col-zero-padded)
    plane. All downstream math (Harris gate, normal equations, while-loop
    with individual early exit, freeze and output logic) is sampling-
    agnostic: it is elementwise products + full-plane sums, so padded rows/
    cols that the sampler leaves zero do not perturb the sums. Both
    lk_level_vmem (roll+blend sampling) and lk_level_vmem_pk (two-hot
    matmul sampling) build their kernels through this one factory, so the
    loop logic cannot drift between variants (advisor finding, r2)."""
    lim_x = float(W - win - 2)       # python floats: the kernel must not
    lim_y = float(H - win - 2)       # close over traced constants

    def kernel(ptsT_ref, pts0_ref, frozen0_ref,       # scalar prefetch (SMEM)
               prev_ref, gx_ref, gy_ref, cur_ref,     # whole level in VMEM
               out_ref, flag_ref):                    # SMEM flat [2N], [N]
        pid = pl.program_id(0)
        r = win // 2
        for b in range(kp):
            i = pid * kp + b
            # --- template + gradient windows at the prev position
            tx = ptsT_ref[2 * i] - r
            ty = ptsT_ref[2 * i + 1] - r
            btx = jnp.clip(jnp.floor(tx), 0.0, lim_x)
            bty = jnp.clip(jnp.floor(ty), 0.0, lim_y)
            ftx = tx - btx
            fty = ty - bty
            btx_i = btx.astype(jnp.int32)
            bty_i = bty.astype(jnp.int32)
            T = make_sample(prev_ref, btx_i, bty_i, ftx, fty)
            Gx = make_sample(gx_ref, btx_i, bty_i, ftx, fty)
            Gy = make_sample(gy_ref, btx_i, bty_i, ftx, fty)

            gxx = jnp.sum(Gx * Gx)
            gxy = jnp.sum(Gx * Gy)
            gyy = jnp.sum(Gy * Gy)
            det = gxx * gyy - gxy * gxy
            trace = gxx + gyy
            me = (trace - jnp.sqrt(jnp.maximum(trace * trace - 4 * det,
                                               0.0))) * 0.5
            good_g = (me / (win * win)) > min_eig
            inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)

            def cond(carry):
                it, lx, ly, frozen = carry
                return (it < iters) & jnp.logical_not(frozen)

            def body(carry, T=T, Gx=Gx, Gy=Gy, gxx=gxx, gxy=gxy, gyy=gyy,
                     inv_det=inv_det):
                it, lx, ly, frozen = carry
                # window top-left (global) of the current estimate
                bx = jnp.clip(jnp.floor(lx), 0.0, lim_x)
                by = jnp.clip(jnp.floor(ly), 0.0, lim_y)
                fx = lx - bx
                fy = ly - by
                I = make_sample(cur_ref, bx.astype(jnp.int32),
                                by.astype(jnp.int32), fx, fy)
                diff = T - I
                bxs = jnp.sum(diff * Gx)
                bys = jnp.sum(diff * Gy)
                dx = (gyy * bxs - gxy * bys) * inv_det
                dy = (gxx * bys - gxy * bxs) * inv_det
                nlx = lx + dx
                nly = ly + dy
                converged = dx * dx + dy * dy < eps * eps
                oob = (nlx < 0.0) | (nly < 0.0) | (nlx > lim_x) | (nly > lim_y)
                return it + 1, nlx, nly, converged | oob

            lx0 = pts0_ref[2 * i] - r
            ly0 = pts0_ref[2 * i + 1] - r
            frozen0 = frozen0_ref[i] > 0
            oob0 = (lx0 < 0.0) | (ly0 < 0.0) | (lx0 > lim_x) | (ly0 > lim_y)
            _, lx, ly, _ = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), lx0, ly0,
                 frozen0 | oob0 | jnp.logical_not(good_g)))
            out_ref[2 * i] = lx + r
            out_ref[2 * i + 1] = ly + r
            flag_ref[i] = good_g.astype(jnp.int32)

    return kernel


def _make_vmem_kernel(win: int, H: int, W: int, iters: int, eps: float,
                      min_eig: float, kp: int):
    """Kernel with the WHOLE level resident in VMEM (see lk_level_vmem)."""

    def img_window(ref, bx_i, by_i):
        """[win+1, win+1] window at dynamic global integer (bx, by).

        Both offsets are reduced to a tile-aligned slab origin (lanes: 128,
        sublanes: 8) + power-of-2 rotates, exactly as the HBM-patch kernel
        does — but the load comes straight from the VMEM-resident image, so
        there is NO per-keypoint DMA."""
        base_y = jnp.minimum((by_i // 8) * 8, H - 32)
        base_y = pl.multiple_of(base_y, 8)
        base_x = jnp.minimum((bx_i // 128) * 128, W - LANES)
        base_x = pl.multiple_of(base_x, 128)
        slab = ref[pl.ds(base_y, 32), pl.ds(base_x, LANES)]
        slab = pltpu.roll(slab, -(by_i - base_y), axis=0)
        rolled = pltpu.roll(slab[:win + 1, :], -(bx_i - base_x), axis=1)
        return rolled[:, :win + 1]

    def sample(ref, bx_i, by_i, fx, fy):
        return _blend(img_window(ref, bx_i, by_i), fx, fy, win)

    return _make_serial_vmem_kernel(win, H, W, iters, eps, min_eig, kp,
                                    sample)


def _make_vmem_pk_kernel(win: int, H: int, W: int, iters: int, eps: float,
                         min_eig: float, kp: int, x_mm: bool):
    """Per-keypoint matmul-sampling kernel (VMEM-resident images).

    Same serial structure and individual early exit as _make_vmem_kernel
    (shared via _make_serial_vmem_kernel), but the per-iteration window
    sample replaces the [32, LANES] dynamic sublane roll + 4-corner blend
    with ONE tiny MXU matmul:

        sampled = By[16, 32] @ slab[32, LANES]

    where By is a banded "two-hot" interpolation matrix whose row i puts
    (1-fy) at column rem+i and fy at column rem+i+1 — the dynamic sub-8 y
    offset AND the fractional y blend ride the matmul. The x offset is then
    either a power-of-2 lane roll + 2-term fractional blend (x_mm=False,
    'ymm') or a second two-hot matmul sampled @ Bx^T (x_mm=True, 'pkmm')
    that leaves a dense [16, 16] window for the residual math.
    """
    YR = 16                     # output rows: sublane-aligned, >= win
    f32 = jnp.float32

    def slab_base(bx_i, by_i):
        base_y = jnp.minimum((by_i // 8) * 8, H - 32)
        base_y = pl.multiple_of(base_y, 8)
        base_x = jnp.minimum((bx_i // 128) * 128, W - LANES)
        base_x = pl.multiple_of(base_x, 128)
        return base_x, base_y

    def build_by(rem, fy):
        """[YR, 32] two-hot y-interpolation matrix (rows >= win are zero)."""
        ii = jax.lax.broadcasted_iota(jnp.int32, (YR, 32), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (YR, 32), 1)
        live = ii < win
        tgt = rem + ii
        return (jnp.where(live & (jj == tgt), 1.0 - fy, 0.0)
                + jnp.where(live & (jj == tgt + 1), fy, 0.0))

    def build_bx(rem, fx):
        """[YR, LANES] two-hot x-interpolation matrix."""
        ii = jax.lax.broadcasted_iota(jnp.int32, (YR, LANES), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (YR, LANES), 1)
        live = ii < win
        tgt = rem + ii
        return (jnp.where(live & (jj == tgt), 1.0 - fx, 0.0)
                + jnp.where(live & (jj == tgt + 1), fx, 0.0))

    def sample(ref, bx_i, by_i, fx, fy):
        """Bilinear [*, win(+pad)] window at dynamic (bx+fx, by+fy)."""
        base_x, base_y = slab_base(bx_i, by_i)
        slab = ref[pl.ds(base_y, 32), pl.ds(base_x, LANES)]    # [32, LANES]
        By = build_by(by_i - base_y, fy)
        sampled = jax.lax.dot_general(By, slab, (((1,), (0,)), ((), ())),
                                      preferred_element_type=f32)
        if x_mm:
            Bx = build_bx(bx_i - base_x, fx)
            return jax.lax.dot_general(sampled, Bx, (((1,), (1,)), ((), ())),
                                       preferred_element_type=f32)  # [YR, YR]
        rolled = pltpu.roll(sampled, -(bx_i - base_x), axis=1)
        return (1.0 - fx) * rolled[:, :win] + fx * rolled[:, 1:win + 1]

    return _make_serial_vmem_kernel(win, H, W, iters, eps, min_eig, kp,
                                    sample)


@functools.partial(jax.jit, static_argnames=("win", "iters", "eps",
                                             "min_eig", "x_mm", "interpret"))
def lk_level_vmem_pk(img_prev: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray,
                     img_cur: jnp.ndarray, pts_prev: jnp.ndarray,
                     pts_guess: jnp.ndarray, frozen0: jnp.ndarray,
                     win: int, iters: int, eps: float, min_eig: float,
                     x_mm: bool = False,
                     interpret: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-keypoint matmul-sampling KLT level. Same contract as
    lk_level_vmem; x_mm selects the second (x) matmul ('pkmm') over the
    lane-roll + 2-term blend ('ymm').

    Hardware status: compiles and runs correctly on the v5e (verified
    2026-08-21, scripts/profile_lk_kernels.py) but measures ~25% slower
    than the serial roll/blend kernel on real texture — kept as a
    measured-and-rejected alternative, not the production default."""
    n = pts_prev.shape[0]
    H, W = img_cur.shape
    assert H % 8 == 0 and H >= 32 and W % 128 == 0 and W >= LANES
    # the two-hot interpolation matrices are [YR=16, ...]: rows beyond 16
    # would be silently dropped, truncating the window (advisor finding)
    assert win <= 16, f"lk_level_vmem_pk supports win <= 16, got {win}"
    kp = min(KP_PER_PROG, n)
    n_pad = -(-n // kp) * kp
    if n_pad != n:
        d = n_pad - n
        pts_prev = jnp.concatenate([pts_prev, jnp.zeros((d, 2), jnp.float32)])
        pts_guess = jnp.concatenate([pts_guess, jnp.zeros((d, 2), jnp.float32)])
        frozen0 = jnp.concatenate([frozen0, jnp.ones((d, 1), jnp.int32)])
    kernel = _make_vmem_pk_kernel(win, H, W, iters, eps, min_eig, kp, x_mm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pad // kp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
    )
    out, flag = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((2 * n_pad,), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.int32)],
        interpret=interpret,
    )(pts_prev.reshape(-1), pts_guess.reshape(-1), frozen0.reshape(-1),
      img_prev, gx, gy, img_cur)
    return out[: 2 * n].reshape(n, 2), flag[:n].reshape(n, 1)


def _make_vmem_sw_kernel(win: int, H: int, W: int, iters: int, eps: float,
                         min_eig: float, kp: int):
    """Serial kernel with the dynamic sublane roll replaced by a static-
    slice switch (PERF.md lever: the [32, LANES] pltpu.roll on the sublane
    axis is the costliest op of the serial loop; a lax.switch over the
    sub-slab row offset selects one of 32-win-1 STATIC slices instead —
    static sublane shifts compile to fixed shuffles, and only the selected
    branch executes)."""
    n_rem = 32 - win - 1          # row offset within the 8-aligned slab:
                                  # 0..7 normally, up to 32-win-2 when the
                                  # slab origin clamps at H-32

    def img_window(ref, bx_i, by_i):
        base_y = jnp.minimum((by_i // 8) * 8, H - 32)
        base_y = pl.multiple_of(base_y, 8)
        base_x = jnp.minimum((bx_i // 128) * 128, W - LANES)
        base_x = pl.multiple_of(base_x, 128)
        slab = ref[pl.ds(base_y, 32), pl.ds(base_x, LANES)]
        rows = jax.lax.switch(
            by_i - base_y,
            [(lambda s: lambda: slab[s:s + win + 1, :])(s)
             for s in range(n_rem)])
        rolled = pltpu.roll(rows, -(bx_i - base_x), axis=1)
        return rolled[:, :win + 1]

    def sample(ref, bx_i, by_i, fx, fy):
        return _blend(img_window(ref, bx_i, by_i), fx, fy, win)

    return _make_serial_vmem_kernel(win, H, W, iters, eps, min_eig, kp,
                                    sample)


@functools.partial(jax.jit, static_argnames=("win", "iters", "eps",
                                             "min_eig", "interpret"))
def lk_level_vmem_sw(img_prev: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray,
                     img_cur: jnp.ndarray, pts_prev: jnp.ndarray,
                     pts_guess: jnp.ndarray, frozen0: jnp.ndarray,
                     win: int, iters: int, eps: float, min_eig: float,
                     interpret: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-slice-switch KLT level. Same contract as lk_level_vmem.

    Measured on the v5e (2026-08-21): ~20% SLOWER than the dynamic-roll
    serial kernel (23.6 vs 19.4 ms easy / 51.2 vs 45.2 ms hard per 4-rep
    512-keypoint chain) — the per-iteration branch dispatch costs more
    than the pow2 sublane roll it replaces. Kept as the measured answer
    to PERF.md's 'static-slice switch' lever."""
    n = pts_prev.shape[0]
    H, W = img_cur.shape
    assert H % 8 == 0 and H >= 32 and W % 128 == 0 and W >= LANES
    kp = min(KP_PER_PROG, n)
    n_pad = -(-n // kp) * kp
    if n_pad != n:
        d = n_pad - n
        pts_prev = jnp.concatenate([pts_prev, jnp.zeros((d, 2), jnp.float32)])
        pts_guess = jnp.concatenate([pts_guess, jnp.zeros((d, 2), jnp.float32)])
        frozen0 = jnp.concatenate([frozen0, jnp.ones((d, 1), jnp.int32)])
    kernel = _make_vmem_sw_kernel(win, H, W, iters, eps, min_eig, kp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pad // kp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
    )
    out, flag = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((2 * n_pad,), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.int32)],
        interpret=interpret,
    )(pts_prev.reshape(-1), pts_guess.reshape(-1), frozen0.reshape(-1),
      img_prev, gx, gy, img_cur)
    return out[: 2 * n].reshape(n, 2), flag[:n].reshape(n, 1)


# VMEM budget for the 4 resident planes (v5e has ~16 MiB more generally
# shared with scratch; leave headroom for the compiler)
VMEM_PLANE_BUDGET = 12 << 20


@functools.partial(jax.jit, static_argnames=("win", "iters", "eps",
                                             "min_eig", "interpret"))
def lk_level_vmem(img_prev: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray,
                  img_cur: jnp.ndarray, pts_prev: jnp.ndarray,
                  pts_guess: jnp.ndarray, frozen0: jnp.ndarray,
                  win: int, iters: int, eps: float, min_eig: float,
                  interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KLT level with the whole level VMEM-resident (no per-keypoint DMA).

    The HBM-patch kernel (lk_level_pallas) issues 4 patch DMAs per keypoint
    — ~2000 DMAs per 512-keypoint call, which dominates its runtime
    (measured: iters=1 costs 58% of iters=30). At KITTI resolution all four
    planes fit in VMEM, so this kernel reads tile-aligned slabs straight
    from the image instead. Inputs must be padded: H % 8 == 0, H >= 32,
    W % 128 == 0, W >= 256 (the wrapper in ops/lk.py guarantees it).

    pts_prev/pts_guess: [N, 2] global (x, y) in this level's coordinates.
    Returns (pts_out [N, 2] global, good_flag [N, 1] int32).
    """
    n = pts_prev.shape[0]
    H, W = img_cur.shape
    assert H % 8 == 0 and H >= 32 and W % 128 == 0 and W >= LANES
    kp = min(KP_PER_PROG, n)
    n_pad = -(-n // kp) * kp
    if n_pad != n:
        d = n_pad - n
        pts_prev = jnp.concatenate([pts_prev, jnp.zeros((d, 2), jnp.float32)])
        pts_guess = jnp.concatenate([pts_guess, jnp.zeros((d, 2), jnp.float32)])
        frozen0 = jnp.concatenate([frozen0, jnp.ones((d, 1), jnp.int32)])
    kernel = _make_vmem_kernel(win, H, W, iters, eps, min_eig, kp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pad // kp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
    )
    out, flag = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((2 * n_pad,), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.int32)],
        interpret=interpret,
    )(pts_prev.reshape(-1), pts_guess.reshape(-1), frozen0.reshape(-1),
      img_prev, gx, gy, img_cur)
    return out[: 2 * n].reshape(n, 2), flag[:n].reshape(n, 1)


@functools.partial(jax.jit, static_argnames=("win", "pty", "pcy", "iters",
                                             "eps", "min_eig", "interpret"))
def lk_level_pallas(img_prev: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray,
                    img_cur: jnp.ndarray,
                    tl_prev: jnp.ndarray, tl_cur: jnp.ndarray,
                    localT: jnp.ndarray, local0: jnp.ndarray,
                    frozen0: jnp.ndarray,
                    win: int, pty: int, pcy: int, iters: int,
                    eps: float, min_eig: float,
                    interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the KLT level kernel. All patch-coordinate inputs precomputed.

    tl_prev/tl_cur: [N, 2] int32 clamped patch origins (x, y); patches span
      [y : y+pty/pcy, x : x+128].
    localT/local0:  [N, 2] f32 window top-left inside the patches.
    frozen0:        [N, 1] int32 pre-frozen mask.
    Returns (local_out [N, 2] f32, good_flag [N, 1] int32).
    """
    n = tl_prev.shape[0]
    assert pty % 8 == 0 and pcy % 8 == 0, "patch rows must be 8-aligned"
    kp = min(KP_PER_PROG, n)
    n_pad = -(-n // kp) * kp
    if n_pad != n:
        d = n_pad - n
        tl_prev = jnp.concatenate([tl_prev, jnp.zeros((d, 2), jnp.int32)])
        tl_cur = jnp.concatenate([tl_cur, jnp.zeros((d, 2), jnp.int32)])
        localT = jnp.concatenate([localT, jnp.zeros((d, 2), jnp.float32)])
        local0 = jnp.concatenate([local0, jnp.zeros((d, 2), jnp.float32)])
        frozen0 = jnp.concatenate([frozen0, jnp.ones((d, 1), jnp.int32)])
    kernel = _make_kernel(win, pty, pcy, iters, eps, min_eig, kp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_pad // kp,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # prev
            pl.BlockSpec(memory_space=pl.ANY),   # gx
            pl.BlockSpec(memory_space=pl.ANY),   # gy
            pl.BlockSpec(memory_space=pl.ANY),   # cur
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((kp, pty, LANES), jnp.float32),
            pltpu.VMEM((kp, pty, LANES), jnp.float32),
            pltpu.VMEM((kp, pty, LANES), jnp.float32),
            pltpu.VMEM((kp, pcy, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((kp, 4)),
        ],
    )
    out, flag = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((2 * n_pad,), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.int32)],
        interpret=interpret,
    )(tl_prev.reshape(-1), tl_cur.reshape(-1), localT.reshape(-1),
      local0.reshape(-1), frozen0.reshape(-1), img_prev, gx, gy, img_cur)
    return out[: 2 * n].reshape(n, 2), flag[:n].reshape(n, 1)


# ---------------------------------------------------------------------------
# Matmul-sampling kernel: a keypoint GROUP tracked in lockstep, with every
# window sample expressed as two MXU matmuls instead of per-keypoint serial
# roll/blend VPU work.
#
# Key idea: bilinear window sampling is a linear map of the patch. For a
# window at (x, y) = (bx + fx, by + fy), the sampled [win, win] window is
#     W = By @ P @ Bx^T
# where By[i, j] = (1-fy)*[j == by+i] + fy*[j == by+i+1] (a banded "two-hot"
# interpolation matrix) and Bx likewise for columns. Stacking a group of
# MM_KP keypoints block-diagonally gives ONE [128, 256] @ [256, 256] @
# [256, 128] matmul chain per iteration for the whole group — the dynamic
# integer offset AND the fractional blend are absorbed into By/Bx, so there
# are no gathers, no rolls, and the FLOPs ride the MXU.
# ---------------------------------------------------------------------------

MM_KP = 8       # keypoints per group: 8 x 32 slab rows = 256 = one lane tile
MM_BW = 16      # padded per-keypoint block stride in the window dimension
MM_SLAB = 32    # slab rows per keypoint (win+1 taps after an 8-aligned base)


def _make_vmem_mm_kernel(win: int, H: int, W: int, iters: int, eps: float,
                         min_eig: float, kp: int, dtype):
    """Lockstep group kernel; images VMEM-resident (same contract as
    _make_vmem_kernel). dtype is the matmul input dtype (f32 or bf16;
    accumulation is always f32)."""
    KS = kp * MM_SLAB           # slab-stack rows (= By contraction dim)
    KR = kp * MM_BW             # By/Bx rows (= window block dim)
    lim_x = float(W - win - 2)
    lim_y = float(H - win - 2)
    f32 = jnp.float32

    def slab_base(bx_i, by_i):
        base_y = jnp.minimum((by_i // 8) * 8, H - MM_SLAB)
        base_y = pl.multiple_of(base_y, 8)
        base_x = jnp.minimum((bx_i // 128) * 128, W - LANES)
        base_x = pl.multiple_of(base_x, 128)
        return base_x, base_y

    def write_interp_blocks(By, Bx, b, lx, ly, ftx, fty):
        """Write keypoint b's two-hot row/col interpolation blocks.

        lx/ly: integer window top-left RELATIVE to its slab origin (scalars);
        ftx/fty: fractional parts. Rows beyond `win` stay zero, which zeroes
        the padded rows/cols of every downstream product."""
        ii = jax.lax.broadcasted_iota(jnp.int32, (MM_BW, KS), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (MM_BW, KS), 1)
        live = ii < win
        tgt = ly + b * MM_SLAB + ii
        wy = (jnp.where(live & (jj == tgt), 1.0 - fty, 0.0)
              + jnp.where(live & (jj == tgt + 1), fty, 0.0))
        By[b * MM_BW:(b + 1) * MM_BW, :] = wy.astype(dtype)
        ii2 = jax.lax.broadcasted_iota(jnp.int32, (MM_BW, LANES), 0)
        jj2 = jax.lax.broadcasted_iota(jnp.int32, (MM_BW, LANES), 1)
        live2 = ii2 < win
        tgt2 = lx + ii2
        wx = (jnp.where(live2 & (jj2 == tgt2), 1.0 - ftx, 0.0)
              + jnp.where(live2 & (jj2 == tgt2 + 1), ftx, 0.0))
        Bx[b * MM_BW:(b + 1) * MM_BW, :] = wx.astype(dtype)

    def sample_all(By, Bx, Sbuf):
        """[KR, KR] f32: block (b, b) holds keypoint b's interpolated
        [win, win] window (padded with zeros to MM_BW)."""
        R = jax.lax.dot_general(By[:], Sbuf[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
        return jax.lax.dot_general(R.astype(dtype), Bx[:],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    def make_block_sums():
        """S = A @ P @ A^T with A the static block indicator: S[b, b] is the
        sum of P's (b, b) block. Keeps the per-keypoint window reductions on
        the MXU instead of 2*kp lane-shuffled [16,16] slice-reduces per
        iteration (measured: the slice-reduces dominated the loop)."""
        bi = jax.lax.broadcasted_iota(jnp.int32, (KR, KR), 0)
        bj = jax.lax.broadcasted_iota(jnp.int32, (KR, KR), 1)
        A = (bj // MM_BW == bi).astype(f32)

        def block_sums(P):
            AP = jax.lax.dot_general(A, P, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            return jax.lax.dot_general(AP, A, (((1,), (1,)), ((), ())),
                                       preferred_element_type=f32)
        return block_sums

    def kernel(ptsT_ref, pts0_ref, frozen0_ref,        # scalar prefetch
               prev_ref, gx_ref, gy_ref, cur_ref,      # whole level in VMEM
               out_ref, flag_ref,                      # SMEM flat [2N], [N]
               Sbuf, By, Bx, Tf, Gxf, Gyf):            # VMEM scratch
        pid = pl.program_id(0)
        r = win // 2

        # ---- template phase: one By/Bx build + 3 sampled planes
        bases = []
        for b in range(kp):
            i = pid * kp + b
            tx = ptsT_ref[2 * i] - r
            ty = ptsT_ref[2 * i + 1] - r
            btx = jnp.clip(jnp.floor(tx), 0.0, lim_x)
            bty = jnp.clip(jnp.floor(ty), 0.0, lim_y)
            ftx = tx - btx
            fty = ty - bty
            bx_i = btx.astype(jnp.int32)
            by_i = bty.astype(jnp.int32)
            base_x, base_y = slab_base(bx_i, by_i)
            bases.append((base_x, base_y))
            write_interp_blocks(By, Bx, b, bx_i - base_x, by_i - base_y,
                                ftx, fty)
        for b, (base_x, base_y) in enumerate(bases):
            Sbuf[b * MM_SLAB:(b + 1) * MM_SLAB, :] = \
                prev_ref[pl.ds(base_y, MM_SLAB), pl.ds(base_x, LANES)] \
                .astype(dtype)
        Tf[:] = sample_all(By, Bx, Sbuf)
        for b, (base_x, base_y) in enumerate(bases):
            Sbuf[b * MM_SLAB:(b + 1) * MM_SLAB, :] = \
                gx_ref[pl.ds(base_y, MM_SLAB), pl.ds(base_x, LANES)] \
                .astype(dtype)
        Gxf[:] = sample_all(By, Bx, Sbuf)
        for b, (base_x, base_y) in enumerate(bases):
            Sbuf[b * MM_SLAB:(b + 1) * MM_SLAB, :] = \
                gy_ref[pl.ds(base_y, MM_SLAB), pl.ds(base_x, LANES)] \
                .astype(dtype)
        Gyf[:] = sample_all(By, Bx, Sbuf)

        # ---- per-keypoint normal-equation constants + init state
        block_sums = make_block_sums()
        Gx_all = Gxf[:]
        Gy_all = Gyf[:]
        S_gxx = block_sums(Gx_all * Gx_all)
        S_gxy = block_sums(Gx_all * Gy_all)
        S_gyy = block_sums(Gy_all * Gy_all)
        lxs, lys, frs = [], [], []
        gxxs, gxys, gyys, invds = [], [], [], []
        for b in range(kp):
            i = pid * kp + b
            gxx = S_gxx[b, b]
            gxy = S_gxy[b, b]
            gyy = S_gyy[b, b]
            det = gxx * gyy - gxy * gxy
            trace = gxx + gyy
            me = (trace - jnp.sqrt(jnp.maximum(trace * trace - 4 * det,
                                               0.0))) * 0.5
            good_g = (me / (win * win)) > min_eig
            inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
            lx0 = pts0_ref[2 * i] - r
            ly0 = pts0_ref[2 * i + 1] - r
            oob0 = (lx0 < 0.0) | (ly0 < 0.0) | (lx0 > lim_x) | (ly0 > lim_y)
            frozen0 = (frozen0_ref[i] > 0) | oob0 | jnp.logical_not(good_g)
            lxs.append(lx0)
            lys.append(ly0)
            frs.append(frozen0)
            gxxs.append(gxx)
            gxys.append(gxy)
            gyys.append(gyy)
            invds.append(inv_det)
            flag_ref[i] = good_g.astype(jnp.int32)

        # ---- lockstep iteration loop: exits when every keypoint in the
        # group has converged / frozen (coarser-grained than the serial
        # kernel's per-keypoint exit, but each iteration is ~one matmul)
        def cond(carry):
            it = carry[0]
            frozen = carry[1 + 2 * kp:]
            any_active = functools.reduce(
                jnp.logical_or, [jnp.logical_not(f) for f in frozen])
            return (it < iters) & any_active

        def body(carry):
            it = carry[0]
            lx = list(carry[1:1 + kp])
            ly = list(carry[1 + kp:1 + 2 * kp])
            fr = list(carry[1 + 2 * kp:])
            for b in range(kp):
                bx = jnp.clip(jnp.floor(lx[b]), 0.0, lim_x)
                by = jnp.clip(jnp.floor(ly[b]), 0.0, lim_y)
                fx = lx[b] - bx
                fy = ly[b] - by
                bx_i = bx.astype(jnp.int32)
                by_i = by.astype(jnp.int32)
                base_x, base_y = slab_base(bx_i, by_i)

                @pl.when(jnp.logical_not(fr[b]))
                def _(b=b, base_x=base_x, base_y=base_y, bx_i=bx_i,
                      by_i=by_i, fx=fx, fy=fy):
                    write_interp_blocks(By, Bx, b, bx_i - base_x,
                                        by_i - base_y, fx, fy)
                    Sbuf[b * MM_SLAB:(b + 1) * MM_SLAB, :] = \
                        cur_ref[pl.ds(base_y, MM_SLAB),
                                pl.ds(base_x, LANES)].astype(dtype)

            If = sample_all(By, Bx, Sbuf)
            diff = Tf[:] - If
            S_bx = block_sums(diff * Gx_all)
            S_by = block_sums(diff * Gy_all)
            out_lx, out_ly, out_fr = [], [], []
            for b in range(kp):
                bxs = S_bx[b, b]
                bys = S_by[b, b]
                dx = (gyys[b] * bxs - gxys[b] * bys) * invds[b]
                dy = (gxxs[b] * bys - gxys[b] * bxs) * invds[b]
                nlx = lx[b] + dx
                nly = ly[b] + dy
                converged = dx * dx + dy * dy < eps * eps
                oob = ((nlx < 0.0) | (nly < 0.0)
                       | (nlx > lim_x) | (nly > lim_y))
                out_lx.append(jnp.where(fr[b], lx[b], nlx))
                out_ly.append(jnp.where(fr[b], ly[b], nly))
                out_fr.append(fr[b] | converged | oob)
            return (it + 1, *out_lx, *out_ly, *out_fr)

        final = jax.lax.while_loop(cond, body,
                                   (jnp.int32(0), *lxs, *lys, *frs))
        for b in range(kp):
            i = pid * kp + b
            out_ref[2 * i] = final[1 + b] + r
            out_ref[2 * i + 1] = final[1 + kp + b] + r

    return kernel


@functools.partial(jax.jit, static_argnames=("win", "iters", "eps",
                                             "min_eig", "use_bf16",
                                             "interpret"))
def lk_level_vmem_mm(img_prev: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray,
                     img_cur: jnp.ndarray, pts_prev: jnp.ndarray,
                     pts_guess: jnp.ndarray, frozen0: jnp.ndarray,
                     win: int, iters: int, eps: float, min_eig: float,
                     use_bf16: bool = True,
                     interpret: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Matmul-sampling KLT level (VMEM-resident images, lockstep groups).

    Same contract as lk_level_vmem. use_bf16 runs the sampling matmuls with
    bf16 inputs / f32 accumulation (~2-4x MXU rate; the interpolation-weight
    quantization is <0.4% of a pixel, far below the tracker's chi2/FB gates).
    """
    n = pts_prev.shape[0]
    H, W = img_cur.shape
    assert H % 8 == 0 and H >= MM_SLAB and W % 128 == 0 and W >= LANES
    kp = min(MM_KP, n)
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    n_pad = -(-n // kp) * kp
    if n_pad != n:
        d = n_pad - n
        pts_prev = jnp.concatenate([pts_prev, jnp.zeros((d, 2), jnp.float32)])
        pts_guess = jnp.concatenate([pts_guess, jnp.zeros((d, 2), jnp.float32)])
        frozen0 = jnp.concatenate([frozen0, jnp.ones((d, 1), jnp.int32)])
    kernel = _make_vmem_mm_kernel(win, H, W, iters, eps, min_eig, kp, dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pad // kp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((kp * MM_SLAB, LANES), dtype),        # slab stack
            pltpu.VMEM((kp * MM_BW, kp * MM_SLAB), dtype),   # By
            pltpu.VMEM((kp * MM_BW, LANES), dtype),          # Bx
            pltpu.VMEM((kp * MM_BW, kp * MM_BW), jnp.float32),  # T
            pltpu.VMEM((kp * MM_BW, kp * MM_BW), jnp.float32),  # Gx
            pltpu.VMEM((kp * MM_BW, kp * MM_BW), jnp.float32),  # Gy
        ],
    )
    imgs = (img_prev, gx, gy, img_cur)
    if use_bf16:
        imgs = tuple(im.astype(jnp.bfloat16) for im in imgs)
    out, flag = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((2 * n_pad,), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.int32)],
        interpret=interpret,
    )(pts_prev.reshape(-1), pts_guess.reshape(-1), frozen0.reshape(-1),
      *imgs)
    return out[: 2 * n].reshape(n, 2), flag[:n].reshape(n, 1)
