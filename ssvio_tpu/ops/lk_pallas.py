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


# VMEM budget for the 4 resident planes (v5e has ~16 MiB more generally
# shared with scratch; leave headroom for the compiler)
VMEM_PLANE_BUDGET = 12 << 20


def pad_to_kp(n: int, kp: int, pts_prev, pts_guess, frozen0):
    """Pad the per-keypoint inputs to a multiple of the per-program count
    (padding lanes arrive pre-frozen). Returns (n_pad, pts_prev, pts_guess,
    frozen0)."""
    n_pad = -(-n // kp) * kp
    if n_pad != n:
        d = n_pad - n
        pts_prev = jnp.concatenate([pts_prev, jnp.zeros((d, 2), jnp.float32)])
        pts_guess = jnp.concatenate([pts_guess,
                                     jnp.zeros((d, 2), jnp.float32)])
        frozen0 = jnp.concatenate([frozen0, jnp.ones((d, 1), jnp.int32)])
    return n_pad, pts_prev, pts_guess, frozen0


def run_vmem_kernel(kernel, n: int, n_pad: int, kp: int, pts_prev, pts_guess,
                    frozen0, imgs, scratch_shapes=(), interpret=False):
    """Shared pallas_call plumbing for every VMEM-resident level kernel:
    3 flat scalar-prefetch inputs, 4 VMEM image planes, 2 flat SMEM
    outputs. Returns (pts_out [n, 2] f32, good_flag [n, 1] int32)."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pad // kp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=list(scratch_shapes),
    )
    out, flag = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((2 * n_pad,), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.int32)],
        interpret=interpret,
    )(pts_prev.reshape(-1), pts_guess.reshape(-1), frozen0.reshape(-1),
      *imgs)
    return out[: 2 * n].reshape(n, 2), flag[:n].reshape(n, 1)


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
    n_pad, pts_prev, pts_guess, frozen0 = pad_to_kp(
        n, kp, pts_prev, pts_guess, frozen0)
    kernel = _make_vmem_kernel(win, H, W, iters, eps, min_eig, kp)
    return run_vmem_kernel(kernel, n, n_pad, kp, pts_prev, pts_guess,
                           frozen0, (img_prev, gx, gy, img_cur),
                           interpret=interpret)


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
