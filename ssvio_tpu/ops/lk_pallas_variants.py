"""Measured-and-rejected Pallas LK kernel variants (quarantine module).

The production kernel is lk_pallas.lk_level_vmem (serial roll/blend); the
hardware shootout that settled it is recorded in PERF.md (v5e, 2026-08-21,
4-rep 512-keypoint 3-level chain):

    | kernel | easy flow | hard (random) |
    |---|---|---|
    | serial (roll+blend)      | 19.4 ms | 45.2 ms |
    | sw (static-slice switch) | 23.6    | 51.2    |
    | ymm (y-matmul sample)    | 24.2    | 56.2    |
    | pkmm (xy-matmul sample)  | 24.1    | 54.2    |
    | mm_f32 (lockstep groups) | 34.5    | 54.2    |

These variants stay selectable through LKParams.kernel ('sw', 'ymm',
'pkmm', 'mm', 'mm_f32') and parity-tested against the XLA path, but live
here so the production module carries exactly one kernel body. All three
build on the shared serial loop / plumbing in lk_pallas
(_make_serial_vmem_kernel, pad_to_kp, run_vmem_kernel), so the KLT loop
logic cannot drift between variants.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssvio_tpu.ops.lk_pallas import (
    LANES, KP_PER_PROG, _blend, _make_serial_vmem_kernel, pad_to_kp,
    run_vmem_kernel)


def _make_vmem_pk_kernel(win: int, H: int, W: int, iters: int, eps: float,
                         min_eig: float, kp: int, x_mm: bool):
    """Per-keypoint matmul-sampling kernel (VMEM-resident images).

    Same serial structure and individual early exit as the production
    kernel (shared via _make_serial_vmem_kernel), but the per-iteration
    window sample replaces the [32, LANES] dynamic sublane roll + 4-corner
    blend with ONE tiny MXU matmul:

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
    than the serial roll/blend kernel on real texture."""
    n = pts_prev.shape[0]
    H, W = img_cur.shape
    assert H % 8 == 0 and H >= 32 and W % 128 == 0 and W >= LANES
    # the two-hot interpolation matrices are [YR=16, ...]: rows beyond 16
    # would be silently dropped, truncating the window (advisor finding)
    assert win <= 16, f"lk_level_vmem_pk supports win <= 16, got {win}"
    kp = min(KP_PER_PROG, n)
    n_pad, pts_prev, pts_guess, frozen0 = pad_to_kp(
        n, kp, pts_prev, pts_guess, frozen0)
    kernel = _make_vmem_pk_kernel(win, H, W, iters, eps, min_eig, kp, x_mm)
    return run_vmem_kernel(kernel, n, n_pad, kp, pts_prev, pts_guess,
                           frozen0, (img_prev, gx, gy, img_cur),
                           interpret=interpret)


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
    than the pow2 sublane roll it replaces."""
    n = pts_prev.shape[0]
    H, W = img_cur.shape
    assert H % 8 == 0 and H >= 32 and W % 128 == 0 and W >= LANES
    # branch list covers row offsets 0..30-win; the max reachable NORMAL
    # offset is 7, so win >= 24 would leave reachable offsets without a
    # branch and lax.switch silently clamps (advisor finding, r3)
    assert win <= 23, f"lk_level_vmem_sw supports win <= 23, got {win}"
    kp = min(KP_PER_PROG, n)
    n_pad, pts_prev, pts_guess, frozen0 = pad_to_kp(
        n, kp, pts_prev, pts_guess, frozen0)
    kernel = _make_vmem_sw_kernel(win, H, W, iters, eps, min_eig, kp)
    return run_vmem_kernel(kernel, n, n_pad, kp, pts_prev, pts_guess,
                           frozen0, (img_prev, gx, gy, img_cur),
                           interpret=interpret)
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
