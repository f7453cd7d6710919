"""Microbench the VMEM-resident LK level kernel: iters scaling, keypoint
count scaling, and per-level cost on bench-like imagery."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ssvio_tpu.ops import lk_pallas, pyramid


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    # batch timing loop under one jit-free dispatch sequence
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:44s} {dt * 1e3:7.3f} ms")


def main():
    print("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    z = np.load(os.path.expanduser(
        "~/.cache/ssvio_tpu/bench_seed4_n320_1241x376_v1.npz"))
    img0 = z["L"][100].astype(np.float32)
    img1 = z["L"][101].astype(np.float32)
    H, W = 384, 1280
    pad0 = np.zeros((H, W), np.float32); pad0[:376, :1241] = img0
    pad1 = np.zeros((H, W), np.float32); pad1[:376, :1241] = img1

    N = 512
    pyr0 = [np.asarray(x) for x in pyramid.build_lk_pyramid(jnp.asarray(pad0), 4)]
    pyr1 = [np.asarray(x) for x in pyramid.build_lk_pyramid(jnp.asarray(pad1), 4)]

    for lvl in [0, 1, 2, 3]:
        imgP = jnp.asarray(pyr0[lvl])
        imgC = jnp.asarray(pyr1[lvl])
        gx, gy = pyramid.sobel_gradients(imgP)
        h, w = imgP.shape
        if h < 32 or w < 256:
            print(f"level {lvl}: {h}x{w} below kernel minimum, skipped")
            continue
        pts = np.stack([rng.uniform(20, w - 20, N),
                        rng.uniform(20, h - 20, N)], -1).astype(np.float32)
        pts = jnp.asarray(pts)
        frozen = jnp.zeros((N, 1), jnp.int32)
        for iters in ([1, 5, 30] if lvl == 0 else [30]):
            fn = lambda: lk_pallas.lk_level_vmem(
                imgP, gx, gy, imgC, pts, pts, frozen,
                win=11, iters=iters, eps=0.01, min_eig=1e-4)
            timeit(f"level {lvl} ({h}x{w}) N=512 iters={iters}", fn)

    # keypoint-count scaling at level 0
    imgP = jnp.asarray(pyr0[0]); imgC = jnp.asarray(pyr1[0])
    gx, gy = pyramid.sobel_gradients(imgP)
    for n_kp in [64, 128, 256, 512, 1024]:
        pts = np.stack([rng.uniform(20, 1280 - 20, n_kp),
                        rng.uniform(20, 384 - 20, n_kp)], -1).astype(np.float32)
        pts = jnp.asarray(pts)
        frozen = jnp.zeros((n_kp, 1), jnp.int32)
        fn = lambda: lk_pallas.lk_level_vmem(
            imgP, gx, gy, imgC, pts, pts, frozen,
            win=11, iters=30, eps=0.01, min_eig=1e-4)
        timeit(f"level 0 N={n_kp} iters=30", fn)


if __name__ == "__main__":
    main()
