"""Compare compiled LK kernel variants on the real TPU.

Variants (Settings.lk_kernel / LKParams.kernel):
  serial - per-keypoint roll/blend VMEM kernel (production default)
  ymm    - serial loop, y-offset+blend as a [16,32]@[32,256] MXU matmul,
           x via lane roll + 2-term blend
  pkmm   - both offsets as two-hot matmuls (dense [16,16] window)
  mm_f32 - lockstep 8-keypoint group, all sampling as one matmul chain

Dispatch-train timing (PERF.md methodology): each variant runs a
4-repetition track chain inside one jit, on KITTI-resolution synthetic
texture, so per-dispatch tunnel latency amortizes. Easy-flow (small true
motion) and hard-flow (random imagery, max iterations) cases bound the
early-exit behavior.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ssvio_tpu.dataio import synthetic
from ssvio_tpu.ops import lk, pyramid


def timeit(name, fn, n=6):
    try:
        jax.block_until_ready(fn())      # compile
        t0 = time.time()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        print(f"{name:44s} {(time.time() - t0) / n * 1e3:8.2f} ms",
              flush=True)
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    H, W = 384, 1280

    # KITTI-resolution textured frames with known small camera motion
    world = synthetic.SyntheticWorld(seed=4)
    poses = synthetic.straight_trajectory(2, speed=0.6)
    L, _ = synthetic.render_stereo_sequence(
        world, poses, 718.0, 718.0, 607.0, 185.0, 0.54, 1241, 376)
    pad0 = np.zeros((H, W), np.float32); pad0[:376, :1241] = L[0]
    pad1 = np.zeros((H, W), np.float32); pad1[:376, :1241] = L[1]
    noise0 = rng.uniform(0, 255, (H, W)).astype(np.float32)
    noise1 = rng.uniform(0, 255, (H, W)).astype(np.float32)

    N = 512
    pts = np.stack([rng.uniform(20, 1220, N),
                    rng.uniform(20, 360, N)], -1).astype(np.float32)
    pts = jnp.asarray(pts)
    valid = jnp.ones((N,), bool)

    for tag, a, b in (("easy", pad0, pad1), ("hard", noise0, noise1)):
        pyr0 = pyramid.build_lk_pyramid(jnp.asarray(a), 3)
        pyr1 = pyramid.build_lk_pyramid(jnp.asarray(b), 3)
        g0 = [pyramid.sobel_gradients(l) for l in pyr0]
        grads0 = (tuple(g[0] for g in g0), tuple(g[1] for g in g0))
        for kern in ("serial", "sw", "ymm", "pkmm", "mm_f32"):
            prm = lk.LKParams(backend="pallas", kernel=kern)

            def chain(prm=prm, pyr0=pyr0, pyr1=pyr1, grads0=grads0, reps=4):
                def body(c, _):
                    p, v = c
                    out, ok, _ = lk.track(pyr0, pyr1, p, p + 0.01, v, prm,
                                          compute_err=False,
                                          grads_prev=grads0)
                    return (out, v & ok), ()
                (p, v), _ = jax.lax.scan(body, (pts, valid), None,
                                         length=reps)
                return p
            timeit(f"{tag}: {kern} 4x512-kp track (3 lvl)", jax.jit(chain))


if __name__ == "__main__":
    main()
