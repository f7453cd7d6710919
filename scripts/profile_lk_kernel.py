"""Isolate the LK Pallas kernel's cost structure: DMA vs iteration compute."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ssvio_tpu import frontend as fe
from ssvio_tpu.config import Settings
from ssvio_tpu.dataio import synthetic
from ssvio_tpu.ops import lk
from ssvio_tpu.system import System


def timeit(name, fn, n=30):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:36s} {1e3 * (time.time() - t0) / n:8.2f} ms")


def main():
    s = Settings()
    s.max_features = 512
    world = synthetic.SyntheticWorld(seed=4)
    poses = synthetic.straight_trajectory(4, speed=0.6)
    L, R = synthetic.render_stereo_sequence(
        world, poses, s.cam_left.fx, s.cam_left.fy, s.cam_left.cx,
        s.cam_left.cy, s.baseline, s.image_width, s.image_height)
    sys_ = System(s, enable_backend=False, enable_loop_closing=False)
    front = sys_.frontend
    p0 = front.build_pyramid(sys_._pad(L[0]))
    p1 = front.build_pyramid(sys_._pad(L[1]))
    feat, _ = jax.jit(front._detect_merge)(
        p0.levels[0], fe.empty_feat_state(s.max_features))
    jax.block_until_ready((p0, p1, feat))

    for iters in (30, 8, 1):
        prm = front.lk_params._replace(iters=iters)
        fn = jax.jit(lambda prm=prm: lk.track(
            p0.levels, p1.levels, feat.xy, feat.xy, feat.valid, prm,
            compute_err=False, grads_prev=p0.grads))
        timeit(f"lk fwd 3-level iters={iters}", fn)

    # single level, vary kp-per-program via monkeypatch
    from ssvio_tpu.ops import lk_pallas
    for kp in (4, 8, 16, 32):
        lk_pallas.KP_PER_PROG = kp
        prm = front.lk_params
        fn = jax.jit(lambda kp=kp: lk.track(
            p0.levels, p1.levels, feat.xy, feat.xy, feat.valid,
            front.lk_params, compute_err=False, grads_prev=p0.grads))
        timeit(f"lk fwd 3-level KP_PER_PROG={kp}", fn)
    lk_pallas.KP_PER_PROG = 8


if __name__ == "__main__":
    main()
