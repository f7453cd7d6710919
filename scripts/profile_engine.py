"""Per-frame timing of the real engine step on bench-identical data.

Separates tracking frames from keyframe frames and compares the per-frame
jit path against the chunked lax.scan path to localize scan overhead.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ssvio_tpu import engine as eng
from ssvio_tpu import frontend as fe
from ssvio_tpu.config import Settings
from ssvio_tpu.dataio import synthetic
from ssvio_tpu.system import System


def main():
    s = Settings()
    s.max_features = 512
    s.max_landmarks = 8192
    s.min_init_landmarks = 150
    s.tracking_good = 120

    n_frames = 48
    world = synthetic.SyntheticWorld(seed=4)
    poses = synthetic.straight_trajectory(n_frames, speed=0.6, yaw_rate=0.002)
    L, R = synthetic.render_stereo_sequence(
        world, poses, s.cam_left.fx, s.cam_left.fy, s.cam_left.cx,
        s.cam_left.cy, s.baseline, s.image_width, s.image_height)

    sys_ = System(s, enable_backend=True, enable_loop_closing=False)
    engine = eng.Engine(sys_.frontend, True)
    carry = eng.fresh_carry(s, sys_.frontend, sys_.map)

    imgs_l = jnp.stack([sys_._pad(np.asarray(im, np.float32)) for im in L])
    imgs_r = jnp.stack([sys_._pad(np.asarray(im, np.float32)) for im in R])

    # warm up single-frame program
    c2, out = engine.run_frame(carry, imgs_l[0], imgs_r[0])
    jax.block_until_ready(c2)

    c = carry
    times = []
    for i in range(n_frames):
        jax.block_until_ready(c)
        t0 = time.time()
        c, out = engine.run_frame(c, imgs_l[i], imgs_r[i])
        jax.block_until_ready(out.T_cw)
        dt = time.time() - t0
        times.append((dt, bool(out.kf_flag), int(out.status),
                      int(out.n_inliers)))
    track_ms = [1e3 * t for t, kf, st, _ in times if not kf and st != 0]
    kf_ms = [1e3 * t for t, kf, st, _ in times if kf]
    print(f"frames: {len(times)}  kf: {len(kf_ms)}")
    print(f"track frame ms: median {np.median(track_ms):.1f} "
          f"p90 {np.percentile(track_ms, 90):.1f}")
    if kf_ms:
        print(f"kf    frame ms: median {np.median(kf_ms):.1f}")

    # chunked comparison on the same frames
    c = carry
    K = 8
    run = jax.jit(engine._run_chunk)
    c, outs, _ = run(c, imgs_l[:K], imgs_r[:K])
    jax.block_until_ready(outs.T_cw)
    chunk_times = []
    for b in range(K, n_frames, K):
        jax.block_until_ready(c)
        t0 = time.time()
        c, outs, _ = run(c, imgs_l[b:b + K], imgs_r[b:b + K])
        jax.block_until_ready(outs.T_cw)
        chunk_times.append(time.time() - t0)
    print(f"chunk({K}) ms/frame: median "
          f"{1e3 * np.median(chunk_times) / K:.1f}")


if __name__ == "__main__":
    main()
