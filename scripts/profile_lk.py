"""LK + upload microbenchmarks on realistic synthetic imagery."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ssvio_tpu import frontend as fe
from ssvio_tpu.config import Settings
from ssvio_tpu.dataio import synthetic
from ssvio_tpu.ops import ba, lk, se3
from ssvio_tpu.system import System


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:30s} {dt * 1e3:8.2f} ms")
    return out


def main():
    s = Settings()
    s.max_features = 512
    s.max_landmarks = 8192
    n_frames = 4
    world = synthetic.SyntheticWorld(seed=4)
    poses = synthetic.straight_trajectory(n_frames, speed=0.6, yaw_rate=0.002)
    L, R = synthetic.render_stereo_sequence(
        world, poses, s.cam_left.fx, s.cam_left.fy, s.cam_left.cx,
        s.cam_left.cy, s.baseline, s.image_width, s.image_height)

    sys_ = System(s, enable_backend=True, enable_loop_closing=False)
    front = sys_.frontend
    img0 = sys_._pad(np.asarray(L[0], np.float32))
    img1 = sys_._pad(np.asarray(L[1], np.float32))
    imgr = sys_._pad(np.asarray(R[0], np.float32))
    pyr0 = front.build_pyramid(img0)
    pyr1 = front.build_pyramid(img1)
    pyrr = front.build_pyramid(imgr)
    jax.block_until_ready(pyr1)

    # detect real corners on frame 0
    feat, _ = jax.jit(front._detect_merge)(
        pyr0[0], fe.empty_feat_state(s.max_features))
    print("valid feats:", int(jnp.sum(feat.valid)))

    fwd = jax.jit(lambda: lk.track(pyr0, pyr1, feat.xy, feat.xy, feat.valid,
                                   front.lk_params))
    new_xy, ok, err = timeit("lk fwd (temporal)", fwd)
    bwd = jax.jit(lambda: lk.track(pyr1, pyr0, new_xy, new_xy, ok,
                                   front.lk_params))
    timeit("lk bwd (temporal)", bwd)

    st = jax.jit(lambda: lk.track(pyr0, pyrr, feat.xy, feat.xy, feat.valid,
                                  front.lk_params_stereo))
    xy_r, ok_r, _ = timeit("lk stereo fwd", st)

    # track_step end to end on real corners (needs landmarks; skip)

    # ---- upload benchmarks over the axon tunnel
    K = 8
    h, w = img0.shape
    stack_f32 = np.random.uniform(0, 255, (K, h, w)).astype(np.float32)
    stack_u8 = stack_f32.astype(np.uint8)

    def up_f32():
        return jax.device_put(stack_f32).block_until_ready()

    def up_u8():
        return jax.device_put(stack_u8).block_until_ready()

    timeit("upload f32 [8,H,W]", up_f32, n=10)
    timeit("upload u8  [8,H,W]", up_u8, n=10)

    # host pad cost
    def pad_host():
        return [sys_._pad(np.asarray(L[i % n_frames], np.float32))
                for i in range(K)]
    t0 = time.time()
    pad_host()
    print(f"{'host pad x8 (numpy+put)':30s} {1e3 * (time.time() - t0):8.2f} ms")


if __name__ == "__main__":
    main()
