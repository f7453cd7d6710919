"""Instrumented replica of bench.py's chunk loop: where does the time go?"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ssvio_tpu.config import Settings
from ssvio_tpu.dataio import synthetic
from ssvio_tpu.system import System

CHUNK = 8


def main():
    s = Settings()
    s.max_features = 512
    s.max_landmarks = 8192
    s.min_init_landmarks = 150
    s.tracking_good = 120

    n_frames = 72
    world = synthetic.SyntheticWorld(seed=4)
    poses = synthetic.straight_trajectory(n_frames, speed=0.6, yaw_rate=0.002)
    L, R = synthetic.render_stereo_sequence(
        world, poses, s.cam_left.fx, s.cam_left.fy, s.cam_left.cx,
        s.cam_left.cy, s.baseline, s.image_width, s.image_height)

    sys_ = System(s, enable_backend=True, enable_loop_closing=False)
    sys_.run_chunk(L[:CHUNK], R[:CHUNK], [0.1 * i for i in range(CHUNK)])

    from ssvio_tpu import engine as eng
    engine = sys_._engine

    for c in range(CHUNK, n_frames, CHUNK):
        t0 = time.time()
        imgs_l = jnp.stack([sys_._pad(np.asarray(im, np.float32))
                            for im in L[c:c + CHUNK]])
        imgs_r = jnp.stack([sys_._pad(np.asarray(im, np.float32))
                            for im in R[c:c + CHUNK]])
        jax.block_until_ready((imgs_l, imgs_r))
        t1 = time.time()
        carry = eng.EngineCarry(
            pyr_last=sys_.last_pyr, feat=sys_.feat,
            T_cw=jnp.asarray(sys_.T_cw),
            rel_motion=jnp.asarray(sys_.rel_motion), m=sys_.map,
            status=jnp.int32(sys_.status))
        carry, outs, packed = engine.run_chunk(carry, imgs_l, imgs_r)
        jax.block_until_ready(carry)
        t2 = time.time()
        sys_.last_pyr = carry.pyr_last
        sys_.feat = carry.feat
        sys_.T_cw = carry.T_cw
        sys_.rel_motion = carry.rel_motion
        sys_.map = carry.m
        sys_.status = int(carry.status)
        T_cw_k = np.asarray(outs.T_cw)
        kf_flag = np.asarray(outs.kf_flag)
        statuses = np.asarray(outs.status)
        t3 = time.time()
        sys_._refresh_keyframe_records()
        t4 = time.time()
        print(f"pad+up {1e3*(t1-t0):6.1f}  engine {1e3*(t2-t1):6.1f}  "
              f"readback {1e3*(t3-t2):6.1f}  refresh {1e3*(t4-t3):6.1f}  "
              f"kf={int(kf_flag.sum())} status={statuses[-1]}")


if __name__ == "__main__":
    main()
