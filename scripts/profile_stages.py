"""Microbenchmark of each per-frame stage on the real device.

Times each jitted component of the engine step in isolation (post-compile)
so perf work targets the dominant stage. Not part of the test suite.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ssvio_tpu import frontend as fe
from ssvio_tpu import map as mapmod
from ssvio_tpu.config import Settings
from ssvio_tpu.ops import ba, se3


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:28s} {dt * 1e3:8.2f} ms")
    return out


def main():
    s = Settings()
    s.max_features = 512
    s.max_landmarks = 8192
    print("device:", jax.devices()[0].device_kind)

    sysmod_div = 2 ** (s.lk_levels + 1)
    w = -(-s.image_width // sysmod_div) * sysmod_div
    h = -(-s.image_height // sysmod_div) * sysmod_div
    front = fe.Frontend(s, w, h, s.image_width, s.image_height)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))

    pyr = timeit("build_pyramid", front.build_pyramid, img)
    pyr2 = front.build_pyramid(img2)
    jax.block_until_ready(pyr2)

    n = s.max_features
    feat = fe.FeatState(
        xy=jnp.asarray(np.stack([rng.uniform(20, w - 20, n),
                                 rng.uniform(20, h - 20, n)], -1)
                       .astype(np.float32)),
        lm_slot=jnp.arange(n, dtype=jnp.int32),
        lm_gid=jnp.arange(n, dtype=jnp.int32),
        valid=jnp.ones((n,), bool))
    m = mapmod.empty_map(s.max_window, s.max_landmarks)
    lm_pos = jnp.asarray(np.stack([rng.uniform(-5, 5, s.max_landmarks),
                                   rng.uniform(-2, 2, s.max_landmarks),
                                   rng.uniform(5, 40, s.max_landmarks)], -1)
                         .astype(np.float32))
    m = m._replace(lm_pos=lm_pos,
                   lm_valid=jnp.ones((s.max_landmarks,), bool),
                   lm_gid=jnp.arange(s.max_landmarks, dtype=jnp.int32))

    # full track step
    timeit("track_step", front.track_step, pyr, pyr2, feat, se3.identity(),
           se3.identity(), m.lm_pos, m.lm_valid, m.lm_gid)

    # LK alone (fwd)
    from ssvio_tpu.ops import lk
    lk_fn = jax.jit(lambda: lk.track(pyr, pyr2, feat.xy, feat.xy, feat.valid,
                                     front.lk_params))
    timeit("lk.track fwd", lk_fn)

    # pose-only LM alone
    p_w = lm_pos[:n]
    uv = jnp.asarray(rng.uniform(0, 300, (n, 2)).astype(np.float32))
    lm_fn = jax.jit(lambda: ba.pose_only_optimize(
        se3.identity(), p_w, uv, feat.valid,
        front._fx, front._fy, front._cx, front._cy))
    timeit("pose_only_optimize", lm_fn)

    # keyframe step (detect+stereo+triangulate+insert)
    timeit("keyframe_step", front.keyframe_step, pyr, pyr2, feat,
           se3.identity(), m)

    # FAST detect alone
    from ssvio_tpu.ops import fast
    occ = jnp.zeros((h, w), bool)
    det_fn = jax.jit(lambda: fast.detect_grid(
        pyr[0], max_kps=n, cell=s.grid_cell,
        ini_threshold=float(s.ini_th_fast),
        min_threshold=float(s.min_th_fast), occupancy=occ, kps_per_cell=4))
    timeit("fast.detect_grid", det_fn)

    # local BA alone (window full of synthetic obs)
    feat2, m2, kf_slot, kf_gid, _, _ = front.keyframe_step(
        pyr, pyr2, feat, se3.identity(), m)
    prob = mapmod.ba_problem_from_map(m2)
    ba_fn = jax.jit(lambda: ba.local_ba(prob, front._fx, front._fy,
                                        front._cx, front._cy,
                                        front._baseline))
    timeit("local_ba", ba_fn, n=5)


if __name__ == "__main__":
    main()
