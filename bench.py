"""Benchmark: stereo VO frames/s per chip on KITTI-resolution synthetic data.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers; KITTI is fed at its nominal
10 fps (reference config/kitti_00.yaml:28 — see BASELINE.md). vs_baseline is
therefore fps / 10.0; the BASELINE.json target is >=5x (>=50 fps/chip).

The measured path is the real per-frame pipeline (pyramid build + seeded
pyramidal LK + FB gate + 4x10 pose-only LM + status readback), running on
whatever device JAX selects (the TPU chip under the driver), including the
host->device image upload and the scalar pose/inlier readback every frame.
Keyframe/BA frames are excluded from the steady-state timing but reported.
"""

import json
import time
import dataclasses

import numpy as np


def main():
    import jax

    from ssvio_tpu.config import Settings
    from ssvio_tpu.dataio import synthetic
    from ssvio_tpu.eval import ate
    from ssvio_tpu.system import System

    # KITTI 00 geometry (reference config) on synthetic imagery
    s = Settings()
    FX, FY, CX, CY = (s.cam_left.fx, s.cam_left.fy, s.cam_left.cx, s.cam_left.cy)
    W, H = s.image_width, s.image_height
    B = s.baseline
    s.max_features = 512
    s.max_landmarks = 8192
    s.min_init_landmarks = 150
    s.tracking_good = 120        # KF cadence scaled to the 512 budget

    n_frames = 40
    # default corridor (walls at +-8 m): enough NEAR structure that stereo
    # init clears min_init_landmarks under the 60x-baseline depth cap
    world = synthetic.SyntheticWorld(seed=4)
    poses = synthetic.straight_trajectory(n_frames, speed=0.6, yaw_rate=0.002)
    L, R = synthetic.render_stereo_sequence(world, poses, FX, FY, CX, CY,
                                            B, W, H)

    sys_ = System(s, enable_backend=True, enable_loop_closing=False)
    # warmup: init + first tracks + one KF path (compiles everything)
    t_first = time.time()
    for i in range(3):
        sys_.run_step(L[i], R[i], i * 0.1)
    compile_s = time.time() - t_first

    track_times = []
    kf_times = []
    est = []
    for i in range(3, n_frames):
        kfs_before = sys_.stats["n_keyframes"]
        t0 = time.time()
        T = sys_.run_step(L[i], R[i], i * 0.1)
        dt = time.time() - t0
        est.append(T)
        (kf_times if sys_.stats["n_keyframes"] > kfs_before else track_times).append(dt)

    fps = 1.0 / float(np.median(track_times)) if track_times else 0.0
    wall_fps = (n_frames - 3) / (sum(track_times) + sum(kf_times))
    stats = ate.ape_translation(np.stack(est)[:, :, 3], poses[3:, :, 3])

    result = {
        "metric": "tracking_frames_per_second_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 10.0, 2),
        "extra": {
            "wall_fps_incl_keyframes": round(wall_fps, 2),
            "n_keyframes": sys_.stats["n_keyframes"],
            "kf_step_ms_median": round(1e3 * float(np.median(kf_times)), 1) if kf_times else None,
            "track_ms_median": round(1e3 * float(np.median(track_times)), 1) if track_times else None,
            "ate_rmse_m": round(stats["rmse"], 4),
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
