"""End-to-end driver test: run_kitti on a synthetic KITTI-layout dump.

The reference's only operating mode is the full-sequence KITTI driver
(reference test/test_system.cpp:16-53). No KITTI data exists on this
machine, so a synthetic sequence is dumped in the same directory layout
(times.txt + image_0/ + image_1/ PNGs) and both driver modes — the
per-frame reference-style loop and the pipelined --chunk path — are run
through scripts/run_kitti.main() and compared.
"""

import os
import sys

import numpy as np
import pytest

from ssvio_tpu.dataio import synthetic

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")


def _dump_kitti_dir(tmp_path, n=32):
    import cv2
    fx = 320.0
    W, H, b = 320, 128, 0.5
    world = synthetic.SyntheticWorld(seed=3)
    poses = synthetic.straight_trajectory(n, speed=0.6)
    L, R = synthetic.render_stereo_sequence(world, poses, fx, fx, 160.0,
                                            64.0, b, W, H)
    seq = tmp_path / "seq00"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir()
    for i in range(n):
        cv2.imwrite(str(seq / "image_0" / f"{i:06d}.png"),
                    np.clip(L[i], 0, 255).astype(np.uint8))
        cv2.imwrite(str(seq / "image_1" / f"{i:06d}.png"),
                    np.clip(R[i], 0, 255).astype(np.uint8))
    (seq / "times.txt").write_text("".join(f"{0.1 * i:.6e}\n"
                                           for i in range(n)))
    cfg = seq / "config.yaml"
    cfg.write_text(
        "Camera1.fx: 320.0\nCamera1.fy: 320.0\n"
        "Camera1.cx: 160.0\nCamera1.cy: 64.0\n"
        "Camera2.fx: 320.0\nCamera2.fy: 320.0\n"
        "Camera2.cx: 160.0\nCamera2.cy: 64.0\n"
        "Camera.width: 320\nCamera.height: 128\n"
        f"Camera.Base.Line: {0.5 * fx}\n"
        "Min.Init.Landmark.Num: 60\n"
        "numFeatures.trackingGood: 50\nnumFeatures.trackingBad: 10\n"
        "Loop.Closing.Open: 0\n")
    # gt in KITTI poses format (3x4 row-major per line)
    gt = seq / "poses.txt"
    gt.write_text("\n".join(" ".join(f"{v:.9e}" for v in p.reshape(-1))
                            for p in poses))
    return seq, poses


@pytest.mark.slow
def test_run_kitti_per_frame_and_chunked_agree(tmp_path):
    sys.path.insert(0, SCRIPTS)
    import run_kitti

    seq, poses = _dump_kitti_dir(tmp_path, n=32)
    traj_a = tmp_path / "a.tum"
    traj_b = tmp_path / "b.tum"

    rc = run_kitti.main([
        "--kitti_dataset_path", str(seq),
        "--config_yaml_path", str(seq / "config.yaml"),
        "--save_traj", str(traj_a), "--frames_only_traj"])
    assert rc == 0

    rc = run_kitti.main([
        "--kitti_dataset_path", str(seq),
        "--config_yaml_path", str(seq / "config.yaml"),
        "--chunk", "12",                       # 2 full chunks + 8-frame tail
        "--save_traj", str(traj_b), "--frames_only_traj"])
    assert rc == 0

    a = np.loadtxt(traj_a)
    b = np.loadtxt(traj_b)
    assert a.shape == (32, 8) and b.shape == (32, 8)
    # same engine, same frames: trajectories agree tightly (chunked path
    # tolerance mirrors tests/test_engine_chunked.py)
    gt_xyz = poses[:, :, 3]
    for est in (a, b):
        err = np.linalg.norm(est[:, 1:4] - gt_xyz, axis=1)
        assert err.max() < 0.5, err.max()
    assert np.abs(a[:, 1:4] - b[:, 1:4]).max() < 0.2
