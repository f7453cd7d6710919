"""Checkpoint/resume round-trip + profiling utilities.

The reference has neither subsystem (SURVEY §5: persistence = final TUM
export only; profiling = none)."""

import dataclasses
import time

import numpy as np
import pytest

from ssvio_tpu.config import Settings
from ssvio_tpu.dataio import synthetic
from ssvio_tpu.system import System
from ssvio_tpu.utils import checkpoint, profiling


def _settings():
    fx = 360.0
    s = Settings()
    s.cam_left = dataclasses.replace(s.cam_left, fx=fx, fy=fx, cx=310.0,
                                     cy=94.0)
    s.cam_right = dataclasses.replace(s.cam_right, fx=fx, fy=fx, cx=310.0,
                                      cy=94.0)
    s.image_width, s.image_height = 620, 188
    s.baseline_fx = 0.54 * fx
    s.max_features = 256
    s.max_landmarks = 4096
    s.min_init_landmarks = 100
    return s


@pytest.mark.slow
def test_checkpoint_resume_matches_continuous(tmp_path):
    s = _settings()
    world = synthetic.SyntheticWorld(seed=3)
    poses = synthetic.straight_trajectory(20, speed=0.8)
    L, R = synthetic.render_stereo_sequence(
        world, poses, 360.0, 360.0, 310.0, 94.0, 0.54, 620, 188)

    # continuous run
    sys_a = System(s, enable_backend=True, enable_loop_closing=False)
    for i in range(20):
        sys_a.run_step(L[i], R[i], i * 0.1)

    # run 12 frames, checkpoint, restore into a FRESH system, run the rest
    sys_b = System(s, enable_backend=True, enable_loop_closing=False)
    for i in range(12):
        sys_b.run_step(L[i], R[i], i * 0.1)
    ckpt = str(tmp_path / "state.npz")
    checkpoint.save_checkpoint(sys_b, ckpt)

    sys_c = System(s, enable_backend=True, enable_loop_closing=False)
    checkpoint.load_checkpoint(sys_c, ckpt)
    assert sys_c.frame_id == sys_b.frame_id
    assert sys_c.stats["n_keyframes"] == sys_b.stats["n_keyframes"]
    for i in range(12, 20):
        sys_c.run_step(L[i], R[i], i * 0.1)

    _, ta = sys_a.frame_trajectory()
    _, tc = sys_c.frame_trajectory()
    assert len(tc) == len(ta) == 20
    # resumed trajectory tracks the continuous one closely
    np.testing.assert_allclose(tc[:, :, 3], ta[:, :, 3], atol=0.05)


@pytest.mark.slow
def test_checkpoint_resume_chunked(tmp_path):
    s = _settings()
    world = synthetic.SyntheticWorld(seed=3)
    poses = synthetic.straight_trajectory(16, speed=0.8)
    L, R = synthetic.render_stereo_sequence(
        world, poses, 360.0, 360.0, 310.0, 94.0, 0.54, 620, 188)
    sys_b = System(s, enable_backend=True, enable_loop_closing=False)
    sys_b.run_chunk(L[:8], R[:8])
    ckpt = str(tmp_path / "state.npz")
    checkpoint.save_checkpoint(sys_b, ckpt)
    sys_c = System(s, enable_backend=True, enable_loop_closing=False)
    checkpoint.load_checkpoint(sys_c, ckpt)
    out = sys_c.run_chunk(L[8:16], R[8:16])
    assert out.shape == (8, 3, 4)
    assert len(sys_c.trajectory) == 16
    assert np.isfinite(out).all()


def test_stage_timer():
    t = profiling.StageTimer()
    with t.stage("work"):
        time.sleep(0.01)
    with t.stage("work"):
        time.sleep(0.01)
    t.add("frames", 5)
    s = t.summary()
    assert s["work"]["calls"] == 2
    assert s["work"]["total_s"] >= 0.02
    assert s["counter/frames"]["value"] == 5
    assert "work" in t.report()
    t.reset()
    assert not t.total_s


def test_xla_trace_noop():
    with profiling.xla_trace(None):
        pass  # must be a no-op without a log dir
