"""LOST-state relocalization: recovery the reference leaves as a TODO.

The reference detects LOST but its recovery path is an empty TODO
(reference src/ssvio/frontend.cpp:62-66) — once LOST it dead-ends. Our
capability extension relocalizes against the loop-closing keyframe
database (BoW scoring + PnP) and re-seeds tracking with a keyframe at the
recovered pose. These tests blind the camera mid-sequence to force LOST,
then return it to a previously seen view and require recovery.
"""

import dataclasses

import numpy as np
import pytest

from ssvio_tpu import frontend as fe
from ssvio_tpu.config import Settings
from ssvio_tpu.dataio import synthetic


def _small_settings():
    s = Settings()
    fx = 320.0
    s.cam_left = dataclasses.replace(s.cam_left, fx=fx, fy=fx, cx=160.0, cy=64.0)
    s.cam_right = dataclasses.replace(s.cam_right, fx=fx, fy=fx, cx=160.0, cy=64.0)
    s.image_width, s.image_height = 320, 128
    s.baseline_fx = 0.5 * fx
    s.max_features = 192
    s.max_landmarks = 4096
    s.max_window = 8
    s.min_init_landmarks = 60
    # keyframe nearly every frame: warms the database quickly
    s.tracking_good = 10 ** 6
    s.tracking_bad = 10
    s.loop_db_min_size = 12
    s.loop_min_age = 100          # never fire a loop CLOSURE in this test
    s.max_keyframes_db = 128
    s.loop_desc_scales = 2
    s.vocab_k = 6
    s.vocab_levels = 2
    return s


def _sequence(s, n=20):
    world = synthetic.SyntheticWorld(seed=5)
    poses = synthetic.straight_trajectory(n, speed=0.35)
    L, R = synthetic.render_stereo_sequence(
        world, poses, s.cam_left.fx, s.cam_left.fy, s.cam_left.cx,
        s.cam_left.cy, s.baseline, s.image_width, s.image_height)
    return poses, L, R


@pytest.mark.slow
def test_relocalization_recovers_from_lost():
    from ssvio_tpu.system import System

    s = _small_settings()
    poses, L, R = _sequence(s)
    blank = np.full((s.image_height, s.image_width), 128.0, np.float32)

    sys_ = System(s, enable_backend=True, enable_loop_closing=True)
    for i in range(len(L)):
        sys_.run_step(L[i], R[i], i * 0.1)
    assert sys_.loopclosing.vocab is not None, "database never warmed up"
    assert sys_.status != fe.LOST

    # blind the camera: featureless frames kill tracking
    for j in range(3):
        sys_.run_step(blank, blank, 10.0 + j * 0.1)
    assert sys_.status == fe.LOST
    # blank frames must not relocalize (nothing to match)
    assert sys_.stats.get("n_relocalizations", 0) == 0

    # return to a previously seen view -> relocalize + resume tracking
    k = 10
    sys_.run_step(L[k], R[k], 20.0)
    assert sys_.stats.get("n_relocalizations", 0) == 1
    assert sys_.status == fe.TRACKING_GOOD
    T_wc = np.asarray(sys_.trajectory[-1][2])
    err = np.linalg.norm(T_wc[:, 3] - poses[k][:, 3])
    assert err < 0.5, f"relocalized pose off by {err:.3f} m"

    # and tracking continues normally afterwards
    for i in range(k + 1, k + 5):
        sys_.run_step(L[i], R[i], 21.0 + i * 0.1)
    assert sys_.status != fe.LOST
    T_wc = np.asarray(sys_.trajectory[-1][2])
    err = np.linalg.norm(T_wc[:, 3] - poses[k + 4][:, 3])
    assert err < 0.5, f"post-recovery drift {err:.3f} m"


@pytest.mark.slow
def test_lost_dead_end_parity_when_disabled():
    """relocalization_open=False reproduces the reference's dead-end."""
    from ssvio_tpu.system import System

    s = _small_settings()
    s.relocalization_open = False
    poses, L, R = _sequence(s, n=16)
    blank = np.full((s.image_height, s.image_width), 128.0, np.float32)

    sys_ = System(s, enable_backend=True, enable_loop_closing=True)
    for i in range(len(L)):
        sys_.run_step(L[i], R[i], i * 0.1)
    for j in range(2):
        sys_.run_step(blank, blank, 10.0 + j * 0.1)
    assert sys_.status == fe.LOST
    sys_.run_step(L[8], R[8], 20.0)    # a perfectly relocalizable view...
    assert sys_.status == fe.LOST      # ...but the reference dead-ends
    assert sys_.stats.get("n_relocalizations", 0) == 0
