"""Viewer: snapshot with the stereo-image pane (reference
pangolin_window_impl.cpp:174-228 parity — live image pair + tracked
features + map/trajectory in one figure)."""

import os

import numpy as np

from tests.test_system_e2e import FX, FY, CX, CY, BASELINE, W, H, \
    small_settings
from ssvio_tpu.dataio import synthetic


def test_snapshot_includes_stereo_pane(tmp_path):
    from ssvio_tpu.system import System
    from ssvio_tpu import viz

    world = synthetic.SyntheticWorld(seed=9)
    poses = synthetic.straight_trajectory(4, speed=0.35)
    L, R = synthetic.render_stereo_sequence(world, poses, FX, FY, CX, CY,
                                            BASELINE, W, H)
    s = small_settings(backend_open=False)
    sys_ = System(s, enable_backend=False, enable_loop_closing=False)
    for i in range(4):
        sys_.run_step(L[i], R[i], 0.1 * i)
    assert sys_.last_stereo is not None
    p = str(tmp_path / "snap.png")
    out = viz.snapshot(sys_, p)
    assert os.path.exists(out) and os.path.getsize(out) > 20000

    # chunked path also feeds the pane
    sys2 = System(s, enable_backend=False, enable_loop_closing=False)
    sys2.run_chunk(L[:4], R[:4], [0.1 * i for i in range(4)])
    assert sys2.last_stereo is not None and sys2.last_stereo[1] is not None
    p2 = str(tmp_path / "snap2.png")
    viz.snapshot(sys2, p2)
    assert os.path.getsize(p2) > 20000
