"""Pyramidal LK tests: known shifts on synthetic imagery, cv2 cross-check."""

import cv2
import jax.numpy as jnp
import numpy as np

from ssvio_tpu.dataio import synthetic
from ssvio_tpu.ops import fast, lk, pyramid


def _textured(rng, h=192, w=256):
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    return cv2.GaussianBlur(img, (7, 7), 1.5)


def _shift(img, dx, dy):
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]))


def _detect(img, n=64):
    xy, _, v = fast.detect_grid(jnp.asarray(img), max_kps=n, cell=16)
    pts = np.asarray(xy)[np.asarray(v)]
    # keep away from borders so full windows exist at every level
    m = (pts[:, 0] > 30) & (pts[:, 0] < img.shape[1] - 30) & \
        (pts[:, 1] > 30) & (pts[:, 1] < img.shape[0] - 30)
    return pts[m]


def test_lk_recovers_small_shift(rng):
    img = _textured(rng)
    dx, dy = 2.3, -1.7
    img2 = _shift(img, dx, dy)
    pts = _detect(img)[:32]
    pyr1 = pyramid.build_lk_pyramid(jnp.asarray(img), 3)
    pyr2 = pyramid.build_lk_pyramid(jnp.asarray(img2), 3)
    p = jnp.asarray(pts)
    out, ok, err = lk.track(pyr1, pyr2, p, p, jnp.ones(len(pts), bool))
    ok = np.asarray(ok)
    assert ok.mean() > 0.8
    flow = np.asarray(out)[ok] - pts[ok]
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=0.2)


def test_lk_recovers_large_shift_via_pyramid(rng):
    img = _textured(rng)
    dx, dy = 13.0, 6.0   # beyond the 11x11 window; needs coarse levels
    img2 = _shift(img, dx, dy)
    pts = _detect(img)[:32]
    pyr1 = pyramid.build_lk_pyramid(jnp.asarray(img), 4)
    pyr2 = pyramid.build_lk_pyramid(jnp.asarray(img2), 4)
    p = jnp.asarray(pts)
    out, ok, err = lk.track(pyr1, pyr2, p, p, jnp.ones(len(pts), bool),
                            lk.LKParams(levels=4))
    ok = np.asarray(ok)
    assert ok.mean() > 0.5
    flow = np.asarray(out)[ok] - pts[ok]
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=0.4)


def test_lk_initial_flow_seeding(rng):
    """With a good prior, even a huge shift tracks at few pyramid levels
    (the reference relies on this: projection-seeded LK, frontend.cpp:135-166)."""
    img = _textured(rng)
    dx, dy = 37.0, -12.0
    img2 = _shift(img, dx, dy)
    pts = _detect(img)
    pts = pts[(pts[:, 0] > 45) & (pts[:, 0] < 200) & (pts[:, 1] > 45) & (pts[:, 1] < 150)][:24]
    pyr1 = pyramid.build_lk_pyramid(jnp.asarray(img), 3)
    pyr2 = pyramid.build_lk_pyramid(jnp.asarray(img2), 3)
    p = jnp.asarray(pts)
    seed = p + jnp.asarray([dx - 1.5, dy + 1.0])  # prior within ~2px
    out, ok, _ = lk.track(pyr1, pyr2, p, seed, jnp.ones(len(pts), bool))
    ok = np.asarray(ok)
    assert ok.mean() > 0.6
    flow = np.asarray(out)[ok] - pts[ok]
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=0.4)


def test_lk_matches_cv2_on_synthetic_motion(rng):
    """Track real parallax motion (synthetic 3D world) and compare per-point
    against OpenCV's pyramidal LK."""
    world = synthetic.SyntheticWorld(seed=11)
    poses = synthetic.straight_trajectory(2, speed=0.35)
    L, _ = synthetic.render_stereo_sequence(world, poses, 360.0, 360.0,
                                            160.0, 60.0, 0.54, 320, 120)
    img1, img2 = L[0], L[1]
    pts = _detect(img1, n=96)[:48]
    pyr1 = pyramid.build_lk_pyramid(jnp.asarray(img1), 3)
    pyr2 = pyramid.build_lk_pyramid(jnp.asarray(img2), 3)
    p = jnp.asarray(pts.astype(np.float32))
    out, ok, _ = lk.track(pyr1, pyr2, p, p, jnp.ones(len(pts), bool))

    cv_out, cv_st, _ = cv2.calcOpticalFlowPyrLK(
        img1.astype(np.uint8), img2.astype(np.uint8),
        pts.astype(np.float32).reshape(-1, 1, 2), None,
        winSize=(11, 11), maxLevel=2,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01))
    cv_out = cv_out.reshape(-1, 2)
    cv_st = cv_st.ravel().astype(bool)
    both = np.asarray(ok) & cv_st
    assert both.sum() >= 10
    d = np.linalg.norm(np.asarray(out)[both] - cv_out[both], axis=1)
    # agree within half a pixel for the solid majority
    assert np.median(d) < 0.5, f"median dev vs cv2: {np.median(d)}"


def test_lk_flags_lost_points(rng):
    """Points tracked into a textureless region must be flagged."""
    img = _textured(rng)
    img2 = img.copy()
    img2[:, 120:] = 100.0  # wipe texture on the right half
    pts = _detect(img)
    right_pts = pts[pts[:, 0] > 150][:8]
    if len(right_pts) == 0:
        return
    pyr1 = pyramid.build_lk_pyramid(jnp.asarray(img), 3)
    pyr2 = pyramid.build_lk_pyramid(jnp.asarray(img2), 3)
    p = jnp.asarray(right_pts)
    out, ok, err = lk.track(pyr1, pyr2, p, p, jnp.ones(len(right_pts), bool))
    # either flagged invalid or big photometric error
    bad = (~np.asarray(ok)) | (np.asarray(err) > 10.0)
    assert bad.mean() > 0.7


def test_invalid_points_frozen_at_seed(rng):
    """Invalid slots must not be tracked at all: they return their seed
    position (the kernel pre-freezes them instead of iterating on stale
    coordinates) and come back not-ok."""
    import cv2
    img = rng.uniform(0, 255, (192, 256)).astype(np.float32)
    img = cv2.GaussianBlur(img, (7, 7), 1.5)
    M = np.float32([[1, 0, 3.0], [0, 1, -2.0]])
    img2 = cv2.warpAffine(img, M, (256, 192))
    pyr1 = pyramid.build_lk_pyramid(jnp.asarray(img), 3)
    pyr2 = pyramid.build_lk_pyramid(jnp.asarray(img2), 3)
    pts = np.array([[120.0, 90.0], [60.0, 60.0], [180.0, 120.0]], np.float32)
    valid = jnp.asarray([True, False, False])
    p = jnp.asarray(pts)
    out, ok, _ = lk.track(pyr1, pyr2, p, p, valid)
    assert bool(ok[0]) and not bool(ok[1]) and not bool(ok[2])
    np.testing.assert_allclose(np.asarray(out)[1:], pts[1:], atol=1e-6)
    # the valid point actually moved with the warp
    assert abs(float(out[0, 0]) - 123.0) < 0.5
    assert abs(float(out[0, 1]) - 88.0) < 0.5
