"""Camera model + triangulation tests against closed-form oracles."""

import jax.numpy as jnp
import numpy as np

from ssvio_tpu.config import Settings
from ssvio_tpu.ops import camera, se3, triangulation


def make_rig():
    s = Settings()
    return camera.StereoRig.from_settings(s), s


def test_project_unproject_roundtrip(rng):
    rig, _ = make_rig()
    depth = jnp.asarray(rng.uniform(2.0, 40.0, size=(128,)).astype(np.float32))
    uv = jnp.asarray(np.stack([rng.uniform(0, 1241, 128), rng.uniform(0, 376, 128)],
                              axis=-1).astype(np.float32))
    p = camera.pixel2camera(rig.intr_left, uv, depth)
    uv2 = camera.camera2pixel(rig.intr_left, p)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)


def test_world2pixel_consistency(rng):
    rig, _ = make_rig()
    xi = rng.normal(size=(6,)).astype(np.float32) * 0.3
    T_cw = se3.exp(jnp.asarray(xi))
    p_w = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32) * 5 +
                      np.array([0, 0, 20], dtype=np.float32))
    uv = camera.world2pixel(rig.intr_left, T_cw, p_w)
    p_c = np.einsum("ij,nj->ni", np.asarray(T_cw)[:, :3], np.asarray(p_w)) + np.asarray(T_cw)[:, 3]
    expected_u = 718.856 * p_c[:, 0] / p_c[:, 2] + 607.1928
    np.testing.assert_allclose(np.asarray(uv)[:, 0], expected_u, rtol=1e-4)


def test_stereo_rectified_triangulation_exact(rng):
    rig, s = make_rig()
    p_c = np.stack([rng.uniform(-5, 5, 256), rng.uniform(-2, 2, 256),
                    rng.uniform(3, 50, 256)], axis=-1).astype(np.float32)
    uv_l = camera.camera2pixel(rig.intr_left, jnp.asarray(p_c))
    p_cr = camera.right_from_left_cam(rig, jnp.asarray(p_c))
    uv_r = camera.camera2pixel(rig.intr_right, p_cr)
    p_est, ok = triangulation.triangulate_stereo_rectified(
        uv_l, uv_r, rig.intr_left.fx, rig.intr_left.fy,
        rig.intr_left.cx, rig.intr_left.cy, rig.baseline)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(p_est), p_c, rtol=1e-3, atol=1e-3)


def test_dlt_triangulation_two_views(rng):
    rig, s = make_rig()
    # ground-truth point and two camera poses
    p_w = np.array([[1.0, -0.5, 12.0], [-2.0, 0.3, 25.0]], dtype=np.float32)
    T0 = se3.identity()
    T1 = se3.exp(jnp.asarray(np.array([0.5, 0.02, 0.1, 0.01, 0.05, 0.0], np.float32)))
    projs = jnp.stack([jnp.broadcast_to(T0, (2, 3, 4)),
                       jnp.broadcast_to(T1, (2, 3, 4))], axis=1)  # [2, V=2, 3, 4]
    uvn = []
    for T in [T0, T1]:
        pc = se3.transform(T, jnp.asarray(p_w))
        uvn.append(pc[..., :2] / pc[..., 2:3])
    uv_norm = jnp.stack(uvn, axis=1)  # [2, 2, 2]
    p_est, ok = triangulation.triangulate_dlt(projs, uv_norm)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(p_est), p_w, atol=1e-2)


def test_dlt_quality_gate_rejects_degenerate():
    """Zero-baseline views are unobservable -> gate must reject."""
    T0 = se3.identity()
    projs = jnp.stack([jnp.broadcast_to(T0, (1, 3, 4))] * 2, axis=1)
    uv_norm = jnp.asarray(np.array([[[0.1, 0.2], [0.1, 0.2]]], np.float32))
    _, ok = triangulation.triangulate_dlt(projs, uv_norm)
    assert not bool(ok[0])


def test_undistort_points_roundtrip(rng):
    rig, _ = make_rig()
    dist = (jnp.float32(-0.28), jnp.float32(0.07), jnp.float32(2e-4), jnp.float32(2e-5))
    # distort normalized points forward, then undo
    x = rng.uniform(-0.4, 0.4, 64).astype(np.float32)
    y = rng.uniform(-0.2, 0.2, 64).astype(np.float32)
    k1, k2, p1, p2 = [float(d) for d in dist]
    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    uv_dist = np.stack([xd * 718.856 + 607.1928, yd * 718.856 + 185.2157], axis=-1)
    uv_undist = camera.undistort_points(rig.intr_left, dist, jnp.asarray(uv_dist.astype(np.float32)), iters=8)
    expected = np.stack([x * 718.856 + 607.1928, y * 718.856 + 185.2157], axis=-1)
    np.testing.assert_allclose(np.asarray(uv_undist), expected, atol=0.05)


def test_undistort_image_roundtrip():
    """undistort_image inverts the lens model: applying it to a distorted
    rendering of a smooth scene recovers the ideal (pinhole) image away
    from the borders."""
    import numpy as np
    import scipy.ndimage as ndi

    from ssvio_tpu.ops import camera

    h, w = 96, 128
    fx = fy = 100.0
    cx, cy = 64.0, 48.0
    intr = camera.Intrinsics(fx=jnp.float32(fx), fy=jnp.float32(fy),
                             cx=jnp.float32(cx), cy=jnp.float32(cy))
    dist = (0.08, -0.01, 0.0, 0.0)
    rng = np.random.default_rng(0)
    img_ideal = np.kron(rng.uniform(0, 255, (12, 16)), np.ones((8, 8)))
    img_ideal = ndi.gaussian_filter(img_ideal, 2.0)

    # observed (distorted) image: I_d(p) = I_ideal at the pinhole location
    # that distorts TO p. undistort_image computes U(p) = I_d(D(p)), so
    # building I_d on the inverse warp makes U(p) == I_ideal(p).
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    xn, yn = (xx - cx) / fx, (yy - cy) / fy
    # numerically invert the distortion per pixel (fixed point, as in
    # undistort_points)
    x_u, y_u = xn.copy(), yn.copy()
    for _ in range(8):
        xd, yd = camera.distort_normalized(dist, x_u, y_u)
        x_u += xn - np.asarray(xd)
        y_u += yn - np.asarray(yd)
    img_d = ndi.map_coordinates(img_ideal, [y_u * fy + cy, x_u * fx + cx],
                                order=1, mode="nearest")

    out = np.asarray(camera.undistort_image(intr, dist,
                                            jnp.asarray(img_d, jnp.float32)))
    c = 20
    diff = np.abs(out[c:-c, c:-c] - img_ideal[c:-c, c:-c])
    assert np.median(diff) < 3.0, np.median(diff)
    assert diff.mean() < 5.0, diff.mean()


def test_undistort_image_recovers_ideal():
    """Distort an ideal image (sample it at undistorted source coords),
    then undistort_image must recover the ideal image in the interior
    (reference Camera::UndistortImage, camera.cpp:43-55)."""
    import numpy as np

    from ssvio_tpu.ops import camera

    rng = np.random.default_rng(5)
    h, w = 96, 128
    base = rng.uniform(0, 255, (h // 8, w // 8)).astype(np.float32)
    ideal = np.kron(base, np.ones((8, 8), np.float32))   # blocky texture
    intr = camera.Intrinsics(jnp.float32(100.0), jnp.float32(100.0),
                             jnp.float32(w / 2), jnp.float32(h / 2))
    dist = (-0.15, 0.02, 0.0, 0.0)

    # synthesize the DISTORTED observation: D(u_d) = I(undistort(u_d))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = jnp.asarray(np.stack([xx.ravel(), yy.ravel()], axis=-1))
    src = np.asarray(camera.undistort_points(intr, dist, grid))
    sx = np.clip(src[:, 0], 0, w - 1)
    sy = np.clip(src[:, 1], 0, h - 1)
    x0, y0 = sx.astype(int), sy.astype(int)
    x1, y1 = np.minimum(x0 + 1, w - 1), np.minimum(y0 + 1, h - 1)
    fx_, fy_ = sx - x0, sy - y0
    D = ((1 - fy_) * ((1 - fx_) * ideal[y0, x0] + fx_ * ideal[y0, x1])
         + fy_ * ((1 - fx_) * ideal[y1, x0] + fx_ * ideal[y1, x1])
         ).reshape(h, w).astype(np.float32)

    rec = np.asarray(camera.undistort_image(intr, dist, jnp.asarray(D)))
    # compare away from borders (distortion pulls in content from outside)
    err = np.abs(rec[16:-16, 16:-16] - ideal[16:-16, 16:-16])
    assert np.median(err) < 4.0, np.median(err)
    assert err.mean() < 8.0, err.mean()
