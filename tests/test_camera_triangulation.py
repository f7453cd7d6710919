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
