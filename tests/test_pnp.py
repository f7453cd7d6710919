"""RANSAC PnP tests against ground truth and cv2."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ssvio_tpu.ops import pnp, se3

FX = FY = 500.0
CX, CY = 320.0, 240.0


def make_scene(rng, n=80, pose_scale=0.4):
    p_w = np.stack([rng.uniform(-6, 6, n), rng.uniform(-3, 3, n),
                    rng.uniform(6, 30, n)], axis=-1).astype(np.float32)
    xi = rng.normal(0, pose_scale, 6).astype(np.float32)
    xi[3:] *= 0.2
    T_cw = np.asarray(se3.exp(jnp.asarray(xi)))
    p_c = p_w @ T_cw[:, :3].T + T_cw[:, 3]
    uv = np.stack([FX * p_c[:, 0] / p_c[:, 2] + CX,
                   FY * p_c[:, 1] / p_c[:, 2] + CY], axis=-1).astype(np.float32)
    valid = p_c[:, 2] > 0.5
    return p_w, uv, valid, T_cw


def pose_err(T_est, T_true):
    return np.abs(np.asarray(se3.log(se3.compose(
        jnp.asarray(T_est), se3.inverse(jnp.asarray(T_true)))))).max()


def test_pnp_exact():
    rng = np.random.default_rng(0)
    p_w, uv, valid, T_true = make_scene(rng)
    res = pnp.pnp_ransac(jnp.asarray(p_w), jnp.asarray(uv), jnp.asarray(valid),
                         FX, FY, CX, CY, jax.random.PRNGKey(0))
    assert bool(res.ok)
    assert pose_err(res.T_cw, T_true) < 1e-3


def test_pnp_with_outliers_matches_cv2():
    rng = np.random.default_rng(7)
    p_w, uv, valid, T_true = make_scene(rng, n=120)
    uv_n = uv + rng.normal(0, 0.5, uv.shape).astype(np.float32)
    n_out = 40
    out_idx = rng.choice(len(uv), n_out, replace=False)
    uv_n[out_idx] += rng.uniform(25, 120, (n_out, 2)).astype(np.float32)
    res = pnp.pnp_ransac(jnp.asarray(p_w), jnp.asarray(uv_n), jnp.asarray(valid),
                         FX, FY, CX, CY, jax.random.PRNGKey(1))
    assert bool(res.ok)
    assert pose_err(res.T_cw, T_true) < 0.02

    KM = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]])
    okcv, rvec, tvec, inl = cv2.solvePnPRansac(
        p_w[valid], uv_n[valid], KM, None, iterationsCount=100,
        reprojectionError=5.991, confidence=0.99)
    R_cv, _ = cv2.Rodrigues(rvec)
    T_cv = np.concatenate([R_cv, tvec.reshape(3, 1)], axis=1).astype(np.float32)
    # both should be close to truth, hence to each other
    assert pose_err(res.T_cw, T_cv) < 0.05
    # outliers rejected
    assert np.asarray(res.inlier)[out_idx].mean() < 0.2


def test_pnp_degenerate_too_few_points():
    rng = np.random.default_rng(3)
    p_w = np.zeros((20, 3), np.float32)
    uv = np.zeros((20, 2), np.float32)
    valid = np.zeros(20, bool)
    valid[:4] = True   # fewer than min_inliers
    res = pnp.pnp_ransac(jnp.asarray(p_w), jnp.asarray(uv), jnp.asarray(valid),
                         FX, FY, CX, CY, jax.random.PRNGKey(2))
    assert not bool(res.ok)
    assert bool(jnp.all(jnp.isfinite(res.T_cw)))
