"""Optimizer tests: pose-only LM and Schur local BA on synthetic scenes."""

import jax.numpy as jnp
import numpy as np
import pytest

from ssvio_tpu.ops import ba, se3

FX = FY = 400.0
CX, CY = 320.0, 120.0
BASELINE = 0.54


def synth_scene(rng, n_points=120, n_poses=6, spacing=0.8):
    """Random landmarks in front of a forward-moving camera track."""
    p_w = np.stack([rng.uniform(-8, 8, n_points),
                    rng.uniform(-2, 2, n_points),
                    rng.uniform(8, 40, n_points)], axis=-1).astype(np.float32)
    T_cw = []
    for i in range(n_poses):
        xi = np.zeros(6, np.float32)
        xi[2] = -i * spacing            # camera moves +z in world => t_cw -z
        xi[3:] = rng.normal(0, 0.01, 3)
        T_cw.append(np.asarray(se3.exp(jnp.asarray(xi))))
    return p_w, np.stack(T_cw)


def project(T_cw, p_w, baseline_x=0.0):
    p_c = np.einsum("ij,nj->ni", T_cw[:, :3], p_w) + T_cw[:, 3]
    p_c = p_c - np.array([baseline_x, 0, 0], np.float32)
    uv = np.stack([FX * p_c[:, 0] / p_c[:, 2] + CX,
                   FY * p_c[:, 1] / p_c[:, 2] + CY], axis=-1)
    return uv.astype(np.float32), p_c[:, 2]


# ---------------------------------------------------------------------------
# pose-only
# ---------------------------------------------------------------------------

def test_pose_only_exact_recovery(rng):
    p_w, T = synth_scene(rng)
    T_true = T[3]
    uv, z = project(T_true, p_w)
    valid = jnp.asarray(z > 0)
    # perturb the pose
    xi = np.array([0.2, -0.1, 0.15, 0.02, -0.03, 0.01], np.float32)
    T_init = se3.compose(se3.exp(jnp.asarray(xi)), jnp.asarray(T_true))
    res = ba.pose_only_optimize(T_init, jnp.asarray(p_w), jnp.asarray(uv),
                                valid, FX, FY, CX, CY)
    err = np.asarray(se3.log(se3.compose(res.T_cw, se3.inverse(jnp.asarray(T_true)))))
    assert np.abs(err).max() < 1e-3, err
    assert int(res.n_inliers) == int(valid.sum())


def test_pose_only_with_noise_and_outliers(rng):
    p_w, T = synth_scene(rng, n_points=200)
    T_true = T[2]
    uv, z = project(T_true, p_w)
    uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)     # pixel noise
    n_out = 40
    out_idx = rng.choice(len(uv), n_out, replace=False)
    uv[out_idx] += rng.uniform(15, 60, (n_out, 2)).astype(np.float32)
    valid = jnp.asarray(z > 0)
    xi = np.array([0.1, 0.05, -0.1, -0.01, 0.02, 0.005], np.float32)
    T_init = se3.compose(se3.exp(jnp.asarray(xi)), jnp.asarray(T_true))
    res = ba.pose_only_optimize(T_init, jnp.asarray(p_w), jnp.asarray(uv),
                                valid, FX, FY, CX, CY)
    err = np.asarray(se3.log(se3.compose(res.T_cw, se3.inverse(jnp.asarray(T_true)))))
    # translation within cm, rotation within ~1e-3 rad despite 20% outliers
    assert np.abs(err[:3]).max() < 0.03, err
    assert np.abs(err[3:]).max() < 3e-3, err
    # outliers flagged
    inl = np.asarray(res.inlier)
    assert inl[out_idx].mean() < 0.2
    assert inl.mean() > 0.7


def test_pose_only_handles_all_invalid():
    """Zero valid edges must not produce NaNs (fresh-start corner case)."""
    p_w = jnp.zeros((16, 3))
    uv = jnp.zeros((16, 2))
    valid = jnp.zeros(16, bool)
    T0 = se3.identity()
    res = ba.pose_only_optimize(T0, p_w, uv, valid, FX, FY, CX, CY)
    assert bool(jnp.all(jnp.isfinite(res.T_cw)))
    assert int(res.n_inliers) == 0


# ---------------------------------------------------------------------------
# local BA
# ---------------------------------------------------------------------------

def build_ba_problem(rng, W=8, M=256, n_kf=6, n_lm=150, noise=0.0,
                     perturb_pose=0.0, perturb_lm=0.0, outlier_frac=0.0):
    p_w, T = synth_scene(rng, n_points=n_lm, n_poses=n_kf)
    obs_uv = np.zeros((M, W, 2, 2), np.float32)
    obs_valid = np.zeros((M, W, 2), bool)
    for w in range(n_kf):
        for c, bx in enumerate([0.0, BASELINE]):
            uv, z = project(T[w], p_w, bx)
            ok = (z > 1.0) & (uv[:, 0] > -50) & (uv[:, 0] < 700)
            obs_uv[:n_lm, w, c] = uv
            obs_valid[:n_lm, w, c] = ok
    if noise > 0:
        obs_uv += rng.normal(0, noise, obs_uv.shape).astype(np.float32)
    if outlier_frac > 0:
        m = rng.uniform(size=obs_valid.shape) < outlier_frac
        obs_uv = np.where(m[..., None], obs_uv + rng.uniform(20, 80, obs_uv.shape).astype(np.float32), obs_uv)
    kf_T = np.zeros((W, 3, 4), np.float32)
    kf_T[:, :3, :3] = np.eye(3)
    kf_T[:n_kf] = T
    kf_valid = np.zeros(W, bool)
    kf_valid[:n_kf] = True
    kf_fixed = np.zeros(W, bool)
    kf_fixed[0] = True                 # gauge: first pose fixed
    lm_pos = np.zeros((M, 3), np.float32)
    lm_pos[:n_lm] = p_w
    lm_valid = np.zeros(M, bool)
    lm_valid[:n_lm] = True
    lm_fixed = np.zeros(M, bool)
    T_true = kf_T.copy()
    lm_true = lm_pos.copy()
    if perturb_pose > 0:
        for w in range(1, n_kf):
            xi = rng.normal(0, perturb_pose, 6).astype(np.float32)
            xi[3:] *= 0.1
            kf_T[w] = np.asarray(se3.compose(se3.exp(jnp.asarray(xi)),
                                             jnp.asarray(kf_T[w])))
    if perturb_lm > 0:
        lm_pos[:n_lm] += rng.normal(0, perturb_lm, (n_lm, 3)).astype(np.float32)
    prob = ba.LocalBAProblem(
        kf_T_cw=jnp.asarray(kf_T), kf_valid=jnp.asarray(kf_valid),
        kf_fixed=jnp.asarray(kf_fixed), lm_pos=jnp.asarray(lm_pos),
        lm_valid=jnp.asarray(lm_valid), lm_fixed=jnp.asarray(lm_fixed),
        obs_uv=jnp.asarray(obs_uv), obs_valid=jnp.asarray(obs_valid))
    return prob, T_true, lm_true, n_kf, n_lm


def test_local_ba_zero_residual_is_fixed_point(rng):
    prob, T_true, lm_true, n_kf, n_lm = build_ba_problem(rng)
    res = ba.local_ba(prob, FX, FY, CX, CY, BASELINE, max_rounds=1, iters=3)
    for w in range(n_kf):
        err = np.asarray(se3.log(se3.compose(
            res.kf_T_cw[w], se3.inverse(jnp.asarray(T_true[w])))))
        assert np.abs(err).max() < 1e-3, (w, err)
    np.testing.assert_allclose(np.asarray(res.lm_pos[:n_lm]), lm_true[:n_lm],
                               atol=2e-2)
    assert float(res.inlier_ratio) > 0.99


def test_local_ba_converges_from_perturbation(rng):
    prob, T_true, lm_true, n_kf, n_lm = build_ba_problem(
        rng, perturb_pose=0.1, perturb_lm=0.3)
    res = ba.local_ba(prob, FX, FY, CX, CY, BASELINE, max_rounds=5, iters=10)
    for w in range(n_kf):
        err = np.asarray(se3.log(se3.compose(
            res.kf_T_cw[w], se3.inverse(jnp.asarray(T_true[w])))))
        assert np.abs(err).max() < 5e-3, (w, err)
    lm_err = np.linalg.norm(np.asarray(res.lm_pos[:n_lm]) - lm_true[:n_lm], axis=1)
    assert np.median(lm_err) < 0.05, np.median(lm_err)


def test_local_ba_robust_to_outliers_and_noise(rng):
    prob, T_true, lm_true, n_kf, n_lm = build_ba_problem(
        rng, noise=0.5, outlier_frac=0.1, perturb_pose=0.05, perturb_lm=0.2)
    res = ba.local_ba(prob, FX, FY, CX, CY, BASELINE)
    for w in range(n_kf):
        err = np.asarray(se3.log(se3.compose(
            res.kf_T_cw[w], se3.inverse(jnp.asarray(T_true[w])))))
        assert np.abs(err[:3]).max() < 0.08, (w, err)
    # outlier edges detached
    assert float(res.inlier_ratio) > 0.75


def test_local_ba_fixed_pose_stays_fixed(rng):
    prob, T_true, _, n_kf, _ = build_ba_problem(rng, perturb_pose=0.1)
    res = ba.local_ba(prob, FX, FY, CX, CY, BASELINE)
    np.testing.assert_allclose(np.asarray(res.kf_T_cw[0]), T_true[0], atol=1e-7)


def test_local_ba_empty_window_no_nans():
    W, M = 4, 32
    prob = ba.LocalBAProblem(
        kf_T_cw=jnp.broadcast_to(se3.identity(), (W, 3, 4)),
        kf_valid=jnp.zeros(W, bool), kf_fixed=jnp.zeros(W, bool),
        lm_pos=jnp.zeros((M, 3)), lm_valid=jnp.zeros(M, bool),
        lm_fixed=jnp.zeros(M, bool), obs_uv=jnp.zeros((M, W, 2, 2)),
        obs_valid=jnp.zeros((M, W, 2), bool))
    res = ba.local_ba(prob, FX, FY, CX, CY, BASELINE, max_rounds=2, iters=3)
    assert bool(jnp.all(jnp.isfinite(res.kf_T_cw)))
    assert bool(jnp.all(jnp.isfinite(res.lm_pos)))
