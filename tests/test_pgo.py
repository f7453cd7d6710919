"""Pose-graph optimization tests: loop-closure drift correction."""

import jax.numpy as jnp
import numpy as np
import pytest

from ssvio_tpu.ops import pgo, se3


def make_circle_graph(rng, n=40, radius=10.0, drift=0.02):
    """Ground-truth poses on a circle; odometry measurements exact, estimates
    accumulated with per-step drift; one loop edge last->first."""
    T_true = []
    for k in range(n):
        ang = 2 * np.pi * k / n
        c, s = np.cos(ang), np.sin(ang)
        R_wc = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        t_wc = np.array([radius * np.sin(ang), 0, radius * (1 - np.cos(ang))],
                        np.float32)
        T_wc = np.concatenate([R_wc, t_wc[:, None]], axis=1)
        T_true.append(np.asarray(se3.inverse(jnp.asarray(T_wc))))
    T_true = np.stack(T_true)

    # exact odometry measurements Z_k = T_k+1 * T_k^-1
    Zs = [np.asarray(se3.compose(jnp.asarray(T_true[k + 1]),
                                 se3.inverse(jnp.asarray(T_true[k]))))
          for k in range(n - 1)]
    # drifted estimates: integrate noisy odometry
    est = [T_true[0]]
    for k in range(n - 1):
        noise = rng.normal(0, drift, 6).astype(np.float32)
        noise[3:] *= 0.3
        Zn = np.asarray(se3.compose(se3.exp(jnp.asarray(noise)), jnp.asarray(Zs[k])))
        est.append(np.asarray(se3.compose(jnp.asarray(Zn), jnp.asarray(est[-1]))))
    est = np.stack(est)
    return T_true, est, Zs


def build_problem(T_true, est, Zs, loop_pairs, P=None):
    n = len(est)
    P = P or n
    E = (n - 1) + len(loop_pairs)
    ei = np.zeros(E, np.int32)
    ej = np.zeros(E, np.int32)
    Z = np.zeros((E, 3, 4), np.float32)
    for k in range(n - 1):
        ei[k], ej[k] = k + 1, k
        Z[k] = Zs[k]
    for m, (i, j) in enumerate(loop_pairs):
        ei[n - 1 + m], ej[n - 1 + m] = i, j
        Z[n - 1 + m] = np.asarray(se3.compose(jnp.asarray(T_true[i]),
                                              se3.inverse(jnp.asarray(T_true[j]))))
    poses = np.zeros((P, 3, 4), np.float32)
    poses[:, :3, :3] = np.eye(3)
    poses[:n] = est
    pose_valid = np.zeros(P, bool)
    pose_valid[:n] = True
    pose_fixed = np.zeros(P, bool)
    pose_fixed[0] = True
    return pgo.PGOProblem(
        poses=jnp.asarray(poses), pose_valid=jnp.asarray(pose_valid),
        pose_fixed=jnp.asarray(pose_fixed), edge_i=jnp.asarray(ei),
        edge_j=jnp.asarray(ej), edge_Z=jnp.asarray(Z),
        edge_valid=jnp.ones(E, bool), edge_weight=jnp.ones(E, jnp.float32))


def ate(T_est, T_true):
    """mean camera-center error."""
    c_est = np.stack([np.asarray(se3.translation(se3.inverse(jnp.asarray(T))))
                      for T in T_est])
    c_true = np.stack([np.asarray(se3.translation(se3.inverse(jnp.asarray(T))))
                       for T in T_true])
    return np.linalg.norm(c_est - c_true, axis=1).mean()


def test_pgo_zero_residual_fixed_point(rng):
    T_true, est, Zs = make_circle_graph(rng, n=20, drift=0.0)
    prob = build_problem(T_true, est, Zs, [(0, 19)])
    out = np.asarray(pgo.optimize(prob, iters=5))
    assert ate(out[:20], T_true) < 1e-4


def test_pgo_closes_the_loop(rng):
    T_true, est, Zs = make_circle_graph(rng, n=40, drift=0.02)
    before = ate(est, T_true)
    prob = build_problem(T_true, est, Zs, [(39, 0), (20, 19)])
    out = np.asarray(pgo.optimize(prob, iters=20))
    after = ate(out[:40], T_true)
    assert before > 0.15          # drift actually accumulated
    assert after < before * 0.35, (before, after)


def test_pgo_respects_fixed_and_padding(rng):
    T_true, est, Zs = make_circle_graph(rng, n=16, drift=0.02)
    prob = build_problem(T_true, est, Zs, [(15, 0)], P=32)  # padded slots
    out = np.asarray(pgo.optimize(prob, iters=15))
    np.testing.assert_allclose(out[0], est[0], atol=1e-6)   # fixed vertex
    assert np.all(np.isfinite(out))


def test_pgo_all_fixed_is_identity(rng):
    T_true, est, Zs = make_circle_graph(rng, n=8, drift=0.05)
    prob = build_problem(T_true, est, Zs, [])
    prob = prob._replace(pose_fixed=prob.pose_valid)
    out = np.asarray(pgo.optimize(prob, iters=5))
    np.testing.assert_allclose(out[:8], est, atol=1e-6)


def test_pgo_cg_matches_dense(rng):
    """The matrix-free CG path must reach the dense solution (same graph,
    both well within their iteration budgets)."""
    T_true, est, Zs = make_circle_graph(rng, n=40, drift=0.02)
    prob = build_problem(T_true, est, Zs, [(39, 0), (20, 19)])
    out_d = np.asarray(pgo._optimize_dense(prob, iters=20))
    out_c = np.asarray(pgo._optimize_cg(prob, iters=20))
    # both correct vs ground truth and mutually close
    assert ate(out_c[:40], T_true) < ate(est, T_true) * 0.35
    assert abs(ate(out_c[:40], T_true) - ate(out_d[:40], T_true)) < 0.02


@pytest.mark.slow
def test_pgo_large_p_uses_cg_and_converges(rng):
    """P=2048 (KITTI-02 keyframe scale): the dense [6P,6P] factor would be
    ~600 MB; optimize() must dispatch to CG and still close the loop."""
    n = 600                      # valid poses; slots padded to 2048
    T_true, est, Zs = make_circle_graph(rng, n=n, drift=0.01)
    before = ate(est, T_true)
    prob = build_problem(T_true, est, Zs, [(n - 1, 0), (n // 2, n // 2 - 1)],
                         P=2048)
    assert prob.poses.shape[0] > pgo.DENSE_MAX_POSES
    out = np.asarray(pgo.optimize(prob, iters=15))
    after = ate(out[:n], T_true)
    assert np.all(np.isfinite(out))
    assert before > 0.3
    assert after < before * 0.35, (before, after)
