"""Worker process for tests/test_multihost.py.

Usage: python multihost_worker.py <coordinator> <num_processes> <pid>

Joins a 2-process CPU jax.distributed runtime (4 virtual devices per
process -> one global 8-device mesh), builds the SAME synthetic BA
problem in every process (shared seed), shards it landmark-wise over the
GLOBAL mesh, runs parallel.dist_ba's distributed solve, and prints the
optimized (replicated) window poses as JSON so the parent can check
cross-process agreement and correctness.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from ssvio_tpu.parallel import multihost

    assert multihost.initialize(coordinator, nproc, pid)
    assert jax.process_count() == nproc
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 4 * nproc and n_local == 4, (n_global, n_local)

    import jax.numpy as jnp
    import numpy as np

    from ssvio_tpu.ops import ba
    from ssvio_tpu.parallel import dist_ba

    # same synthetic BA problem in every process (shared seed): a straight
    # window observing noisy landmarks through both eyes
    M, W = 512, 8
    rng = np.random.default_rng(0)
    fx = fy = 718.0
    cx, cy = 607.0, 185.0
    baseline = 0.537
    p_w = np.stack([rng.uniform(-20, 20, M), rng.uniform(-5, 5, M),
                    rng.uniform(5, 60, M)], -1).astype(np.float32)
    kf_T = np.zeros((W, 3, 4), np.float32)
    kf_T[:, :3, :3] = np.eye(3)
    for w in range(W):
        kf_T[w, 2, 3] = -0.8 * w
    obs_uv = np.zeros((M, W, 2, 2), np.float32)
    obs_valid = np.zeros((M, W, 2), bool)
    for w in range(W):
        for c, bx in enumerate([0.0, baseline]):
            pc = p_w @ kf_T[w, :, :3].T + kf_T[w, :, 3] - np.array([bx, 0, 0])
            uv = np.stack([fx * pc[:, 0] / pc[:, 2] + cx,
                           fy * pc[:, 1] / pc[:, 2] + cy], -1)
            obs_uv[:, w, c] = uv + rng.normal(0, 0.3, uv.shape)
            obs_valid[:, w, c] = ((pc[:, 2] > 1.0)
                                  & (np.abs(uv[:, 0] - cx) < 640)
                                  & (np.abs(uv[:, 1] - cy) < 200))
    kf_fixed = np.zeros(W, bool)
    kf_fixed[0] = True
    prob = ba.LocalBAProblem(
        kf_T_cw=jnp.asarray(kf_T + rng.normal(0, 1e-3, kf_T.shape)
                            .astype(np.float32)),
        kf_valid=jnp.ones(W, bool), kf_fixed=jnp.asarray(kf_fixed),
        lm_pos=jnp.asarray(p_w + rng.normal(0, 0.05, p_w.shape)
                           .astype(np.float32)),
        lm_valid=jnp.ones(M, bool), lm_fixed=jnp.zeros(M, bool),
        obs_uv=jnp.asarray(obs_uv), obs_valid=jnp.asarray(obs_valid))

    mesh = multihost.global_mesh()
    step = dist_ba.distributed_local_ba(mesh, fx, fy, cx, cy, baseline,
                                        max_rounds=1, iters=5)
    sp = dist_ba.shard_problem(mesh, prob)
    res = step(sp)
    # kf_T_cw is replicated -> every process holds the full value locally
    kf = np.asarray(res.kf_T_cw.addressable_shards[0].data)
    inl = float(np.asarray(res.inlier_ratio.addressable_shards[0].data))
    print("RESULT " + json.dumps({
        "pid": pid, "kf": kf.reshape(-1).round(6).tolist(),
        "inlier_ratio": inl, "n_global_devices": n_global}))


if __name__ == "__main__":
    main()
