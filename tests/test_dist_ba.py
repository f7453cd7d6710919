"""Distributed BA on a virtual 8-device CPU mesh: must match single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssvio_tpu.ops import ba, se3
from ssvio_tpu.parallel import dist_ba
from tests.test_ba import BASELINE, CX, CY, FX, FY, build_ba_problem


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 2:
        pytest.skip("needs multiple (virtual) devices")
    return dist_ba.make_mesh()


def test_distributed_matches_single_device(mesh):
    rng = np.random.default_rng(11)
    prob, T_true, lm_true, n_kf, n_lm = build_ba_problem(
        rng, W=8, M=256, perturb_pose=0.08, perturb_lm=0.25)
    res_single = ba.local_ba(prob, FX, FY, CX, CY, BASELINE)

    step = dist_ba.distributed_local_ba(mesh, FX, FY, CX, CY, BASELINE)
    prob_sharded = dist_ba.shard_problem(mesh, prob)
    res_dist = step(prob_sharded)

    # identical math modulo reduction order: poses should agree tightly
    np.testing.assert_allclose(np.asarray(res_dist.kf_T_cw),
                               np.asarray(res_single.kf_T_cw), atol=5e-4)
    np.testing.assert_allclose(np.asarray(res_dist.lm_pos[:n_lm]),
                               np.asarray(res_single.lm_pos[:n_lm]), atol=5e-3)
    assert abs(float(res_dist.inlier_ratio) - float(res_single.inlier_ratio)) < 0.02


def test_distributed_converges_to_truth(mesh):
    rng = np.random.default_rng(12)
    prob, T_true, lm_true, n_kf, n_lm = build_ba_problem(
        rng, W=8, M=512, n_lm=300, noise=0.3, perturb_pose=0.08, perturb_lm=0.2)
    step = dist_ba.distributed_local_ba(mesh, FX, FY, CX, CY, BASELINE)
    res = step(dist_ba.shard_problem(mesh, prob))
    for w in range(n_kf):
        err = np.asarray(se3.log(se3.compose(
            res.kf_T_cw[w], se3.inverse(jnp.asarray(T_true[w])))))
        assert np.abs(err[:3]).max() < 0.05, (w, err)


def test_sharding_layout_is_respected(mesh):
    rng = np.random.default_rng(13)
    prob, *_ = build_ba_problem(rng, W=8, M=256)
    sharded = dist_ba.shard_problem(mesh, prob)
    n_dev = len(mesh.devices.ravel())
    # landmark arrays split across devices, pose arrays replicated
    assert len(sharded.lm_pos.addressable_shards) == n_dev
    shard_rows = sharded.lm_pos.addressable_shards[0].data.shape[0]
    assert shard_rows == 256 // n_dev
    assert sharded.kf_T_cw.addressable_shards[0].data.shape == (8, 3, 4)
