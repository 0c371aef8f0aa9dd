"""Distributed BA on the virtual 8-device CPU mesh: correctness vs the
single-device solver and basic sharding hygiene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfplslam_tpu.models import ba
from gfplslam_tpu.parallel import dist_ba
from tests.test_ba import build_problem


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    return dist_ba.make_mesh(4)


def test_sharded_matches_single_device(rng, mesh):
    cam, gt_poses, pts, prob = build_problem(rng, k=4, p=64, l=16)
    res_single = ba.solve_ba(cam, prob, max_iters=10)
    sharded = dist_ba.shard_problem_by_landmark(prob, 4)
    res_dist = dist_ba.solve_ba_sharded(cam, sharded, mesh, max_iters=10)
    # identical keyframe poses up to float tolerance
    np.testing.assert_allclose(np.asarray(res_dist.kf_pose),
                               np.asarray(res_single.kf_pose),
                               rtol=1e-3, atol=1e-4)
    assert abs(float(res_dist.err) - float(res_single.err)) < 1e-5


def test_sharded_recovers_poses(rng, mesh):
    from gfplslam_tpu.utils import se3
    cam, gt_poses, pts, prob = build_problem(rng, k=4, p=64, l=16)
    sharded = dist_ba.shard_problem_by_landmark(prob, 4)
    res = dist_ba.solve_ba_sharded(cam, sharded, mesh, max_iters=15)
    est = np.asarray(res.kf_pose)
    for i in range(len(gt_poses)):
        rel = np.linalg.inv(gt_poses[i]) @ est[i]
        d = np.asarray(se3.logmap_se3(jnp.asarray(rel.astype(np.float32))))
        assert np.linalg.norm(d) < 5e-3, (i, d)


def test_shard_partition_preserves_observations(rng):
    cam, gt_poses, pts, prob = build_problem(rng, k=3, p=32, l=8)
    n_valid_before = int(np.asarray(prob.po_valid).sum())
    sharded = dist_ba.shard_problem_by_landmark(prob, 4)
    n_valid_after = int(np.asarray(sharded.po_valid).sum())
    assert n_valid_after == n_valid_before
    # every observation's landmark lives in the observation's shard block
    po_lm = np.asarray(sharded.po_lm)[np.asarray(sharded.po_valid)]
    n_lm = sharded.pt_pos.shape[0]
    per_obs = sharded.po_kf.shape[0] // 4
    block = n_lm // 4
    pos = np.nonzero(np.asarray(sharded.po_valid))[0]
    assert np.all(po_lm // block == pos // per_obs)
