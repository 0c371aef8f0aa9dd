"""Pose-only robust GN: synthetic recovery of known motion, with outliers."""

import jax.numpy as jnp
import numpy as np

from gfplslam_tpu.config import EUROC_CAMERA, OptimizerParams
from gfplslam_tpu.models import pose_opt
from gfplslam_tpu.utils import se3


def make_scene(rng, n_pt=64, n_ln=32, twist_scale=0.05):
    cam = EUROC_CAMERA
    gt_twist = rng.normal(size=6).astype(np.float32) * twist_scale
    dt_gt = np.asarray(se3.expmap_se3(jnp.asarray(gt_twist)))

    p3d = np.stack([rng.uniform(-3, 3, n_pt), rng.uniform(-2, 2, n_pt),
                    rng.uniform(3, 10, n_pt)], 1).astype(np.float32)
    pc = p3d @ dt_gt[:3, :3].T + dt_gt[:3, 3]
    obs = np.stack([cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
                    cam.fy * pc[:, 1] / pc[:, 2] + cam.cy], 1).astype(np.float32)
    pts = pose_opt.PointMatches(
        p3d=jnp.asarray(p3d), obs=jnp.asarray(obs),
        sigma2=jnp.ones(n_pt), valid=jnp.ones(n_pt, bool))

    sp = np.stack([rng.uniform(-3, 3, n_ln), rng.uniform(-2, 2, n_ln),
                   rng.uniform(3, 10, n_ln)], 1).astype(np.float32)
    ep = sp + rng.normal(size=(n_ln, 3)).astype(np.float32)
    ep[:, 2] = np.abs(ep[:, 2]) + 3

    def proj(p):
        q = p @ dt_gt[:3, :3].T + dt_gt[:3, 3]
        return np.stack([cam.fx * q[:, 0] / q[:, 2] + cam.cx,
                         cam.fy * q[:, 1] / q[:, 2] + cam.cy], 1)
    sp2, ep2 = proj(sp), proj(ep)
    le = np.cross(np.concatenate([sp2, np.ones((n_ln, 1))], 1),
                  np.concatenate([ep2, np.ones((n_ln, 1))], 1))
    le /= np.linalg.norm(le[:, :2], axis=1, keepdims=True)
    lns = pose_opt.LineMatches(
        sp3d=jnp.asarray(sp), ep3d=jnp.asarray(ep),
        le_obs=jnp.asarray(le.astype(np.float32)),
        sigma2=jnp.ones(n_ln), valid=jnp.ones(n_ln, bool))
    return cam, dt_gt, pts, lns


def pose_err(dt_est, dt_gt):
    rel = np.asarray(dt_est) @ np.linalg.inv(dt_gt)
    return np.linalg.norm(np.asarray(se3.logmap_se3(jnp.asarray(
        rel.astype(np.float32)))))


def test_recover_motion_points_and_lines(rng):
    cam, dt_gt, pts, lns = make_scene(rng)
    opt = OptimizerParams()
    res = pose_opt.optimize_pose(cam, jnp.eye(4), pts, lns, opt, delta_t=1.0)
    assert bool(res.accepted)
    assert pose_err(res.dt, dt_gt) < 1e-3
    assert float(res.err) < 1e-4


def test_recover_motion_lines_only(rng):
    cam, dt_gt, pts, lns = make_scene(rng, n_pt=16)
    pts = pts._replace(valid=jnp.zeros_like(pts.valid))
    res = pose_opt.optimize_pose(cam, jnp.eye(4), pts, lns,
                                 OptimizerParams(), delta_t=1.0)
    assert bool(res.accepted)
    assert pose_err(res.dt, dt_gt) < 5e-3


def test_outlier_rejection(rng):
    cam, dt_gt, pts, lns = make_scene(rng)
    obs = np.array(pts.obs)
    obs[:8] += rng.uniform(30, 60, size=(8, 2))  # corrupt 8 points
    pts = pts._replace(obs=jnp.asarray(obs))
    res = pose_opt.optimize_pose(cam, jnp.eye(4), pts, lns,
                                 OptimizerParams(), delta_t=1.0)
    assert bool(res.accepted)
    # corrupted observations flagged as outliers
    assert np.asarray(res.pt_inlier)[:8].sum() <= 2
    assert pose_err(res.dt, dt_gt) < 5e-3


def test_too_few_features_falls_back(rng):
    cam, dt_gt, pts, lns = make_scene(rng, n_pt=4, n_ln=4)
    pts = pts._replace(valid=jnp.asarray([True] * 4))
    lns = lns._replace(valid=jnp.zeros(4, bool))
    res = pose_opt.optimize_pose(cam, jnp.eye(4), pts, lns,
                                 OptimizerParams(), delta_t=1.0)
    assert not bool(res.accepted)
    np.testing.assert_allclose(np.asarray(res.dt), np.eye(4))


def test_motion_gate_rejects_large_step(rng):
    cam, dt_gt, pts, lns = make_scene(rng, twist_scale=0.0)
    # fabricate a huge translation between frames: gt twist = 3m shift
    big = np.zeros(6, np.float32)
    big[0] = 3.0
    dt_big = np.asarray(se3.expmap_se3(jnp.asarray(big)))
    cam2, dt_gt2, pts2, lns2 = make_scene(rng, twist_scale=0.0)
    # rebuild observations with the big motion
    p3d = np.asarray(pts2.p3d)
    pc = p3d @ dt_big[:3, :3].T + dt_big[:3, 3]
    obs = np.stack([cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
                    cam.fy * pc[:, 1] / pc[:, 2] + cam.cy], 1)
    pts2 = pts2._replace(obs=jnp.asarray(obs.astype(np.float32)))
    lns2 = lns2._replace(valid=jnp.zeros_like(lns2.valid))
    # delta_t = 0.05 s -> max step 0.5 m < 3 m
    res = pose_opt.optimize_pose(cam, jnp.eye(4), pts2, lns2,
                                 OptimizerParams(), delta_t=0.05)
    assert not bool(res.accepted)
    assert float(res.err) == -1.0
