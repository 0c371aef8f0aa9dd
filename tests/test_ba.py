"""Schur-complement bundle adjustment: synthetic window recovery."""

import jax.numpy as jnp
import numpy as np

from gfplslam_tpu.config import EUROC_CAMERA
from gfplslam_tpu.models import ba
from gfplslam_tpu.utils import se3


def build_problem(rng, k=4, p=64, l=16, pose_noise=0.01, lm_noise=0.05,
                  obs_noise=0.0):
    cam = EUROC_CAMERA
    # ground-truth keyframe poses along +z
    gt_poses = []
    for i in range(k):
        tw = np.zeros(6, np.float32)
        tw[2] = 0.3 * i
        tw[4] = 0.01 * i
        gt_poses.append(np.asarray(se3.expmap_se3(jnp.asarray(tw))))
    gt_poses = np.stack(gt_poses)  # cam->world

    pts = np.stack([rng.uniform(-3, 3, p), rng.uniform(-2, 2, p),
                    rng.uniform(4, 12, p)], 1).astype(np.float32)
    lsp = np.stack([rng.uniform(-3, 3, l), rng.uniform(-2, 2, l),
                    rng.uniform(4, 12, l)], 1).astype(np.float32)
    lep = lsp + rng.normal(0, 1, (l, 3)).astype(np.float32)
    lep[:, 2] = np.abs(lep[:, 2]) + 4

    def proj(t_wc, x):
        t_cw = np.linalg.inv(t_wc)
        pc = t_cw[:3, :3] @ x + t_cw[:3, 3]
        return np.array([cam.fx * pc[0] / pc[2] + cam.cx,
                         cam.fy * pc[1] / pc[2] + cam.cy])

    po_kf, po_lm, po_uv = [], [], []
    for ki in range(k):
        for pi in range(p):
            uv = proj(gt_poses[ki], pts[pi])
            if 0 <= uv[0] < cam.width and 0 <= uv[1] < cam.height:
                po_kf.append(ki)
                po_lm.append(pi)
                po_uv.append(uv + rng.normal(0, obs_noise, 2))
    lo_kf, lo_lm, lo_le = [], [], []
    for ki in range(k):
        for li in range(l):
            s2 = proj(gt_poses[ki], lsp[li])
            e2 = proj(gt_poses[ki], lep[li])
            le = np.cross([*s2, 1.0], [*e2, 1.0])
            le /= np.linalg.norm(le[:2])
            lo_kf.append(ki)
            lo_lm.append(li)
            lo_le.append(le)

    n_op, n_ol = 512, 128
    po_valid = np.zeros(n_op, bool)
    po_valid[:len(po_kf)] = True
    lo_valid = np.zeros(n_ol, bool)
    lo_valid[:len(lo_kf)] = True

    def pad(arr, n, shape=()):
        out = np.zeros((n, *shape), np.float32)
        out[:len(arr)] = np.asarray(arr, np.float32)
        return out

    # noisy initialization
    noisy_poses = gt_poses.copy()
    for i in range(1, k):
        pert = rng.normal(0, pose_noise, 6).astype(np.float32)
        noisy_poses[i] = noisy_poses[i] @ np.asarray(
            se3.expmap_se3(jnp.asarray(pert)))
    noisy_pts = pts + rng.normal(0, lm_noise, pts.shape).astype(np.float32)
    noisy_lsp = lsp + rng.normal(0, lm_noise, lsp.shape).astype(np.float32)
    noisy_lep = lep + rng.normal(0, lm_noise, lep.shape).astype(np.float32)

    prob = ba.BAProblem(
        kf_pose=jnp.asarray(noisy_poses),
        kf_free=jnp.asarray([False] + [True] * (k - 1)),
        kf_valid=jnp.ones(k, bool),
        pt_pos=jnp.asarray(noisy_pts), pt_valid=jnp.ones(p, bool),
        ln_sp=jnp.asarray(noisy_lsp), ln_ep=jnp.asarray(noisy_lep),
        ln_valid=jnp.ones(l, bool),
        po_kf=jnp.asarray(pad(po_kf, n_op), jnp.int32),
        po_lm=jnp.asarray(pad(po_lm, n_op), jnp.int32),
        po_uv=jnp.asarray(pad(po_uv, n_op, (2,))),
        po_sigma2=jnp.ones(n_op), po_valid=jnp.asarray(po_valid),
        lo_kf=jnp.asarray(pad(lo_kf, n_ol), jnp.int32),
        lo_lm=jnp.asarray(pad(lo_lm, n_ol), jnp.int32),
        lo_le=jnp.asarray(pad(lo_le, n_ol, (3,))),
        lo_sigma2=jnp.ones(n_ol), lo_valid=jnp.asarray(lo_valid),
    )
    return cam, gt_poses, pts, prob


def test_ba_reduces_error(rng):
    cam, gt_poses, pts, prob = build_problem(rng)
    t_cw0 = jnp.asarray(np.stack([np.linalg.inv(p) for p in
                                  np.asarray(prob.kf_pose)]))
    err0 = float(ba._total_error(cam, t_cw0, prob, prob.pt_pos,
                                 prob.ln_sp, prob.ln_ep))
    res = ba.solve_ba(cam, prob)
    assert float(res.err) < err0 * 0.05, (err0, float(res.err))


def test_ba_recovers_poses(rng):
    cam, gt_poses, pts, prob = build_problem(rng)
    res = ba.solve_ba(cam, prob)
    est = np.asarray(res.kf_pose)
    for i in range(len(gt_poses)):
        rel = np.linalg.inv(gt_poses[i]) @ est[i]
        d = np.asarray(se3.logmap_se3(jnp.asarray(rel.astype(np.float32))))
        assert np.linalg.norm(d) < 5e-3, (i, d)


def test_ba_gauge_fixed(rng):
    cam, gt_poses, pts, prob = build_problem(rng)
    res = ba.solve_ba(cam, prob)
    np.testing.assert_allclose(np.asarray(res.kf_pose)[0],
                               np.asarray(prob.kf_pose)[0], atol=1e-6)


def test_ba_marks_outlier_observations(rng):
    cam, gt_poses, pts, prob = build_problem(rng)
    uv = np.array(prob.po_uv)
    uv[3] += 50.0  # corrupt one observation
    prob = prob._replace(po_uv=jnp.asarray(uv))
    res = ba.solve_ba(cam, prob)
    assert not bool(res.po_inlier[3])
    # most other observations stay inliers
    ok = np.asarray(res.po_inlier)[np.asarray(prob.po_valid)]
    assert ok.mean() > 0.9


def test_ba_noisy_observations_converge(rng):
    cam, gt_poses, pts, prob = build_problem(rng, obs_noise=0.3)
    res = ba.solve_ba(cam, prob)
    est = np.asarray(res.kf_pose)
    for i in range(len(gt_poses)):
        rel = np.linalg.inv(gt_poses[i]) @ est[i]
        d = np.asarray(se3.logmap_se3(jnp.asarray(rel.astype(np.float32))))
        assert np.linalg.norm(d) < 5e-2, (i, d)
