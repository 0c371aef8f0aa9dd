"""Good-line-cutting: info-matrix forms + objective behavior.

Mirrors the invariants the reference validates by Monte-Carlo simulation
(simulate_line_cut.cpp): the objective is well-behaved in the cut ratios,
cutting never *reduces* total information when the solver accepts a move,
and high-uncertainty line tails get trimmed.
"""

import jax.numpy as jnp
import numpy as np

from gfplslam_tpu.config import EUROC_CAMERA
from gfplslam_tpu.models import linecut
from gfplslam_tpu.models.pose_opt import LineMatches, PointMatches


def make_lines(rng, m=8, noisy_end=False):
    cam = EUROC_CAMERA
    sp = np.stack([rng.uniform(-2, 2, m), rng.uniform(-1, 1, m),
                   rng.uniform(3, 8, m)], 1).astype(np.float32)
    ep = sp + rng.normal(0, 1.0, (m, 3)).astype(np.float32)
    ep[:, 2] = np.abs(ep[:, 2]) + 3

    def proj(p):
        return np.stack([cam.fx * p[:, 0] / p[:, 2] + cam.cx,
                         cam.fy * p[:, 1] / p[:, 2] + cam.cy], 1)
    s2, e2 = proj(sp), proj(ep)
    le = np.cross(np.concatenate([s2, np.ones((m, 1))], 1),
                  np.concatenate([e2, np.ones((m, 1))], 1))
    le /= np.linalg.norm(le[:, :2], axis=1, keepdims=True)
    lns = LineMatches(sp3d=jnp.asarray(sp), ep3d=jnp.asarray(ep),
                      le_obs=jnp.asarray(le.astype(np.float32)),
                      sigma2=jnp.ones(m), valid=jnp.ones(m, bool))
    cov_s = jnp.tile(jnp.eye(3)[None] * 1e-4, (m, 1, 1))
    if noisy_end:
        cov_e = jnp.tile(jnp.eye(3)[None] * 1.0, (m, 1, 1))
    else:
        cov_e = jnp.tile(jnp.eye(3)[None] * 1e-4, (m, 1, 1))
    return cam, lns, cov_s, cov_e


def empty_points(n=4):
    return PointMatches(p3d=jnp.ones((n, 3)), obs=jnp.zeros((n, 2)),
                        sigma2=jnp.ones(n), valid=jnp.zeros(n, bool))


def test_info_matrix_psd(rng):
    cam, lns, cov_s, cov_e = make_lines(rng)
    info = linecut.pose_info_line(cam, jnp.eye(4), lns.sp3d[0], lns.ep3d[0],
                                  cov_s[0], cov_e[0], lns.le_obs[0],
                                  jnp.asarray(0.0), jnp.asarray(0.0))
    w = np.linalg.eigvalsh(np.asarray(info))
    # PSD up to float32 eigensolver noise, relative to the matrix scale
    assert np.all(w > -1e-5 * max(1.0, w.max()))
    assert np.all(np.isfinite(w))


def test_cut_monotone_improvement(rng):
    """Accepted moves must not decrease the summed-information log-volume."""
    cam, lns, cov_s, cov_e = make_lines(rng, noisy_end=True)
    pts = empty_points()
    cut = linecut.cut_lines(cam, jnp.eye(4), lns, cov_s, cov_e, pts)
    base = linecut.cut_lines(cam, jnp.eye(4), lns, cov_s, cov_e, pts,
                             max_steps=0)
    ld_final = float(linecut._logdet_pd(cut.info_sum))
    ld_base = float(linecut._logdet_pd(base.info_sum))
    assert ld_final >= ld_base - 1e-6


def test_cut_trims_noisy_endpoint(rng):
    """With a high-covariance end point, the solver should cut from that
    side (r1 > 0) on at least some lines, and never exceed feasibility."""
    cam, lns, cov_s, cov_e = make_lines(rng, m=12, noisy_end=True)
    cut = linecut.cut_lines(cam, jnp.eye(4), lns, cov_s, cov_e,
                            empty_points())
    r0 = np.asarray(cut.r0)
    r1 = np.asarray(cut.r1)
    assert np.all(r0 + r1 <= 1.0 + 1e-6)
    assert np.all((r0 >= 0) & (r1 >= 0))
    assert r1.sum() > r0.sum()  # noisy side trimmed more
    assert r1.max() > 0.0


def test_cut_deterministic_and_feasible(rng):
    """Equal endpoint covariances: the interpolated-covariance model
    (getPoseInfoOnLine interpolation, which averages noise toward the
    middle) legitimately rewards interior cuts — so we check determinism
    and feasibility rather than 'no cut'."""
    cam, lns, cov_s, cov_e = make_lines(rng, noisy_end=False)
    c1 = linecut.cut_lines(cam, jnp.eye(4), lns, cov_s, cov_e, empty_points())
    c2 = linecut.cut_lines(cam, jnp.eye(4), lns, cov_s, cov_e, empty_points())
    np.testing.assert_array_equal(np.asarray(c1.r0), np.asarray(c2.r0))
    r0, r1 = np.asarray(c1.r0), np.asarray(c1.r1)
    assert np.all(r0 + r1 <= 1.0 + 1e-6)
    assert np.all((r0 >= -1e-6) & (r1 >= -1e-6))


def test_apply_cut_interpolates(rng):
    cam, lns, cov_s, cov_e = make_lines(rng, m=4)
    cut = linecut.CutResult(r0=jnp.asarray([0.5, 0.0, 0.0, 0.0]),
                            r1=jnp.zeros(4), info=jnp.zeros((4, 6, 6)),
                            info_sum=jnp.eye(6), iters=jnp.asarray(0))
    out = linecut.apply_cut(cam, lns, cut)
    expect = 0.5 * (np.asarray(lns.sp3d[0]) + np.asarray(lns.ep3d[0]))
    np.testing.assert_allclose(np.asarray(out.sp3d[0]), expect, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.sp3d[1]),
                               np.asarray(lns.sp3d[1]))


def test_batched_factors_match_closed_form(rng):
    """`line_info_factors_batch` (the lane-batched SoA form the cut search
    runs on) must agree with the per-line closed form `line_info_factors`
    for random geometry, ratios, and anisotropic covariances."""
    import jax
    from gfplslam_tpu.utils import se3

    cam, lns, _, _ = make_lines(rng, m=16)
    a = rng.normal(0, 0.1, (16, 3, 3)).astype(np.float32)
    cov_s = jnp.asarray(a @ a.transpose(0, 2, 1) + 1e-4 * np.eye(3))
    a = rng.normal(0, 0.1, (16, 3, 3)).astype(np.float32)
    cov_e = jnp.asarray(a @ a.transpose(0, 2, 1) + 1e-4 * np.eye(3))
    dt = se3.expmap_se3(jnp.asarray(rng.normal(0, 0.1, 6)))
    r0 = jnp.asarray(rng.uniform(0, 0.45, 16).astype(np.float32))
    r1 = jnp.asarray(rng.uniform(0, 0.45, 16).astype(np.float32))

    jv, dv = jax.vmap(
        lambda s, e, c1, c2, l, a_, b_: linecut.line_info_factors(
            cam, dt, s, e, c1, c2, l, a_, b_))(
        lns.sp3d, lns.ep3d, cov_s, cov_e, lns.le_obs, r0, r1)
    jb, db = linecut.line_info_factors_batch(
        cam, dt, lns.sp3d, lns.ep3d, cov_s, cov_e, lns.le_obs, r0, r1)
    np.testing.assert_allclose(np.asarray(jb), np.asarray(jv),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db), np.asarray(dv), rtol=2e-4)
