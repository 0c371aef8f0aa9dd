"""Stereo front-end: detection + stereo matching + triangulation accuracy
on rendered synthetic scenes with known 3D geometry."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfplslam_tpu.config import CameraParams, CapacityParams, Config, LsdParams, OrbParams
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.models import frame as frame_mod


@pytest.fixture(scope="module")
def small_cfg():
    # small capacities keep CPU-test compile times down
    return Config(
        cap=CapacityParams(n_pt=256, n_ln=128, n_pt_match=128, n_ln_match=64),
        orb=OrbParams(nlevels=2),
        camera=CameraParams(width=376, height=240, fx=217.6, fy=217.6,
                            cx=183.7, cy=126.1, baseline=0.11),
    )


@pytest.fixture(scope="module")
def world():
    return synthetic.make_world(n_frames=3, n_points=250, n_lines=40, seed=2)


def test_stereo_triangulation_accuracy(small_cfg, world):
    cfg = small_cfg
    img_l, img_r = synthetic.render_frame(world, 0, noise=1.0)
    sf = frame_mod.process_stereo_pair(jnp.asarray(img_l), jnp.asarray(img_r),
                                       cfg, jnp.asarray(20.0))
    pts = sf.points
    cam = cfg.camera
    v = np.asarray(pts.valid)
    assert v.sum() > 30, f"only {v.sum()} stereo points"
    # associate each stereo point with a ground-truth point by projected
    # pixel distance, then check the measured disparity against the true
    # disparity (depth error at 20-40 m is dominated by the +-0.5 px quant
    # limit, so disparity — not metric depth — is the right accuracy gauge)
    t_wc = world.poses[0]
    gt_cam = (world.points - t_wc[:3, 3]) @ t_wc[:3, :3]
    front = gt_cam[:, 2] > 0.3
    gt_cam = gt_cam[front]
    gt_uv = np.stack([cam.fx * gt_cam[:, 0] / gt_cam[:, 2] + cam.cx,
                      cam.fy * gt_cam[:, 1] / gt_cam[:, 2] + cam.cy], 1)
    gt_disp = cam.fx * cam.baseline / gt_cam[:, 2]
    xy = np.asarray(pts.xy)[v]
    disp = np.asarray(pts.disp)[v]
    d_img = np.linalg.norm(xy[:, None, :] - gt_uv[None], axis=-1)
    nn = np.argmin(d_img, 1)
    # 5x5 textured landmark patches put corners up to ~3 px off-center
    matched = d_img[np.arange(len(xy)), nn] < 3.0
    assert matched.mean() > 0.7, f"image-space match rate {matched.mean()}"
    derr = np.abs(disp[matched] - gt_disp[nn[matched]])
    tol = np.maximum(1.5, 0.2 * gt_disp[nn[matched]])
    frac_good = float((derr < tol).mean())
    assert frac_good > 0.75, f"disparity inliers {frac_good}"


def test_stereo_lines_present(small_cfg, world):
    cfg = small_cfg
    img_l, img_r = synthetic.render_frame(world, 0, noise=1.0)
    sf = frame_mod.process_stereo_pair(jnp.asarray(img_l), jnp.asarray(img_r),
                                       cfg, jnp.asarray(20.0))
    n_ln = int(np.asarray(sf.lines.valid).sum())
    assert n_ln >= 3, f"only {n_ln} stereo lines"
    # triangulated endpoints must be in front of the camera, sane depth
    v = np.asarray(sf.lines.valid)
    z = np.asarray(sf.lines.sp3d)[v][:, 2]
    assert np.all(z > 0.1) and np.all(z < 100.0)


def test_line_uncertainty_model(small_cfg, world):
    cfg = small_cfg
    img_l, img_r = synthetic.render_frame(world, 0, noise=1.0)
    sf = frame_mod.process_stereo_pair(jnp.asarray(img_l), jnp.asarray(img_r),
                                       cfg, jnp.asarray(20.0))
    lns = frame_mod.estimate_line_uncertainty(cfg.camera, cfg, sf.lines)
    v = np.asarray(lns.valid)
    if v.sum() == 0:
        pytest.skip("no lines")
    cov = np.asarray(lns.cov_sp3d)[v]
    # symmetric PSD, larger covariance for farther endpoints
    for c in cov[:5]:
        np.testing.assert_allclose(c, c.T, atol=1e-5)
        assert np.all(np.linalg.eigvalsh(c) > -1e-6)
    z = np.asarray(lns.sp3d)[v][:, 2]
    tr = np.trace(cov, axis1=1, axis2=2)
    if v.sum() >= 8:
        # depth uncertainty grows with depth (disparity model)
        near = tr[z < np.median(z)].mean()
        far = tr[z >= np.median(z)].mean()
        assert far > near
