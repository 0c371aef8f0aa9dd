"""End-to-end SLAM with loop closure on a synthetic revisit sequence.

The reference's loop-closure stack is only ever exercised by dataset batch
runs with real loops (batch_script/Run_EuRoC.py:8-49); this test builds the
equivalent in-repo: a closed square-ish trajectory that returns to its start,
VO drift injected at every keyframe, and the full ``SLAMSystem.process``
driven over it. It fails if loop closure is disabled or stops correcting the
trajectory (mapHandler.cpp loopClosure -> PGO -> fuse pipeline, :2801-2861,
:4187-4423, :4425-4714).
"""

import numpy as np
import pytest

from gfplslam_tpu.config import (CameraParams, CapacityParams, Config,
                                 OrbParams, SlamParams)
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.models.slam import SLAMSystem
from gfplslam_tpu.models.vo import VisualOdometry
from gfplslam_tpu.utils.trajectory import ate_rmse

N_FRAMES = 40


@pytest.fixture(scope="module")
def cfg():
    return Config(
        cap=CapacityParams(n_pt=256, n_ln=128, n_kf_window=4, n_kf_max=32,
                           n_map_pt=2048, n_map_ln=512,
                           n_obs_pt=1024, n_obs_ln=256, vocab_k=128),
        orb=OrbParams(nlevels=2),
        camera=CameraParams(width=376, height=240, fx=217.6, fy=217.6,
                            cx=183.7, cy=126.1, baseline=0.11),
        # loop-closure gates scaled to a 20-KF test sequence (the reference
        # defaults assume hundreds of KFs: lc_kf_dist=100, config.cpp:69)
        slam=SlamParams(max_kf_num_frames=2, lc_kf_dist=8,
                        lc_kf_max_dist=3, lc_nkf_closest=2),
    )


@pytest.fixture(scope="module")
def world():
    return synthetic.make_world(n_frames=N_FRAMES, n_points=400, n_lines=50,
                                seed=21, motion="loop")


@pytest.fixture(scope="module")
def frames(world):
    return [synthetic.render_frame(world, i, noise=1.0)
            for i in range(N_FRAMES)]


class DriftingVO(VisualOdometry):
    """VO wrapper that injects a fixed drift into every keyframe-relative
    motion — the controlled stand-in for real odometry drift, applied
    consistently to the VO trajectory AND the relative transform the map
    composes with, so the back-end sees exactly what a drifting front-end
    would hand it."""

    def __init__(self, cfg, drift):
        super().__init__(cfg)
        self._drift = np.asarray(drift, np.float64)

    def process(self, img_l, img_r, timestamp):
        pre_base = self.t_base_w.copy()
        rec = super().process(img_l, img_r, timestamp)
        if rec.is_kf and self.kf_count > 1:
            self.last_kf_rel = self.last_kf_rel @ self._drift
            self.t_base_w = pre_base @ self.last_kf_rel
            rec.t_cam_w = self.t_base_w.copy()
        return rec


def _drift_transform():
    ang = np.deg2rad(0.5)
    c, s = np.cos(ang), np.sin(ang)
    d = np.eye(4)
    d[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    d[:3, 3] = [0.010, 0.0, 0.005]
    return d


def _run(cfg, world, frames, run_loop_closure):
    slam = SLAMSystem(cfg, run_loop_closure=run_loop_closure,
                      vo=DriftingVO(cfg, _drift_transform()))
    for i in range(N_FRAMES):
        il, ir = frames[i]
        slam.process(il, ir, world.timestamps[i])
    slam.finish()
    assert not slam.vo.lost
    return slam


@pytest.fixture(scope="module")
def slam_lc(cfg, world, frames):
    return _run(cfg, world, frames, run_loop_closure=True)


@pytest.fixture(scope="module")
def slam_nolc(cfg, world, frames):
    return _run(cfg, world, frames, run_loop_closure=False)


def test_loop_closure_fires(slam_lc):
    assert slam_lc.n_loop_closures >= 1
    assert slam_lc.n_fused_landmarks > 0


def test_loop_closure_reduces_ate(cfg, world, slam_lc, slam_nolc):
    gt = world.poses
    ate_lc = ate_rmse(slam_lc.all_frame_trajectory, gt)
    ate_nolc = ate_rmse(slam_nolc.all_frame_trajectory, gt)
    assert slam_nolc.n_loop_closures == 0
    # the injected per-KF drift must be visible without loop closure and
    # substantially corrected with it
    assert ate_nolc > 0.04, ate_nolc
    assert ate_lc < ate_nolc, (ate_lc, ate_nolc)
    assert ate_lc < 0.75 * ate_nolc, (ate_lc, ate_nolc)


@pytest.fixture(scope="module")
def slam_async(cfg, world, frames):
    slam = SLAMSystem(cfg, run_loop_closure=True, async_mapping=True,
                      vo=DriftingVO(cfg, _drift_transform()))
    for i in range(N_FRAMES):
        il, ir = frames[i]
        slam.process(il, ir, world.timestamps[i])
    slam.finish()
    assert not slam.vo.lost
    return slam


def test_async_mapping_matches_sync(world, slam_lc, slam_async):
    """Asynchronous mapping (BA/LC dispatched at KF k, decisions harvested
    at KF k+1 — the capability the reference declared but never built,
    mapHandler.h:86-88) must still close the loop and land within tolerance
    of the synchronous trajectory."""
    assert slam_async.n_loop_closures >= 1
    gt = world.poses
    ate_sync = ate_rmse(slam_lc.all_frame_trajectory, gt)
    ate_async = ate_rmse(slam_async.all_frame_trajectory, gt)
    # one-KF-late corrections cost a little accuracy, not the loop itself
    assert ate_async < 2.0 * max(ate_sync, 0.01), (ate_async, ate_sync)
    # same number of keyframes — deferral must not drop map insertions
    assert len(slam_async.keyframe_trajectory) == len(
        slam_lc.keyframe_trajectory)


def _write_pgm(path, img):
    arr = np.clip(np.round(img), 0, 255).astype(np.uint8)
    h, w = arr.shape
    with open(path, "wb") as f:
        f.write(f"P5\n{w} {h}\n255\n".encode())
        f.write(arr.tobytes())


def test_file_backed_loop_reduced(cfg, tmp_path):
    """Default-tier variant of the full-capacity file-backed e2e
    (tests/test_slam_full_capacity_e2e.py, slow tier): textured raycast
    frames written as PGM, decoded by the native C++ loader with exact
    parity, driven through the TRAINED-vocabulary SLAM system (vocab_k=128
    — trained codebook shipped as data/vocab_synth_128.npz), loop closure
    verified on the revisit."""
    from gfplslam_tpu.io import native_loader
    from gfplslam_tpu.models import loop as loop_ops
    if not native_loader.native_available():
        pytest.skip("native dataloader not built")
    assert cfg.cap.vocab_k in loop_ops._TRAINED, \
        "128-word trained vocabulary missing — reduced tier would fall " \
        "back to random anchors"

    n = N_FRAMES
    world = synthetic.make_world(n_frames=n, n_points=400, n_lines=50,
                                 seed=21, motion="loop", cam=cfg.camera,
                                 textured=True)
    paths_l, paths_r, rendered = [], [], []
    for i in range(n):
        il, ir = synthetic.render_frame(world, i, noise=1.0)
        pl = str(tmp_path / f"l_{i:04d}.pgm")
        pr = str(tmp_path / f"r_{i:04d}.pgm")
        _write_pgm(pl, il)
        _write_pgm(pr, ir)
        paths_l.append(pl)
        paths_r.append(pr)
        rendered.append((np.round(np.clip(il, 0, 255)),
                         np.round(np.clip(ir, 0, 255))))

    loader = native_loader.StereoLoader(paths_l, paths_r, cfg.camera.width,
                                        cfg.camera.height, n_threads=2,
                                        queue_depth=4)
    decoded = [None] * n
    for k, il, ir in loader:
        decoded[k] = (il, ir)
    for k in range(n):
        np.testing.assert_array_equal(decoded[k][0], rendered[k][0])
        np.testing.assert_array_equal(decoded[k][1], rendered[k][1])

    slam = SLAMSystem(cfg)
    for i in range(n):
        slam.process(decoded[i][0], decoded[i][1], world.timestamps[i])
    slam.finish()
    assert not slam.vo.lost
    ate = ate_rmse(slam.all_frame_trajectory, world.poses)
    assert ate < 0.25, ate
    assert slam.n_loop_closures >= 1


def test_kf_trajectory_reflects_correction(world, slam_lc, slam_nolc):
    """The written KF trajectory must come from the optimized map — i.e.
    differ between the LC and no-LC runs (plslam_mod.cpp:538-566 writes map
    poses, not raw VO)."""
    kf_lc = slam_lc.keyframe_trajectory
    kf_nolc = slam_nolc.keyframe_trajectory
    n = min(len(kf_lc), len(kf_nolc))
    assert n >= 10
    delta = np.abs(kf_lc[:n, :3, 3] - kf_nolc[:n, :3, 3]).max()
    assert delta > 1e-3, delta
