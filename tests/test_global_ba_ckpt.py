"""Global BA path + SLAM checkpoint round-trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfplslam_tpu.config import (CameraParams, CapacityParams, Config,
                                 OrbParams)
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.models.slam import SLAMSystem


@pytest.fixture(scope="module")
def small_system():
    cfg = Config(
        cap=CapacityParams(n_pt=256, n_ln=128, n_kf_window=4, n_kf_max=16,
                           n_map_pt=2048, n_map_ln=512,
                           n_obs_pt=1024, n_obs_ln=256, vocab_k=64),
        orb=OrbParams(nlevels=2),
        camera=CameraParams(width=376, height=240, fx=217.6, fy=217.6,
                            cx=183.7, cy=126.1, baseline=0.11),
    )
    world = synthetic.make_world(n_frames=6, n_points=300, n_lines=40,
                                 seed=21)
    slam = SLAMSystem(cfg, run_loop_closure=False)
    for i in range(6):
        il, ir = synthetic.render_frame(world, i, noise=1.0)
        slam.process(il, ir, world.timestamps[i])
    return cfg, world, slam


def test_finish_with_global_ba(small_system):
    cfg, world, slam = small_system
    before = slam.keyframe_trajectory.copy()
    slam.finish(run_global_ba=True)
    after = slam.keyframe_trajectory
    assert np.all(np.isfinite(after))
    # refinement should not teleport keyframes
    assert np.abs(after - before).max() < 0.5


def test_slam_checkpoint_roundtrip(small_system, tmp_path):
    cfg, world, slam = small_system
    p = str(tmp_path / "slam.npz")
    slam.save(p)
    slam2 = SLAMSystem(cfg)
    slam2.load(p)
    assert int(slam2.map.n_kf) == int(slam.map.n_kf)
    np.testing.assert_allclose(np.asarray(slam2.map.kf_pose),
                               np.asarray(slam.map.kf_pose))
    np.testing.assert_allclose(np.asarray(slam2.loop_state.conf),
                               np.asarray(slam.loop_state.conf))
    np.testing.assert_allclose(np.asarray(slam2.vo.state.t_cam_w),
                               np.asarray(slam.vo.state.t_cam_w))
