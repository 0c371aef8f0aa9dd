"""Full SLAM system end-to-end on synthetic sequences."""

import numpy as np
import pytest

from gfplslam_tpu.config import (CameraParams, CapacityParams, Config,
                                 OrbParams, SlamParams)
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.models.slam import SLAMSystem
from gfplslam_tpu.utils.trajectory import ate_rmse


@pytest.fixture(scope="module")
def cfg():
    return Config(
        cap=CapacityParams(n_pt=256, n_ln=128, n_kf_window=4, n_kf_max=32,
                           n_map_pt=2048, n_map_ln=512,
                           n_obs_pt=1024, n_obs_ln=256, vocab_k=128),
        orb=OrbParams(nlevels=2),
        camera=CameraParams(width=376, height=240, fx=217.6, fy=217.6,
                            cx=183.7, cy=126.1, baseline=0.11),
    )


def test_slam_full_pipeline(cfg):
    world = synthetic.make_world(n_frames=10, n_points=300, n_lines=40,
                                 seed=11)
    slam = SLAMSystem(cfg)
    for i in range(10):
        il, ir = synthetic.render_frame(world, i, noise=1.0)
        slam.process(il, ir, world.timestamps[i])
    slam.finish()
    assert not slam.vo.lost
    n_kf = int(slam.map.n_kf)
    assert n_kf >= 2
    # map grew landmarks and observations
    assert int(np.asarray(slam.map.pt_valid).sum()) > 100
    assert int(np.asarray(slam.map.po_valid).sum()) > 150
    # keyframe poses stay finite and near the VO trajectory
    kf_traj = slam.keyframe_trajectory
    assert np.all(np.isfinite(kf_traj))
    rmse = ate_rmse(slam.vo.trajectory, world.poses)
    assert rmse < 0.08, rmse


def test_slam_vo_only_parity(cfg):
    """With mapping disabled the driver should still produce a trajectory."""
    world = synthetic.make_world(n_frames=5, n_points=300, n_lines=40,
                                 seed=12)
    slam = SLAMSystem(cfg, run_local_ba=False, run_loop_closure=False)
    for i in range(5):
        il, ir = synthetic.render_frame(world, i, noise=1.0)
        slam.process(il, ir, world.timestamps[i])
    assert len(slam.vo.records) == 5
    assert int(slam.map.n_kf) >= 1


def test_chunk_driver_matches_per_frame(cfg):
    """The streaming chunk driver (SLAMSystem.process_chunk — one tracking
    scan dispatch + one packed host transfer per chunk) must reproduce the
    per-frame driver's trajectory quality and map growth on the same
    sequence."""
    n = 24
    world = synthetic.make_world(n_frames=n, n_points=300, n_lines=40,
                                 seed=11)
    frames = [synthetic.render_frame(world, i, noise=1.0) for i in range(n)]

    per = SLAMSystem(cfg)
    for i in range(n):
        per.process(frames[i][0], frames[i][1], world.timestamps[i])
    per.finish()

    chunked = SLAMSystem(cfg)
    for s in range(0, n, 8):
        chunked.process_chunk(
            np.stack([f[0] for f in frames[s:s + 8]]),
            np.stack([f[1] for f in frames[s:s + 8]]),
            world.timestamps[s:s + 8])
    chunked.finish()

    assert not chunked.vo.lost
    assert len(chunked.vo.records) == n
    ate_per = ate_rmse(per.all_frame_trajectory, world.poses)
    ate_chunk = ate_rmse(chunked.all_frame_trajectory, world.poses)
    # same engine, same numerics — chunking only changes dispatch batching
    # (KF cadence can differ slightly: the per-frame driver rebases the
    # tracker at KFs, the chunk carry does not)
    assert ate_chunk < max(2.0 * ate_per, 0.05), (ate_chunk, ate_per)
    n_kf_per = len(per.keyframe_trajectory)
    n_kf_chunk = len(chunked.keyframe_trajectory)
    assert abs(n_kf_per - n_kf_chunk) <= max(3, n_kf_per // 3), \
        (n_kf_per, n_kf_chunk)


def test_chunk_driver_epoch_timestamps(cfg):
    """EuRoC timestamps are epoch-scale (~1.4e9 s); at float32 resolution
    (128 s there) consecutive-frame dt rounds to 0 and the motion gate
    rejects all real motion. The chunk driver must normalize on the host in
    float64 so an epoch-based run reproduces the 0-based run exactly."""
    n = 16
    world = synthetic.make_world(n_frames=n, n_points=300, n_lines=40,
                                 seed=11)
    frames = [synthetic.render_frame(world, i, noise=1.0) for i in range(n)]
    il = np.stack([f[0] for f in frames])
    ir = np.stack([f[1] for f in frames])

    runs = []
    for base in (0.0, 1.403715273262e9):
        s = SLAMSystem(cfg)
        for st in range(0, n, 8):
            s.process_chunk(il[st:st + 8], ir[st:st + 8],
                            world.timestamps[st:st + 8] + base)
        s.finish()
        assert not s.vo.lost
        runs.append(s)
    t0 = runs[0].all_frame_trajectory
    t1 = runs[1].all_frame_trajectory
    np.testing.assert_allclose(t1, t0, atol=1e-5)
    # frames after frame 0 were actually accepted (the epoch bug rejected
    # every frame via the motion gate, leaving the trajectory at identity)
    assert np.linalg.norm(t1[-1][:3, 3]) > 1e-3


def test_run_sequence_uint8_matches_chunk_driver(cfg):
    """run_sequence (uint8 camera bytes, double-buffered device staging,
    equal-size scan chunks) is the same engine as process_chunk: identical
    input bytes must give an equivalent trajectory and map."""
    n = 17  # frame 0 + 2 chunks x 8
    world = synthetic.make_world(n_frames=n, n_points=300, n_lines=40,
                                 seed=11)
    frames = [synthetic.render_frame(world, i, noise=1.0) for i in range(n)]
    il = np.clip(np.round(np.stack([f[0] for f in frames])),
                 0, 255).astype(np.uint8)
    ir = np.clip(np.round(np.stack([f[1] for f in frames])),
                 0, 255).astype(np.uint8)

    a = SLAMSystem(cfg)
    a.run_sequence(il, ir, world.timestamps, chunk=8)
    a.finish()

    b = SLAMSystem(cfg)
    b.process_chunk(il[:9], ir[:9], world.timestamps[:9])
    b.process_chunk(il[9:], ir[9:], world.timestamps[9:])
    b.finish()

    assert not a.vo.lost
    assert len(a.vo.records) == n
    np.testing.assert_allclose(a.all_frame_trajectory,
                               b.all_frame_trajectory, atol=1e-5)
    ate = ate_rmse(a.all_frame_trajectory, world.poses)
    assert ate < 0.08, ate
