"""End-to-end visual odometry on a synthetic sequence with ground truth."""

import numpy as np
import pytest

from gfplslam_tpu.config import CameraParams, CapacityParams, Config, OrbParams
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.models.vo import VisualOdometry
from gfplslam_tpu.utils.trajectory import ate_rmse


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        cap=CapacityParams(n_pt=256, n_ln=128, n_pt_match=128, n_ln_match=64),
        orb=OrbParams(nlevels=2),
        camera=CameraParams(width=376, height=240, fx=217.6, fy=217.6,
                            cx=183.7, cy=126.1, baseline=0.11),
    )
    world = synthetic.make_world(n_frames=8, n_points=300, n_lines=40, seed=4)
    return cfg, world


def test_vo_tracks_synthetic_sequence(setup):
    cfg, world = setup
    vo = VisualOdometry(cfg)
    for i in range(len(world.poses)):
        img_l, img_r = synthetic.render_frame(world, i, noise=1.0)
        vo.process(img_l, img_r, world.timestamps[i])
    assert not vo.lost
    est = vo.trajectory
    gt = world.poses
    # most frames accepted
    acc = [r.accepted for r in vo.records[1:]]
    assert np.mean(acc) > 0.6, f"accepted {np.mean(acc)}"
    rmse = ate_rmse(est, gt)
    # camera moves ~0.28 m over the sequence; ATE must be well below that
    assert rmse < 0.06, f"ATE {rmse}"


def test_vo_still_camera(setup):
    cfg, world = setup
    still = synthetic.make_world(n_frames=4, n_points=300, n_lines=40,
                                 seed=5, motion="still")
    vo = VisualOdometry(cfg)
    for i in range(4):
        img_l, img_r = synthetic.render_frame(still, i, noise=1.0)
        vo.process(img_l, img_r, still.timestamps[i])
    est = vo.trajectory
    drift = np.linalg.norm(est[-1][:3, 3])
    assert drift < 0.02, f"still-camera drift {drift}"


def test_vo_timelog_rows(setup):
    cfg, world = setup
    vo = VisualOdometry(cfg)
    for i in range(2):
        img_l, img_r = synthetic.render_frame(world, i, noise=1.0)
        vo.process(img_l, img_r, world.timestamps[i])
    assert len(vo.timelog.rows) == 2
    row = vo.timelog.rows[1]
    assert row.time_pt_extract > 0
    assert row.num_pt_stereo > 0
    import tempfile, os
    p = os.path.join(tempfile.mkdtemp(), "log.txt")
    vo.timelog.write(p)
    lines = open(p).read().strip().splitlines()
    assert len(lines) == 3  # header + 2 rows


def test_vo_points_only_mode(setup):
    """StvoParams.has_lines=False (Config::hasLines, config.h:46) must be a
    real engine mode: LSD/LBD never trace, all line slots invalid, and the
    points-only tracker still holds the trajectory."""
    from dataclasses import replace
    from gfplslam_tpu.config import StvoParams
    cfg, world = setup
    cfg_pt = replace(cfg, stvo=StvoParams(has_lines=False))
    vo = VisualOdometry(cfg_pt)
    for i in range(len(world.poses)):
        img_l, img_r = synthetic.render_frame(world, i, noise=1.0)
        vo.process(img_l, img_r, world.timestamps[i])
    assert not vo.lost
    assert all(r.n_ln == 0 for r in vo.records)
    assert int(np.asarray(vo.prev_frame.lines.valid).sum()) == 0
    rmse = ate_rmse(vo.trajectory, world.poses)
    assert rmse < 0.08, f"points-only ATE {rmse}"
