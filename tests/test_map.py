"""Map back-end: KF insertion, landmark pools, covisibility, BA windows."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfplslam_tpu.config import CameraParams, CapacityParams, Config, OrbParams
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.models import frame as frame_mod
from gfplslam_tpu.models import map as map_ops


@pytest.fixture(scope="module")
def cfg():
    return Config(
        cap=CapacityParams(n_pt=256, n_ln=128, n_kf_window=4, n_kf_max=32,
                           n_map_pt=2048, n_map_ln=512,
                           n_obs_pt=1024, n_obs_ln=256),
        orb=OrbParams(nlevels=2),
        camera=CameraParams(width=376, height=240, fx=217.6, fy=217.6,
                            cx=183.7, cy=126.1, baseline=0.11),
    )


@pytest.fixture(scope="module")
def frames(cfg):
    world = synthetic.make_world(n_frames=4, n_points=250, n_lines=40, seed=6)
    out = []
    for i in range(4):
        il, ir = synthetic.render_frame(world, i, noise=1.0)
        out.append(frame_mod.process_stereo_pair(
            jnp.asarray(il), jnp.asarray(ir), cfg, jnp.asarray(20.0)))
    return world, out


def test_initialize_creates_landmarks(cfg, frames):
    world, fs = frames
    m = map_ops.empty_map(cfg)
    m = map_ops.initialize_map(cfg, m, fs[0])
    assert int(m.n_kf) == 1
    n_pt = int(jnp.sum(m.pt_valid))
    assert n_pt == int(jnp.sum(fs[0].points.valid))
    assert int(jnp.sum(m.po_valid)) == n_pt


def test_add_keyframe_associates(cfg, frames):
    world, fs = frames
    m = map_ops.empty_map(cfg)
    m = map_ops.initialize_map(cfg, m, fs[0])
    t_rel = np.linalg.inv(world.poses[0]) @ world.poses[1]
    m2, match = map_ops.add_keyframe(cfg, m, fs[1],
                                     jnp.asarray(t_rel.astype(np.float32)))
    assert int(m2.n_kf) == 2
    # a healthy fraction of features should associate to existing landmarks
    n_matched = int(match.n_pt_matched)
    assert n_matched > 20, n_matched
    # covisibility count between KF0 and KF1 reflects shared landmarks
    assert int(m2.full_graph[1, 0]) >= n_matched - 5
    # new landmark count grows by the unmatched features only
    n_new = int(jnp.sum(m2.pt_valid)) - int(jnp.sum(m.pt_valid))
    n_feat = int(jnp.sum(fs[1].points.valid))
    assert n_new == n_feat - n_matched


def test_local_ba_problem_shapes(cfg, frames):
    world, fs = frames
    m = map_ops.empty_map(cfg)
    m = map_ops.initialize_map(cfg, m, fs[0])
    for i in (1, 2):
        t_rel = np.linalg.inv(world.poses[i - 1]) @ world.poses[i]
        m, _ = map_ops.add_keyframe(cfg, m, fs[i],
                                    jnp.asarray(t_rel.astype(np.float32)))
    prob, win_ids, p_ids, l_ids, _, _ = map_ops.build_local_ba_problem(cfg, m)
    win = np.asarray(win_ids)
    assert set(win[win >= 0]) == {0, 1, 2}
    # gauge: exactly one window KF is frozen
    free = np.asarray(prob.kf_free)
    valid = np.asarray(prob.kf_valid)
    assert valid.sum() == 3 and free.sum() == 2
    # observations reference in-window slots only
    po_kf = np.asarray(prob.po_kf)[np.asarray(prob.po_valid)]
    assert po_kf.min() >= 0 and po_kf.max() < cfg.cap.n_kf_window
    assert int(np.asarray(prob.po_valid).sum()) > 50


def test_local_ba_improves_or_keeps_map(cfg, frames):
    from gfplslam_tpu.models import ba as ba_ops
    world, fs = frames
    m = map_ops.empty_map(cfg)
    m = map_ops.initialize_map(cfg, m, fs[0])
    for i in (1, 2, 3):
        t_rel = np.linalg.inv(world.poses[i - 1]) @ world.poses[i]
        m, _ = map_ops.add_keyframe(cfg, m, fs[i],
                                    jnp.asarray(t_rel.astype(np.float32)))
    prob, win_ids, p_ids, l_ids, _, _ = map_ops.build_local_ba_problem(cfg, m)
    res = ba_ops.solve_ba(cfg.camera, prob, max_iters=10)
    assert np.isfinite(float(res.err))
    m2 = map_ops.apply_ba_result(cfg, m, res, win_ids, p_ids, l_ids)
    assert np.all(np.isfinite(np.asarray(m2.kf_pose[:4])))
    # KF poses stay near their odometry initialization (good init)
    for i in range(4):
        d = np.asarray(m2.kf_pose[i]) - np.asarray(m.kf_pose[i])
        assert np.abs(d).max() < 0.5


def test_line_association_descriptor_cap(cfg, frames):
    """A geometrically-collinear line with a wrong descriptor must NOT
    associate to a line landmark (mapHandler.cpp:631-771 descriptor
    thresholds): the chi2 geometry gate alone would accept it."""
    world, fs = frames
    m = map_ops.empty_map(cfg)
    m = map_ops.initialize_map(cfg, m, fs[0])
    f = fs[0]
    match = map_ops._match_frame_to_map(
        cfg, m, f, jnp.eye(4), m.pt_valid, m.ln_valid)
    assert int(match.n_ln_matched) > 0  # same frame re-associates
    # same geometry, inverted descriptor bits (Hamming distance 256)
    bad = f._replace(lines=f.lines._replace(desc=~f.lines.desc))
    match2 = map_ops._match_frame_to_map(
        cfg, m, bad, jnp.eye(4), m.pt_valid, m.ln_valid)
    assert int(match2.n_ln_matched) == 0, int(match2.n_ln_matched)


def test_remove_bad_landmarks(cfg, frames):
    world, fs = frames
    m = map_ops.empty_map(cfg)
    m = map_ops.initialize_map(cfg, m, fs[0])
    # age the map artificially: pretend current KF is 20
    m = m._replace(n_kf=jnp.asarray(21, jnp.int32))
    before = int(jnp.sum(m.pt_valid))
    m2 = map_ops.remove_bad_landmarks(cfg, m)
    # all landmarks have 1 obs < min_lm_obs and are stale -> culled
    assert int(jnp.sum(m2.pt_valid)) == 0
    assert int(jnp.sum(m2.po_valid)) == 0
    assert before > 0


def test_fuse_loop_landmarks(cfg):
    """Duplicate landmarks across a loop junction merge: obs redirect to the
    kept id, the dropped id dies, covisibility gains cross-loop counts."""
    m = map_ops.empty_map(cfg)
    rng = np.random.default_rng(5)
    n_dup = 6
    desc = rng.integers(0, 2**32, size=(n_dup, 8), dtype=np.uint32)
    # side A: slots 0..5 seen at KF2; side B duplicates: slots 10..15 at KF10
    pos = rng.uniform(-2, 2, (n_dup, 3)).astype(np.float32)
    m = m._replace(
        n_kf=jnp.asarray(11, jnp.int32),
        kf_valid=m.kf_valid.at[:11].set(True),
        pt_desc=m.pt_desc.at[:n_dup].set(desc).at[10:10 + n_dup].set(desc),
        pt_pos=m.pt_pos.at[:n_dup].set(pos).at[10:10 + n_dup].set(pos + 0.05),
        pt_valid=m.pt_valid.at[:n_dup].set(True).at[10:10 + n_dup].set(True),
        pt_last_kf=m.pt_last_kf.at[:n_dup].set(2).at[10:10 + n_dup].set(10),
        pt_obs_n=m.pt_obs_n.at[:n_dup].set(3).at[10:10 + n_dup].set(1),
        po_kf=m.po_kf.at[:n_dup].set(2).at[n_dup:2 * n_dup].set(10),
        po_lm=m.po_lm.at[:n_dup].set(jnp.arange(n_dup))
                      .at[n_dup:2 * n_dup].set(jnp.arange(n_dup) + 10),
        po_valid=m.po_valid.at[:2 * n_dup].set(True),
    )
    m2, n_fused, n_over = map_ops.fuse_loop_landmarks(
        cfg, m, jnp.asarray(2), jnp.asarray(10))
    assert int(n_fused) == n_dup, int(n_fused)
    assert int(n_over) == 0
    # dropped B ids invalid; kept A ids retain combined obs counts
    assert not bool(jnp.any(m2.pt_valid[10:10 + n_dup]))
    assert bool(jnp.all(m2.pt_valid[:n_dup]))
    np.testing.assert_array_equal(np.asarray(m2.pt_obs_n[:n_dup]), 4)
    # B observations now reference the kept A landmark
    po_lm = np.asarray(m2.po_lm[n_dup:2 * n_dup])
    np.testing.assert_array_equal(np.sort(po_lm), np.arange(n_dup))
    # covisibility gained cross-loop counts between KF2 and KF10
    fg = np.asarray(m2.full_graph)
    assert fg[2, 10] + fg[10, 2] >= n_dup


def test_remove_redundant_kfs(cfg):
    """KFs whose landmarks are all heavily re-observed get culled (the
    reference declares removeRedundantKFs but ships it disabled); recent
    KFs and KF0 are protected, obs counts/graph rows are cleaned up."""
    m = map_ops.empty_map(cfg)
    n_kf, n_lm = 8, 20
    m = m._replace(
        n_kf=jnp.asarray(n_kf, jnp.int32),
        kf_valid=m.kf_valid.at[:n_kf].set(True),
        pt_valid=m.pt_valid.at[:n_lm].set(True),
        pt_obs_n=m.pt_obs_n.at[:n_lm].set(n_kf),
    )
    # every KF observes every landmark
    kf_ids = np.repeat(np.arange(n_kf), n_lm)
    lm_ids = np.tile(np.arange(n_lm), n_kf)
    n_obs = n_kf * n_lm
    m = m._replace(
        po_kf=m.po_kf.at[:n_obs].set(jnp.asarray(kf_ids)),
        po_lm=m.po_lm.at[:n_obs].set(jnp.asarray(lm_ids)),
        po_valid=m.po_valid.at[:n_obs].set(True),
        full_graph=m.full_graph.at[:n_kf, :n_kf].set(n_lm),
    )
    m2, n_removed = map_ops.remove_redundant_kfs(cfg, m)
    removed = ~np.asarray(m2.kf_valid[:n_kf])
    assert int(n_removed) == removed.sum() > 0
    # KF0 and the last min_kf_local_map+1 KFs survive
    assert not removed[0]
    assert not removed[-(cfg.slam.min_kf_local_map + 1):].any()
    # removed KFs' observations invalidated and obs counts decremented
    po_kf = np.asarray(m2.po_kf[:n_obs])
    po_ok = np.asarray(m2.po_valid[:n_obs])
    assert not po_ok[np.isin(po_kf, np.nonzero(removed)[0])].any()
    assert np.all(np.asarray(m2.pt_obs_n[:n_lm]) == n_kf - removed.sum())
    # covisibility rows of removed KFs cleared
    fg = np.asarray(m2.full_graph)
    assert fg[removed.nonzero()[0]].sum() == 0
