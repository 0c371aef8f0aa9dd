"""Out-of-window observations anchor local BA (frozen-constant KFs).

The reference's window solve keeps observations from non-local KFs with
those poses held constant (mapHandler.cpp:1299-1304), so shared landmarks
stay consistent with the older map between loop closures. Regression for
the round-2 gap where such observations were dropped entirely: repeated
window solves on a perturbed map must pull shared landmarks back toward
their old-KF evidence when frozen anchors are enabled, and drift more
without them.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gfplslam_tpu.config import CameraParams, CapacityParams, Config, OrbParams
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.models import ba as ba_ops
from gfplslam_tpu.models import frame as frame_mod
from gfplslam_tpu.models import map as map_ops

N_KF = 9


def _cfg(n_frozen):
    return Config(
        cap=CapacityParams(n_pt=256, n_ln=128, n_kf_window=4,
                           n_kf_frozen=n_frozen, n_kf_max=32,
                           n_map_pt=2048, n_map_ln=512,
                           n_obs_pt=1024, n_obs_ln=256),
        orb=OrbParams(nlevels=2),
        camera=CameraParams(width=376, height=240, fx=217.6, fy=217.6,
                            cx=183.7, cy=126.1, baseline=0.11),
    )


@pytest.fixture(scope="module")
def world_frames():
    cfg = _cfg(4)
    world = synthetic.make_world(n_frames=N_KF, n_points=250, n_lines=40,
                                 seed=6)
    fs = []
    for i in range(N_KF):
        il, ir = synthetic.render_frame(world, i, noise=1.0)
        fs.append(frame_mod.process_stereo_pair(
            jnp.asarray(il), jnp.asarray(ir), cfg, jnp.asarray(20.0)))
    return world, fs


def _build_map(cfg, world, fs):
    m = map_ops.initialize_map(cfg, map_ops.empty_map(cfg), fs[0])
    for i in range(1, N_KF):
        t_rel = np.linalg.inv(world.poses[i - 1]) @ world.poses[i]
        m, _ = map_ops.add_keyframe(cfg, m, fs[i],
                                    jnp.asarray(t_rel.astype(np.float32)))
    return m


def test_frozen_slots_present(world_frames):
    """The window problem carries out-of-window KFs as frozen constants and
    includes their observations (mapHandler.cpp:1299-1304 semantics)."""
    cfg = _cfg(4)
    world, fs = world_frames
    m = _build_map(cfg, world, fs)
    prob, win_ids, _, _, _, _ = map_ops.build_local_ba_problem(cfg, m)
    kw = cfg.cap.n_kf_window
    valid = np.asarray(prob.kf_valid)
    free = np.asarray(prob.kf_free)
    assert valid[:kw].any()
    # frozen slots occupied by out-of-window KFs, never optimized
    assert valid[kw:].any(), "no frozen anchor KFs selected"
    assert not free[kw:].any()
    # frozen KFs are real earlier keyframes, disjoint from the window
    win = np.asarray(win_ids)
    assert set(win[kw:][win[kw:] >= 0]).isdisjoint(set(win[:kw][win[:kw] >= 0]))
    # observations from frozen KFs participate
    po_kf = np.asarray(prob.po_kf)[np.asarray(prob.po_valid)]
    assert (po_kf >= kw).sum() > 0, "no anchor observations selected"


def test_anchors_hold_landmarks(world_frames):
    """Perturb all landmark positions, run repeated window solves: with
    frozen anchors the shared landmarks return to (stay near) their original
    triangulated positions; without anchors they drift further."""
    world, fs = world_frames
    final_err = {}
    for n_frozen in (4, 0):
        cfg = _cfg(n_frozen)
        m = _build_map(cfg, world, fs)
        orig_pt = np.asarray(m.pt_pos).copy()
        pt_valid = np.asarray(m.pt_valid)
        rng = np.random.default_rng(3)
        noise = rng.normal(0, 0.08, m.pt_pos.shape).astype(np.float32)
        m = m._replace(pt_pos=m.pt_pos + jnp.asarray(noise)
                       * m.pt_valid[:, None])
        for _ in range(3):
            prob, w_ids, p_ids, l_ids, _, _ = map_ops.build_local_ba_problem(cfg, m)
            res = ba_ops.solve_ba(cfg.camera, prob, max_iters=10)
            m = map_ops.apply_ba_result(cfg, m, res, w_ids, p_ids, l_ids)
        err = np.linalg.norm(np.asarray(m.pt_pos) - orig_pt, axis=1)
        final_err[n_frozen] = float(np.median(err[pt_valid]))
    # anchored solve recovers the original landmark geometry better
    assert final_err[4] < final_err[0], final_err
    assert np.isfinite(final_err[4])


def test_ba_outlier_obs_deleted(world_frames):
    """An injected wrong association is marked outlier by BA and deleted
    from the map (obs invalidated, landmark obs count decremented, excluded
    from the next window's problem) — the reference's post-BA observation
    deletion (mapHandler.cpp:1714-1836)."""
    cfg = _cfg(4)
    world, fs = world_frames
    m = _build_map(cfg, world, fs)

    # corrupt one in-window observation: shift its uv far off (a wrong
    # data association), pick a well-observed landmark's newest obs
    po_valid = np.asarray(m.po_valid)
    po_kf = np.asarray(m.po_kf)
    po_lm = np.asarray(m.po_lm)
    obs_n = np.asarray(m.pt_obs_n)
    cand = np.where(po_valid & (po_kf == N_KF - 1)
                    & (obs_n[po_lm] >= 4))[0]
    assert cand.size > 0
    slot = int(cand[0])
    lm = int(po_lm[slot])
    n_before = int(obs_n[lm])
    m = m._replace(po_uv=m.po_uv.at[slot].add(jnp.asarray([55.0, -40.0])))

    prob, w_ids, p_ids, l_ids, po_src, lo_src = \
        map_ops.build_local_ba_problem(cfg, m)
    assert slot in np.asarray(po_src), "corrupted obs not in the window"
    res = ba_ops.solve_ba(cfg.camera, prob, max_iters=10)
    # the corrupted obs must be marked outlier
    j = int(np.where(np.asarray(po_src) == slot)[0][0])
    assert not bool(res.po_inlier[j])
    m = map_ops.apply_ba_result(cfg, m, res, w_ids, p_ids, l_ids)
    m = map_ops.apply_ba_outliers(cfg, m, res, po_src, lo_src)

    assert not bool(m.po_valid[slot]), "outlier obs still valid in the ring"
    assert int(m.pt_obs_n[lm]) == n_before - 1
    # the next window's problem no longer contains it
    _, _, _, _, po_src2, _ = map_ops.build_local_ba_problem(cfg, m)
    assert slot not in np.asarray(po_src2)
