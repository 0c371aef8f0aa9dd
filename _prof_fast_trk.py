"""Ablation profile inside FAST select and the tracker (diagnosis).

FAST: score-map only vs +NMS+cell-topk vs +subpixel (the select tail).
Tracker: cross-matching only vs +linecut vs +pose-GN vs full track_step.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from gfplslam_tpu.config import default_config
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.models.frame import (build_pyramid_padded,
                                       process_stereo_pair)
from gfplslam_tpu.models import pose_opt
from gfplslam_tpu.models import tracker as trk
from gfplslam_tpu.ops import fast as fast_ops

N_FRAMES = 25


def _scan2(body):
    def run(il, ir):
        def step(acc, inp):
            l, r = inp
            return acc + body(l, r), ()
        acc, _ = jax.lax.scan(step, jnp.asarray(0.0), (il, ir))
        return acc
    return jax.jit(run)


def timeit(fn, *a, reps=3):
    out = fn(*a)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfg = default_config()
    world = synthetic.make_world(n_frames=N_FRAMES, n_points=900, n_lines=90,
                                 seed=7, motion="forward", cam=cfg.camera,
                                 textured=True)
    il, ir = [], []
    for i in range(N_FRAMES):
        a, b = synthetic.render_frame(world, i, noise=1.0)
        il.append(a)
        ir.append(b)
    imgs_l = jnp.asarray(np.stack(il), jnp.float32)
    imgs_r = jnp.asarray(np.stack(ir), jnp.float32)

    # flip the process (verify skill)
    from gfplslam_tpu.models.vo import run_vo_scan
    ts = jnp.arange(N_FRAMES, dtype=jnp.float32) * 0.05
    poses, _ = run_vo_scan(cfg, imgs_l, imgs_r, ts)
    jax.block_until_ready(poses)

    th = jnp.asarray(float(cfg.orb.fast_th))
    nlv = cfg.orb.nlevels
    sf = cfg.orb.scale_factor
    slots = cfg.cap.n_pt // nlv

    def levels(im, per_level):
        pyr = build_pyramid_padded(im, nlv, sf)
        from gfplslam_tpu.models.frame import level_shapes
        shp = level_shapes(*im.shape, nlv, sf)
        out0 = per_level(pyr[0])
        h1, w1 = shp[1]
        outs = jax.vmap(per_level)(pyr[1:, :h1, :w1])
        return out0 + jnp.sum(outs)

    def score_only(l, r):
        def pl(im):
            return jnp.sum(fast_ops.fast_score_map(im, th)) * 1e-9
        return levels(l, pl) + levels(r, pl)

    def score_nms(l, r):
        def pl(im):
            return jnp.sum(
                fast_ops.nms3(fast_ops.fast_score_map(im, th))) * 1e-9
        return levels(l, pl) + levels(r, pl)

    def score_select(l, r):
        def pl(im):
            kp = fast_ops.select_keypoints(
                fast_ops.fast_score_map(im, th), n_out=slots,
                cell=cfg.orb.grid_cell, per_cell=4, border=cfg.orb.edge_th)
            return (jnp.sum(kp.xy) + jnp.sum(kp.score)) * 1e-9
        return levels(l, pl) + levels(r, pl)

    progs = {
        "score_only": _scan2(score_only),
        "score_nms": _scan2(score_nms),
        "score_select": _scan2(score_select),
    }
    ms = {}
    for k, fn in progs.items():
        ms[k] = round(timeit(fn, imgs_l, imgs_r) / N_FRAMES * 1e3, 2)

    # ---- tracker internals: precompute per-frame features, scan over pairs
    fr = jax.vmap(lambda a, b: process_stereo_pair(a, b, cfg, th))(
        imgs_l, imgs_r)
    jax.block_until_ready(fr)
    prevs = jax.tree.map(lambda x: x[:-1], fr)
    currs = jax.tree.map(lambda x: x[1:], fr)
    dt0 = jnp.eye(4)

    def _scan_pairs(body):
        def run(prevs, currs):
            def step(acc, inp):
                p, c = inp
                return acc + body(p, c), ()
            acc, _ = jax.lax.scan(step, jnp.asarray(0.0), (prevs, currs))
            return acc
        return jax.jit(run)

    def match_only(p, c):
        m = trk.cross_frame_matching(cfg, p, c, dt0)
        return (jnp.sum(m.points.obs) + jnp.sum(m.lines.le_obs)) * 1e-9

    def match_cut(p, c):
        m = trk.cross_frame_matching(cfg, p, c, dt0)
        lns = trk.apply_linecut(cfg, p, m, dt0)
        return (jnp.sum(lns.sp3d) + jnp.sum(m.points.obs)) * 1e-9

    def match_pose(p, c):
        m = trk.cross_frame_matching(cfg, p, c, dt0)
        res = pose_opt.optimize_pose(cfg.camera, dt0, m.points, m.lines,
                                     cfg.optimizer, 0.05)
        return jnp.sum(res.dt) * 1e-9

    def full_track(p, c):
        st = trk.initial_state(cfg)
        out = trk.track_step(cfg, st, p, c, jnp.asarray(0.05))
        return jnp.sum(out.state.t_cam_w) * 1e-9

    tprogs = {
        "match_only": _scan_pairs(match_only),
        "match_cut": _scan_pairs(match_cut),
        "match_pose": _scan_pairs(match_pose),
        "full_track": _scan_pairs(full_track),
    }
    for k, fn in tprogs.items():
        ms[k] = round(timeit(fn, prevs, currs) / (N_FRAMES - 1) * 1e3, 2)

    print(json.dumps({
        "ms": ms,
        "deltas": {
            "fast_score": ms["score_only"],
            "nms": round(ms["score_nms"] - ms["score_only"], 2),
            "select_tail": round(ms["score_select"] - ms["score_nms"], 2),
            "cross_match": ms["match_only"],
            "linecut": round(ms["match_cut"] - ms["match_only"], 2),
            "pose_gn": round(ms["match_pose"] - ms["match_only"], 2),
            "track_rest": round(ms["full_track"] - ms["match_pose"]
                                - (ms["match_cut"] - ms["match_only"]), 2),
        }}))


if __name__ == "__main__":
    main()
