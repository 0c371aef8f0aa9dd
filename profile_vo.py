"""On-device VO-scan profile by ablation (run on the real TPU chip).

Staged per-module timing is dispatch-dominated on the TPU tunnel (~25 ms
per dispatch vs ~33 ms per full frame), so per-stage cost is measured here
as DIFFERENCES between whole-sequence ``lax.scan`` programs that include
successively more of the per-frame pipeline — every variant pays one
dispatch for the whole sequence, so the deltas are pure device time.

Usage:  python profile_vo.py            (real chip via the axon tunnel)
        JAX_PLATFORMS=cpu python profile_vo.py   (CPU smoke)

Prints one JSON line with ms/frame per stage; the committed summary lives
in PROFILE_VO.md.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from gfplslam_tpu.config import default_config
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.models import frame as frame_mod
from gfplslam_tpu.models.frame import (build_pyramid_padded,
                                       detect_camera_features,
                                       detect_line_segments,
                                       detect_point_features,
                                       describe_line_segments,
                                       process_stereo_pair)
from gfplslam_tpu.models.tracker import initial_state, mark_keyframe, track_step
from gfplslam_tpu.ops import fast as fast_ops

N_FRAMES = 25


def _scan_program(cfg, body):
    """Wrap a per-frame body (img_l, img_r -> scalar) into a jitted scan."""
    def run(imgs_l, imgs_r):
        def step(acc, inp):
            il, ir = inp
            return acc + body(il, ir), ()
        acc, _ = jax.lax.scan(step, jnp.asarray(0.0), (imgs_l, imgs_r))
        return acc
    return jax.jit(run)


def _reduce_tree(t):
    return sum(jnp.sum(jnp.asarray(x, jnp.float32)) for x in jax.tree.leaves(t))


def make_variants(cfg):
    th = jnp.asarray(float(cfg.orb.fast_th))
    nlv = cfg.orb.nlevels
    sf = cfg.orb.scale_factor
    slots = cfg.cap.n_pt // nlv

    def pyramid_only(il, ir):
        pyrs = jax.vmap(lambda im: build_pyramid_padded(im, nlv, sf))(
            jnp.stack([il, ir]))
        return jnp.sum(pyrs) * 1e-9

    def fast_only(il, ir):
        def cam(im):
            pyr = build_pyramid_padded(im, nlv, sf)
            def lv(im_l):
                score = fast_ops.fast_score_map(im_l, th)
                kp = fast_ops.select_keypoints(
                    score, n_out=slots, cell=cfg.orb.grid_cell, per_cell=4,
                    border=cfg.orb.edge_th, valid_h=im_l.shape[0],
                    valid_w=im_l.shape[1])
                return jnp.sum(kp.xy) + jnp.sum(kp.score)
            return jnp.sum(jax.vmap(lv)(pyr))
        return jnp.sum(jax.vmap(cam)(jnp.stack([il, ir]))) * 1e-9

    def points_detect(il, ir):
        out = jax.vmap(lambda im: detect_point_features(im, cfg, th))(
            jnp.stack([il, ir]))
        return _reduce_tree(out) * 1e-9

    def lines_detect(il, ir):
        def cam(im):
            lines = detect_line_segments(im, cfg)
            desc = describe_line_segments(im, lines.sp, lines.ep)
            return _reduce_tree((lines, desc))
        return jnp.sum(jax.vmap(cam)(jnp.stack([il, ir]))) * 1e-9

    def detect_all(il, ir):
        out = jax.vmap(lambda im: detect_camera_features(im, cfg, th))(
            jnp.stack([il, ir]))
        return _reduce_tree(out) * 1e-9

    def frontend(il, ir):
        return _reduce_tree(process_stereo_pair(il, ir, cfg, th)) * 1e-9

    return {
        "pyramid": _scan_program(cfg, pyramid_only),
        "fast_select": _scan_program(cfg, fast_only),
        "points_detect": _scan_program(cfg, points_detect),
        "lines_detect": _scan_program(cfg, lines_detect),
        "detect_all": _scan_program(cfg, detect_all),
        "frontend": _scan_program(cfg, frontend),
    }


def full_scan(cfg):
    from gfplslam_tpu.models.vo import run_vo_scan

    def run(imgs_l, imgs_r):
        ts = jnp.arange(imgs_l.shape[0], dtype=jnp.float32) * 0.05
        poses, aux = run_vo_scan(cfg, imgs_l, imgs_r, ts)
        return jnp.sum(poses)
    return jax.jit(run)


def time_program(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfg = default_config()
    print("devices:", jax.devices())
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

    # flip the process: compile + run the big program first (see
    # .claude/skills/verify/SKILL.md — micro timings lie before this)
    full = full_scan(cfg)
    t_full = time_program(full, imgs_l, imgs_r) / (N_FRAMES - 1)

    variants = make_variants(cfg)
    times = {}
    for name, fn in variants.items():
        times[name] = time_program(fn, imgs_l, imgs_r) / N_FRAMES

    ms = {k: round(v * 1e3, 2) for k, v in times.items()}
    report = {
        "full_ms_per_frame": round(t_full * 1e3, 2),
        "stages_ms": ms,
        "deltas_ms": {
            "pyramid": ms["pyramid"],
            "fast+select (on top of pyramid)": round(
                ms["fast_select"] - ms["pyramid"], 2),
            "orb blur+angle+desc": round(
                ms["points_detect"] - ms["fast_select"], 2),
            "lsd+lbd": ms["lines_detect"],
            "stereo match+subpixel": round(
                ms["frontend"] - ms["detect_all"], 2),
            "tracker (full - frontend)": round(
                t_full * 1e3 - ms["frontend"], 2),
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
