"""Per-stage TPU profiling for the VO hot path (diagnosis only, not bench).

Flips the process with a big compile first (see .claude/skills/verify
SKILL.md), then times each TimedVO stage program over 8 distinct frames,
sync once per stage batch. Prints a ms-per-frame table.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gfplslam_tpu.config import Config, CameraParams
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.models import timed_vo as tv
from gfplslam_tpu.models.frame import process_stereo_pair, detect_camera_features
from gfplslam_tpu.models import tracker as trk


def timeit(fn, reps=4):
    out = fn()
    jax.tree.map(lambda a: a.block_until_ready()
                 if hasattr(a, "block_until_ready") else a, out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.tree.map(lambda a: a.block_until_ready()
                 if hasattr(a, "block_until_ready") else a, out)
    return (time.perf_counter() - t0) / reps


def main():
    cam = CameraParams()
    cfg = Config(camera=cam)
    n = 9
    world = synthetic.make_world(n_frames=n, n_points=900, n_lines=90,
                                 seed=3, cam=cam)
    frames = [synthetic.render_frame(world, i, noise=1.5) for i in range(n)]
    imgs_l = jnp.asarray(np.stack([f[0] for f in frames]))
    imgs_r = jnp.asarray(np.stack([f[1] for f in frames]))
    fast_th = jnp.asarray(20.0)

    # flip: compile + run the big fused program once
    f_all = [process_stereo_pair(imgs_l[i], imgs_r[i], cfg, fast_th)
             for i in range(2)]
    jax.tree.map(lambda a: a.block_until_ready(), f_all[0])

    B = 8  # frames per timing batch

    def batch(fn):
        def run():
            return [fn(i) for i in range(B)]
        return run

    st = trk.initial_state(cfg)

    ms = {}
    ms["frontend_fused"] = timeit(batch(
        lambda i: process_stereo_pair(imgs_l[i], imgs_r[i], cfg, fast_th))) / B * 1e3

    imgs_pair = [jnp.stack([imgs_l[i], imgs_r[i]]) for i in range(B)]
    ms["pt_detect"] = timeit(batch(
        lambda i: tv._stage_points(cfg, imgs_pair[i], fast_th))) / B * 1e3
    ms["ln_detect"] = timeit(batch(
        lambda i: tv._stage_lines(cfg, imgs_pair[i]))) / B * 1e3
    lines0 = tv._stage_lines(cfg, imgs_pair[0])
    ms["ln_descri"] = timeit(batch(
        lambda i: tv._stage_lbd(imgs_pair[i], lines0.sp, lines0.ep))) / B * 1e3

    # stereo + cross stages on real features
    fr = [process_stereo_pair(imgs_l[i], imgs_r[i], cfg, fast_th)
          for i in range(B + 1)]
    out0 = trk.track_step(cfg, st, fr[0], fr[1], jnp.asarray(0.05))
    ms["track_fused"] = timeit(batch(
        lambda i: trk.track_step(cfg, st, fr[i], fr[i + 1],
                                 jnp.asarray(0.05)))) / B * 1e3
    ms["pt_cross"] = timeit(batch(
        lambda i: tv._stage_pt_cross(cfg, st, fr[i], fr[i + 1]))) / B * 1e3
    ms["ln_cross"] = timeit(batch(
        lambda i: tv._stage_ln_cross(cfg, fr[i], fr[i + 1]))) / B * 1e3

    total = ms["frontend_fused"] + ms["track_fused"]
    for k, v in ms.items():
        print(f"{k:16s} {v:8.2f} ms/frame")
    print(f"{'SUM fused':16s} {total:8.2f} ms/frame -> {1e3/total:.1f} fps")


if __name__ == "__main__":
    main()
