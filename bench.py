"""Benchmark: stereo VO frames/s/chip at the EuRoC operating point.

Runs the full per-frame pipeline (front-end + cross-frame tracking + line
cutting + pose optimization) on synthetic EuRoC-resolution stereo pairs
(752x480, 1000-point/300-line budgets — BASELINE.md operating point) as ONE
on-device ``lax.scan`` over the sequence (zero host round-trips per frame)
and reports steady-state frames per second on one chip.

``vs_baseline``: the reference publishes no fps numbers (BASELINE.md); the
EuRoC camera rate (20 Hz) is the real-time baseline the reference claims to
meet, i.e. vs_baseline = fps / 20.0.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from gfplslam_tpu.config import Config, CameraParams
    from gfplslam_tpu.io import synthetic
    from gfplslam_tpu.models.vo import run_vo_scan

    cam = CameraParams()  # EuRoC rectified 752x480
    cfg = Config(camera=cam)

    n_frames = 24
    world = synthetic.make_world(n_frames=n_frames, n_points=900, n_lines=90,
                                 seed=3, cam=cam)
    frames = [synthetic.render_frame(world, i, noise=1.5)
              for i in range(n_frames)]
    imgs_l = jnp.asarray(np.stack([f[0] for f in frames]))
    imgs_r = jnp.asarray(np.stack([f[1] for f in frames]))
    ts = jnp.asarray(world.timestamps.astype(np.float32))

    # warmup / compile
    poses, aux = run_vo_scan(cfg, imgs_l, imgs_r, ts)
    poses.block_until_ready()

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        poses, aux = run_vo_scan(cfg, imgs_l, imgs_r, ts)
        poses.block_until_ready()
    dt = time.perf_counter() - t0
    fps = reps * (n_frames - 1) / dt

    print(json.dumps({
        "metric": "euroc_stereo_vo_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
