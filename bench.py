"""Benchmark: stereo VO frames/s/chip at the EuRoC operating point.

Runs the full per-frame pipeline (front-end + cross-frame tracking + line
cutting + pose optimization) on synthetic EuRoC-resolution stereo pairs
(752x480, 1000-point/300-line budgets — BASELINE.md operating point) and
reports steady-state frames per second on one chip.

``vs_baseline``: the reference provides no published fps (BASELINE.md); the
EuRoC camera rate (20 Hz) is used as the real-time baseline, i.e.
vs_baseline = fps / 20.0 (>1 means faster than the sensor, the reference's
real-time operating claim).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from gfplslam_tpu.config import Config, CameraParams, CapacityParams
    from gfplslam_tpu.io import synthetic
    from gfplslam_tpu.models.vo import VisualOdometry

    cam = CameraParams()  # EuRoC rectified 752x480
    cfg = Config(camera=cam)

    world = synthetic.make_world(n_frames=12, n_points=900, n_lines=90,
                                 seed=3, cam=cam)
    frames = [synthetic.render_frame(world, i, noise=1.5)
              for i in range(len(world.poses))]

    vo = VisualOdometry(cfg)
    # warmup: compile both per-frame programs
    for i in range(3):
        vo.process(frames[i][0], frames[i][1], world.timestamps[i])

    n_timed = 0
    t0 = time.perf_counter()
    for rep in range(3):
        for i in range(3, len(frames)):
            vo.process(frames[i][0], frames[i][1],
                       world.timestamps[i] + rep)
            n_timed += 1
    dt = time.perf_counter() - t0
    fps = n_timed / dt

    print(json.dumps({
        "metric": "euroc_stereo_vo_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
