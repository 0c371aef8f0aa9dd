"""Benchmark: stereo VO + full-SLAM frames/s/chip at the EuRoC operating point.

Primary metric: the full per-frame tracking pipeline (front-end + cross-frame
matching + line cutting + pose optimization) on synthetic EuRoC-resolution
stereo pairs (752x480, 1000-point/300-line budgets — BASELINE.md operating
point) as ONE on-device ``lax.scan`` over the sequence (zero host round-trips
per frame): steady-state VO frames per second on one chip.

Also measured and reported in the same JSON line:
- ``full_slam_fps``: the PIPELINED full system — per keyframe interval, the
  tracking scan and one fused mapping program (KF association + local BA +
  culling + dual-BoW insert + loop scoring/verification, models/mapping.py)
  are dispatched back-to-back and synced once at the end, exactly like the
  async-mapping driver (slam.py async_mapping=True). Mapping runs on a map
  that GROWS across distinct keyframes, so association/BA see realistic
  occupancy.
- ``kf_mapping_ms``: per-KF cost of the fused mapping program alone.

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
    from gfplslam_tpu.models import loop as loop_ops
    from gfplslam_tpu.models import map as map_ops
    from gfplslam_tpu.models.mapping import mapping_step

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

    # ---- VO tracking throughput (scan, zero host round-trips) ----
    poses, aux = run_vo_scan(cfg, imgs_l, imgs_r, ts)  # warmup / compile
    poses.block_until_ready()

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        poses, aux = run_vo_scan(cfg, imgs_l, imgs_r, ts)
        poses.block_until_ready()
    dt = time.perf_counter() - t0
    fps = reps * (n_frames - 1) / dt
    kf_interval = max(1.0, (n_frames - 1) / max(
        1, int(np.asarray(aux["is_kf"]).sum())))

    # ---- fused per-KF mapping pipeline on a growing map ----
    from gfplslam_tpu.models.frame import process_stereo_pair
    fr = [process_stereo_pair(imgs_l[i], imgs_r[i], cfg, jnp.asarray(20.0))
          for i in range(n_frames)]
    t_rel = jnp.eye(4).at[2, 3].set(0.04)

    m = map_ops.initialize_map(cfg, map_ops.empty_map(cfg), fr[0])
    ls = loop_ops.insert_kf_bow(cfg, loop_ops.empty_loop_state(cfg),
                                jnp.asarray(0), fr[0])
    # warmup/compile + grow the map to steady occupancy over distinct KFs
    for i in range(1, 9):
        res = mapping_step(cfg, m, ls, fr[i], t_rel)
        m, ls = res.map, res.loop_state
    jax.block_until_ready(m)

    kf_reps = 10
    t0 = time.perf_counter()
    for i in range(kf_reps):
        res = mapping_step(cfg, m, ls, fr[9 + i % 15], t_rel)
        m, ls = res.map, res.loop_state
    jax.block_until_ready(m)
    kf_ms = (time.perf_counter() - t0) / kf_reps * 1000.0

    # ---- pipelined full SLAM: tracking scan + mapping steps dispatched
    # back-to-back (async-mapping driver pattern), one sync per rep ----
    n_kf_per_scan = max(1, int(round((n_frames - 1) / kf_interval)))
    t0 = time.perf_counter()
    for r in range(reps):
        poses, aux = run_vo_scan(cfg, imgs_l, imgs_r, ts)
        for i in range(n_kf_per_scan):
            res = mapping_step(cfg, m, ls,
                               fr[(r * n_kf_per_scan + i) % (n_frames - 1) + 1],
                               t_rel)
            m, ls = res.map, res.loop_state
        poses.block_until_ready()
    jax.block_until_ready(m)
    full_dt = time.perf_counter() - t0
    full_fps = reps * (n_frames - 1) / full_dt

    # ---- KITTI operating point (1241x376, 10 Hz camera,
    # config/kitti/kitti00-02.yaml) — a distinct compile shape ----
    kcam = CameraParams(width=1241, height=376, fx=718.856, fy=718.856,
                        cx=607.1928, cy=185.2157, baseline=0.537165719)
    kcfg = Config(camera=kcam)
    kworld = synthetic.make_world(n_frames=12, n_points=900, n_lines=90,
                                  seed=7, cam=kcam, motion="forward")
    kframes = [synthetic.render_frame(kworld, i, noise=1.5)
               for i in range(12)]
    k_l = jnp.asarray(np.stack([f[0] for f in kframes]))
    k_r = jnp.asarray(np.stack([f[1] for f in kframes]))
    k_ts = jnp.asarray(kworld.timestamps.astype(np.float32))
    kposes, _ = run_vo_scan(kcfg, k_l, k_r, k_ts)
    kposes.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(2):
        kposes, _ = run_vo_scan(kcfg, k_l, k_r, k_ts)
        kposes.block_until_ready()
    kitti_fps = 2 * 11 / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "euroc_stereo_vo_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 3),
        "full_slam_fps": round(full_fps, 3),
        "kf_mapping_ms": round(kf_ms, 3),
        "kf_interval_frames": round(kf_interval, 2),
        "kitti_vo_fps": round(kitti_fps, 3),
    }))


if __name__ == "__main__":
    main()
