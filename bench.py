"""Benchmark: stereo VO + full-SLAM frames/s/chip at the EuRoC operating point.

Primary metric: the full per-frame tracking pipeline (front-end + cross-frame
matching + line cutting + pose optimization) on synthetic EuRoC-resolution
stereo pairs (752x480, 1000-point/300-line budgets — BASELINE.md operating
point) as ONE on-device ``lax.scan`` over the sequence (zero host round-trips
per frame): steady-state VO frames per second on one chip.

Also measured and reported in the same JSON line:
- ``full_slam_fps``: the SHIPPED streaming driver —
  ``SLAMSystem.process_chunk`` (scan-tracked 24-frame chunks + per-KF fused
  mapping, the deployment throughput mode) timed end-to-end over a
  120-frame textured loop sequence, map grown to realistic occupancy (tens
  of KFs), loop closure on. ``slam_per_frame_fps`` reports the interactive
  per-frame dispatch mode of the same engine (host-round-trip-bound on the
  tunneled chip).
- ``ate_rmse``: trajectory accuracy of that same full-SLAM run against the
  synthetic world's ground truth.
- ``kf_mapping_ms``: per-KF cost of the fused mapping program alone.
- ``ba_ms_per_iter``: one local-BA LM iteration at the shipped window shape
  (BASELINE.json metric 3: "BA ms/iter at N keyframes").

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

    n_frames = 48
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

    # ---- BA ms/iter at the shipped local-window shape (BASELINE.json
    # metric 3) — solve on the occupied map's window problem ----
    from gfplslam_tpu.models import ba as ba_ops
    prob = map_ops.build_local_ba_problem(cfg, m)[0]
    res_ba = ba_ops.solve_ba(cfg.camera, prob, max_iters=10)
    jax.block_until_ready(res_ba.err)
    t0 = time.perf_counter()
    ba_reps = 3
    for _ in range(ba_reps):
        res_ba = ba_ops.solve_ba(cfg.camera, prob, max_iters=10)
        jax.block_until_ready(res_ba.err)
    ba_iters = max(1, int(res_ba.iters))
    ba_ms_per_iter = (time.perf_counter() - t0) / ba_reps / ba_iters * 1e3

    # ---- full SLAM: the SHIPPED streaming chunk driver end-to-end on a
    # 120-frame textured loop, map grown to realistic occupancy. A warmup
    # chunk compiles the scan + mapping programs outside the timed region
    # (the per-frame driver variant is reported as slam_per_frame_fps —
    # on the tunneled chip it is host-round-trip-bound, not engine-bound).
    from gfplslam_tpu.models.slam import SLAMSystem
    from gfplslam_tpu.utils.trajectory import ate_rmse
    n_slam = 120
    chunk = 24
    slam_world = synthetic.make_world(n_frames=n_slam, n_points=900,
                                      n_lines=90, seed=11, motion="loop",
                                      cam=cam, textured=True)
    slam_frames = [synthetic.render_frame(slam_world, i, noise=1.0)
                   for i in range(n_slam)]
    sl_l = np.stack([f[0] for f in slam_frames])
    sl_r = np.stack([f[1] for f in slam_frames])
    sl_ts = np.asarray(slam_world.timestamps)
    warm = SLAMSystem(cfg)
    # two chunks: the first compiles the T-1-frame scan (frame 0 is the
    # init), the second the T-frame scan every later chunk reuses
    warm.process_chunk(sl_l[:chunk], sl_r[:chunk], sl_ts[:chunk])
    warm.process_chunk(sl_l[chunk:2 * chunk], sl_r[chunk:2 * chunk],
                       sl_ts[chunk:2 * chunk])

    slam = SLAMSystem(cfg)
    t0 = time.perf_counter()
    for s in range(0, n_slam, chunk):
        slam.process_chunk(sl_l[s:s + chunk], sl_r[s:s + chunk],
                           sl_ts[s:s + chunk])
    slam.finish()
    full_dt = time.perf_counter() - t0
    full_fps = n_slam / full_dt
    n_kf_grown = len(slam.keyframe_trajectory)
    ate = float(ate_rmse(slam.all_frame_trajectory, slam_world.poses))

    # per-frame driver throughput (same engine, interactive dispatch mode)
    pf = SLAMSystem(cfg)
    for i in range(3):
        pf.process(slam_frames[i][0], slam_frames[i][1], float(sl_ts[i]))
    t0 = time.perf_counter()
    n_pf = 30
    for i in range(3, 3 + n_pf):
        pf.process(slam_frames[i][0], slam_frames[i][1], float(sl_ts[i]))
    pf_fps = n_pf / (time.perf_counter() - t0)

    # ---- KITTI operating point (1241x376, 10 Hz camera,
    # config/kitti/kitti00-02.yaml) — a distinct compile shape ----
    kcam = CameraParams(width=1241, height=376, fx=718.856, fy=718.856,
                        cx=607.1928, cy=185.2157, baseline=0.537165719)
    kcfg = Config(camera=kcam)
    kworld = synthetic.make_world(n_frames=16, n_points=900, n_lines=90,
                                  seed=7, cam=kcam, motion="forward")
    kframes = [synthetic.render_frame(kworld, i, noise=1.5)
               for i in range(16)]
    k_l = jnp.asarray(np.stack([f[0] for f in kframes]))
    k_r = jnp.asarray(np.stack([f[1] for f in kframes]))
    k_ts = jnp.asarray(kworld.timestamps.astype(np.float32))
    kposes, _ = run_vo_scan(kcfg, k_l, k_r, k_ts)
    kposes.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(2):
        kposes, _ = run_vo_scan(kcfg, k_l, k_r, k_ts)
        kposes.block_until_ready()
    kitti_fps = 2 * 15 / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "euroc_stereo_vo_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 3),
        "full_slam_fps": round(full_fps, 3),
        "slam_per_frame_fps": round(pf_fps, 3),
        "kf_mapping_ms": round(kf_ms, 3),
        "ba_ms_per_iter": round(ba_ms_per_iter, 3),
        "ate_rmse": round(ate, 4),
        "slam_keyframes": n_kf_grown,
        "kf_interval_frames": round(kf_interval, 2),
        "kitti_vo_fps": round(kitti_fps, 3),
    }))


if __name__ == "__main__":
    main()
