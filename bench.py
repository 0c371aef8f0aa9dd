"""Benchmark: stereo VO + full-SLAM frames/s/chip at the EuRoC operating point.

Primary metric: the full per-frame tracking pipeline (front-end + cross-frame
matching + line cutting + pose optimization) on synthetic EuRoC-resolution
stereo pairs (752x480, 1000-point/300-line budgets — BASELINE.md operating
point) as ONE on-device ``lax.scan`` over the sequence (zero host round-trips
per frame): steady-state VO frames per second on one chip.

Also measured and reported in the same JSON line:
- ``full_slam_fps``: tracking + the per-keyframe mapping pipeline
  (KF insertion/data association + local BA + landmark culling + dual-BoW
  insert + loop-candidate scoring) amortized over the measured KF cadence.
  Mapping programs are dispatched in a pipelined loop and synced once, the
  same way the async-mapping driver overlaps them with tracking.
- ``kf_mapping_ms``: the per-KF mapping cost itself.

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
    from gfplslam_tpu.models import ba as ba_ops

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

    # ---- per-KF mapping pipeline cost (amortized into full-SLAM fps) ----
    from gfplslam_tpu.models.frame import process_stereo_pair
    f0 = process_stereo_pair(imgs_l[0], imgs_r[0], cfg, jnp.asarray(20.0))
    f1 = process_stereo_pair(imgs_l[1], imgs_r[1], cfg, jnp.asarray(20.0))
    t_rel = jnp.eye(4).at[2, 3].set(0.04)

    def kf_step(m, ls, kf_idx, frame):
        m, _ = map_ops.add_keyframe(cfg, m, frame, t_rel)
        prob, w_ids, p_ids, l_ids = map_ops.build_local_ba_problem(cfg, m)
        res = ba_ops.solve_ba(cam, prob,
                              lambda0=cfg.slam.lambda_lba_lm,
                              lambda_k=cfg.slam.lambda_lba_k,
                              max_iters=cfg.slam.max_iters_lba)
        m = map_ops.apply_ba_result(cfg, m, res, w_ids, p_ids, l_ids)
        m = map_ops.remove_bad_landmarks(cfg, m)
        ls = loop_ops.insert_kf_bow(cfg, ls, kf_idx, frame)
        cand = loop_ops.look_for_loop_candidates(cfg, ls, m.full_graph,
                                                 kf_idx)
        return m, ls, cand

    m0 = map_ops.initialize_map(cfg, map_ops.empty_map(cfg), f0)
    ls0 = loop_ops.insert_kf_bow(cfg, loop_ops.empty_loop_state(cfg),
                                 jnp.asarray(0), f0)
    # warmup / compile
    m, ls, cand = kf_step(m0, ls0, jnp.asarray(1), f1)
    cand.block_until_ready()

    kf_reps = 8
    t0 = time.perf_counter()
    m, ls = m0, ls0
    for i in range(kf_reps):
        m, ls, cand = kf_step(m, ls, jnp.asarray(1 + i), f1 if i % 2 else f0)
    cand.block_until_ready()
    kf_ms = (time.perf_counter() - t0) / kf_reps * 1000.0

    frame_ms = 1000.0 / fps
    full_fps = 1000.0 / (frame_ms + kf_ms / kf_interval)

    print(json.dumps({
        "metric": "euroc_stereo_vo_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 3),
        "full_slam_fps": round(full_fps, 3),
        "kf_mapping_ms": round(kf_ms, 3),
        "kf_interval_frames": round(kf_interval, 2),
    }))


if __name__ == "__main__":
    main()
