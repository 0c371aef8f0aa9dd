"""Per-stage profiling of the per-KF mapping pipeline (diagnosis, not bench).

The full-SLAM rate is gated by the mapping cost per keyframe
(add_keyframe + local BA + culling + BoW + loop-candidate scoring —
the TPU analog of mapHandler::addKeyFrame, mapHandler.cpp:113-187).
This times each stage program separately on a map pre-populated with
several keyframes, so association/BA see realistic occupancy.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gfplslam_tpu.config import Config, CameraParams
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.models.frame import process_stereo_pair
from gfplslam_tpu.models import ba as ba_ops
from gfplslam_tpu.models import loop as loop_ops
from gfplslam_tpu.models import map as map_ops


def timeit(fn, reps=8):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    cam = CameraParams()
    cfg = Config(camera=cam)
    n = 10
    world = synthetic.make_world(n_frames=n, n_points=900, n_lines=90,
                                 seed=3, cam=cam)
    frames = [synthetic.render_frame(world, i, noise=1.5) for i in range(n)]
    fast_th = jnp.asarray(20.0)
    fr = [process_stereo_pair(jnp.asarray(l), jnp.asarray(r), cfg, fast_th)
          for (l, r) in frames]
    jax.block_until_ready(fr[-1])
    t_rel = jnp.eye(4).at[2, 3].set(0.04)

    # build a map with n-1 KFs so stages run at realistic occupancy
    m = map_ops.initialize_map(cfg, map_ops.empty_map(cfg), fr[0])
    ls = loop_ops.insert_kf_bow(cfg, loop_ops.empty_loop_state(cfg),
                                jnp.asarray(0), fr[0])
    for i in range(1, n):
        m, _ = map_ops.add_keyframe(cfg, m, fr[i], t_rel)
        ls = loop_ops.insert_kf_bow(cfg, ls, jnp.asarray(i), fr[i])
    jax.block_until_ready((m, ls))
    kf_idx = jnp.asarray(n)

    ms = {}
    ms["add_keyframe"] = timeit(
        lambda: map_ops.add_keyframe(cfg, m, fr[1], t_rel))
    # sub-stages of add_keyframe
    prev_idx = m.n_kf - 1
    t_kf_w = m.kf_pose[prev_idx] @ t_rel
    masks = jax.jit(map_ops.local_landmark_masks,
                    static_argnames=("cfg",))
    ms["  local_masks"] = timeit(lambda: masks(cfg, m, prev_idx))
    pt_loc, ln_loc = masks(cfg, m, prev_idx)
    match_fn = jax.jit(map_ops._match_frame_to_map,
                       static_argnames=("cfg",))
    ms["  match_to_map"] = timeit(
        lambda: match_fn(cfg, m, fr[1], t_kf_w, pt_loc, ln_loc))
    match = match_fn(cfg, m, fr[1], t_kf_w, pt_loc, ln_loc)
    insert_fn = jax.jit(map_ops._insert_kf, static_argnames=("cfg",))
    ms["  insert_kf"] = timeit(
        lambda: insert_fn(cfg, m, fr[1], t_kf_w, match.pt_lm_idx,
                          match.ln_lm_idx))

    ms["build_ba_problem"] = timeit(
        lambda: map_ops.build_local_ba_problem(cfg, m))
    prob, w_ids, p_ids, l_ids, _, _ = map_ops.build_local_ba_problem(cfg, m)
    ms["solve_ba"] = timeit(
        lambda: ba_ops.solve_ba(cam, prob, lambda0=cfg.slam.lambda_lba_lm,
                                lambda_k=cfg.slam.lambda_lba_k,
                                max_iters=cfg.slam.max_iters_lba))
    res = ba_ops.solve_ba(cam, prob, max_iters=cfg.slam.max_iters_lba)
    ms["apply_ba_result"] = timeit(
        lambda: map_ops.apply_ba_result(cfg, m, res, w_ids, p_ids, l_ids))
    ms["remove_bad_lms"] = timeit(
        lambda: map_ops.remove_bad_landmarks(cfg, m))
    ms["insert_kf_bow"] = timeit(
        lambda: loop_ops.insert_kf_bow(cfg, ls, kf_idx, fr[1]))
    ms["loop_candidates"] = timeit(
        lambda: loop_ops.look_for_loop_candidates(cfg, ls, m.full_graph,
                                                  kf_idx))
    ms["verify_loop"] = timeit(
        lambda: loop_ops.verify_loop(cfg, ls, jnp.asarray(2), kf_idx))

    total = sum(v for k, v in ms.items() if not k.startswith(" "))
    for k, v in ms.items():
        print(f"{k:20s} {v:8.2f} ms")
    print(f"{'TOTAL (sync each)':20s} {total:8.2f} ms")


if __name__ == "__main__":
    main()
