"""On-chip A/B for the round-5 session-2 optimizations:

1. FAST score map: XLA roll formulation vs the fused Pallas kernel
   (ops/pallas/fast_pl.py) at the EuRoC level-0/level-1 shapes.
2. cut_lines at the shipped [512-line, 9-candidate] shape with the
   lane-batched component factors (in-tree) — absolute ms/call.
3. Whole VO scan (bench.py's primary metric path) — quick read.

Measurement per the verify-skill protocol: flip the process with a big
compile first (the VO scan), then time every micro number as a lax.scan
over >=16 distinct inputs (single dispatches carry ~25 ms tunnel
overhead).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gfplslam_tpu.config import default_config
from gfplslam_tpu.io import synthetic

N_IMGS = 16


def timeit(fn, *a, reps=4):
    out = fn(*a)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def scan_over(body, imgs):
    def run(imgs):
        def step(acc, im):
            return acc + body(im), ()
        acc, _ = jax.lax.scan(step, jnp.asarray(0.0), imgs)
        return acc
    return jax.jit(run)


def main():
    cfg = default_config()
    rng = np.random.default_rng(0)
    th = jnp.asarray(20.0)

    # ---- flip the process + whole-scan read (authoritative: bench.py) ----
    from gfplslam_tpu.models.vo import run_vo_scan
    n = 25
    world = synthetic.make_world(n_frames=n, n_points=900, n_lines=90,
                                 seed=3, cam=cfg.camera)
    fr = [synthetic.render_frame(world, i, noise=1.5) for i in range(n)]
    il = jnp.asarray(np.clip(np.round(np.stack([f[0] for f in fr])), 0, 255
                             ).astype(np.uint8))
    ir = jnp.asarray(np.clip(np.round(np.stack([f[1] for f in fr])), 0, 255
                             ).astype(np.uint8))
    ts = jnp.asarray(world.timestamps.astype(np.float32))
    p, _ = run_vo_scan(cfg, il, ir, ts)
    jax.block_until_ready(p)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        p, _ = run_vo_scan(cfg, il, ir, ts)
        jax.block_until_ready(p)
        best = min(best, time.perf_counter() - t0)
    print(f"vo scan: {best/(n-1)*1e3:.2f} ms/frame ({(n-1)/best:.1f} fps)",
          flush=True)

    # ---- FAST score A/B at the two live pyramid shapes ----
    from gfplslam_tpu.ops.fast import fast_score_map_xla
    from gfplslam_tpu.ops.pallas.fast_pl import fast_score_map_pallas
    shapes = [(480, 752), (400, 627)]
    tot = {"xla": 0.0, "pallas": 0.0}
    for si, (h, w) in enumerate(shapes):
        imgs = jnp.asarray(
            rng.integers(0, 256, (N_IMGS, h, w)).astype(np.float32))
        for name, f in (("xla", fast_score_map_xla),
                        ("pallas", fast_score_map_pallas)):
            prog = scan_over(lambda im, f=f: jnp.sum(f(im, th)) * 1e-9, imgs)
            ms = timeit(prog, imgs) / N_IMGS
            print(f"fast {h}x{w} {name}: {ms:.3f} ms/img", flush=True)
            tot[name] += ms * (1 if si == 0 else 3)
    print(f"fast per camera (lvl0 + 3x lvl1-shape): "
          f"xla {tot['xla']:.2f} -> pallas {tot['pallas']:.2f} ms "
          f"(x2 cameras: {2*tot['xla']:.2f} -> {2*tot['pallas']:.2f})",
          flush=True)

    # ---- cut_lines at the shipped shape (scan over 16 dt variants) ----
    from gfplslam_tpu.models import linecut
    from gfplslam_tpu.models.pose_opt import LineMatches, PointMatches
    from gfplslam_tpu.utils import se3
    M, P = cfg.cap.n_ln_match, cfg.cap.n_pt_match
    sp = jnp.asarray(rng.normal(0, 2, (M, 3)) + np.array([0, 0, 5.0]))
    ep = jnp.asarray(rng.normal(0, 2, (M, 3)) + np.array([0, 0, 6.0]))
    a = rng.normal(0, 0.1, (M, 3, 3))
    cs = jnp.asarray(a @ a.transpose(0, 2, 1) + 1e-4 * np.eye(3))
    a = rng.normal(0, 0.1, (M, 3, 3))
    ce = jnp.asarray(a @ a.transpose(0, 2, 1) + 1e-4 * np.eye(3))
    le = rng.normal(0, 1, (M, 3))
    le[:, :2] /= np.linalg.norm(le[:, :2], axis=1, keepdims=True)
    lns = LineMatches(sp3d=sp, ep3d=ep, le_obs=jnp.asarray(le),
                      valid=jnp.asarray(rng.uniform(size=M) < 0.5))
    pts = PointMatches(p3d=jnp.asarray(rng.normal(0, 2, (P, 3))
                                       + np.array([0, 0, 5.0])),
                       obs=jnp.asarray(rng.uniform(0, 700, (P, 2))),
                       valid=jnp.asarray(rng.uniform(size=P) < 0.5))
    dts = jnp.stack([se3.expmap_se3(jnp.asarray(rng.normal(0, 0.05, 6)))
                     for _ in range(N_IMGS)])

    def cut_body(dt):
        c = linecut.cut_lines(cfg.camera, dt, lns, cs, ce, pts)
        return jnp.sum(c.r0) + jnp.sum(c.info_sum) * 1e-9
    prog = scan_over(cut_body, dts)
    print(f"cut_lines [{M} ln]: {timeit(prog, dts)/N_IMGS:.3f} ms/call",
          flush=True)


if __name__ == "__main__":
    main()
