"""In-program A/B: whole VO scan with pallas-FAST vs XLA-FAST, plus
cut_lines absolute timing (post lane-batched factors)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gfplslam_tpu.config import default_config
from gfplslam_tpu.io import synthetic

N_IMGS = 16


def main():
    cfg = default_config()
    rng = np.random.default_rng(0)

    from gfplslam_tpu.models.vo import run_vo_scan
    from gfplslam_tpu.ops import fast as fast_ops
    n = 25
    world = synthetic.make_world(n_frames=n, n_points=900, n_lines=90,
                                 seed=3, cam=cfg.camera)
    fr = [synthetic.render_frame(world, i, noise=1.5) for i in range(n)]
    il = jnp.asarray(np.clip(np.round(np.stack([f[0] for f in fr])), 0, 255
                             ).astype(np.uint8))
    ir = jnp.asarray(np.clip(np.round(np.stack([f[1] for f in fr])), 0, 255
                             ).astype(np.uint8))
    ts = jnp.asarray(world.timestamps.astype(np.float32))

    def run_scan(tag):
        p, _ = run_vo_scan(cfg, il, ir, ts)
        jax.block_until_ready(p)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            p, _ = run_vo_scan(cfg, il, ir, ts)
            jax.block_until_ready(p)
            best = min(best, time.perf_counter() - t0)
        print(f"vo scan [{tag}]: {best/(n-1)*1e3:.2f} ms/frame "
              f"({(n-1)/best:.1f} fps)", flush=True)
        return np.asarray(p)

    p_pl = run_scan("pallas fast")

    orig = fast_ops.fast_score_map
    fast_ops.fast_score_map = (
        lambda img, th, use_pallas=None: orig(img, th, use_pallas=False))
    jax.clear_caches()
    p_xla = run_scan("xla fast")
    fast_ops.fast_score_map = orig
    print("trajectory max |diff|:", float(np.abs(p_pl - p_xla).max()),
          flush=True)

    # cut_lines absolute
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
                      sigma2=jnp.ones(M),
                      valid=jnp.asarray(rng.uniform(size=M) < 0.5))
    pts = PointMatches(p3d=jnp.asarray(rng.normal(0, 2, (P, 3))
                                       + np.array([0, 0, 5.0])),
                       obs=jnp.asarray(rng.uniform(0, 700, (P, 2))),
                       sigma2=jnp.ones(P),
                       valid=jnp.asarray(rng.uniform(size=P) < 0.5))
    dts = jnp.stack([se3.expmap_se3(jnp.asarray(rng.normal(0, 0.05, 6)))
                     for _ in range(N_IMGS)])

    def cut_body(dt):
        c = linecut.cut_lines(cfg.camera, dt, lns, cs, ce, pts)
        return jnp.sum(c.r0) + jnp.sum(c.info_sum) * 1e-9

    def runner(dts):
        def step(acc, dt):
            return acc + cut_body(dt), ()
        acc, _ = jax.lax.scan(step, jnp.asarray(0.0), dts)
        return acc
    prog = jax.jit(runner)
    out = prog(dts)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(prog(dts))
        best = min(best, time.perf_counter() - t0)
    print(f"cut_lines [{M} ln]: {best/N_IMGS*1e3:.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
