"""Ablation profile INSIDE the line detector + LBD (diagnosis, not bench).

Times whole-sequence scan programs that include successively more of
detect_lines' internals, so deltas attribute the LSD+LBD ~7.5 ms/frame:
gradient+bins -> run_ends -> topk+refine -> merge+gates -> +LBD.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from gfplslam_tpu.config import default_config
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.ops import lsd
from gfplslam_tpu.ops.pyramid import gaussian_blur, sobel
from gfplslam_tpu.models.frame import detect_line_segments, describe_line_segments

N_FRAMES = 25


def _scan(body):
    def run(il, ir):
        def step(acc, inp):
            l, r = inp
            return acc + body(l) + body(r), ()
        acc, _ = jax.lax.scan(step, jnp.asarray(0.0), (il, ir))
        return acc
    return jax.jit(run)


def timeit(fn, *a, reps=3):
    out = fn(*a)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfg = default_config()
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

    # flip the process: compile + run a big program first (verify skill:
    # micro timings are elided/cached until a large executable is loaded)
    from gfplslam_tpu.models.vo import run_vo_scan
    ts = jnp.arange(N_FRAMES, dtype=jnp.float32) * 0.05
    poses, _ = run_vo_scan(cfg, imgs_l, imgs_r, ts)
    jax.block_until_ready(poses)

    rho = cfg.lsd.quant / np.sin(np.deg2rad(cfg.lsd.ang_th))
    centers = np.stack([np.cos(np.arange(16) * np.pi / 8),
                        np.sin(np.arange(16) * np.pi / 8)]).astype(np.float32)

    def grad_bins(img):
        h, w = img.shape
        sm = gaussian_blur(img, sigma=0.8, radius=2)
        gx, gy = sobel(sm)
        gx = gx / 8.0
        gy = gy / 8.0
        dots = (jnp.stack([gx, gy], axis=-1).reshape(-1, 2)
                @ jnp.asarray(centers))
        bin16 = jnp.argmax(dots, axis=1).astype(jnp.int32).reshape(h, w)
        support = (gx * gx + gy * gy) > (rho * rho)
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]
        support &= (yy > 1) & (yy < h - 2) & (xx > 1) & (xx < w - 2)
        return gx, gy, support, bin16

    def v_grad(img):
        gx, gy, support, bin16 = grad_bins(img)
        return (jnp.sum(gx) + jnp.sum(gy)) * 1e-9 + jnp.sum(support) * 0.0

    def v_runs(img):
        gx, gy, support, bin16 = grad_bins(img)
        best_len, best_bin = lsd._run_ends(support, bin16, 9)
        return jnp.sum(best_len) * 1e-9

    def v_detect(img):
        ls = detect_line_segments(img, cfg)
        return (jnp.sum(ls.sp) + jnp.sum(ls.length)) * 1e-9

    def v_detect_lbd(img):
        ls = detect_line_segments(img, cfg)
        d = describe_line_segments(img, ls.sp, ls.ep)
        return (jnp.sum(ls.sp) + jnp.sum(d.astype(jnp.float32))) * 1e-9

    progs = {
        "grad+bins": _scan(v_grad),
        "runs": _scan(v_runs),
        "detect_full": _scan(v_detect),
        "detect+lbd": _scan(v_detect_lbd),
    }
    ms = {}
    for k, fn in progs.items():
        ms[k] = round(timeit(fn, imgs_l, imgs_r) / N_FRAMES * 1e3, 2)
    print(json.dumps({
        "stages_ms_2cam": ms,
        "deltas": {
            "grad+bins": ms["grad+bins"],
            "run_ends": round(ms["runs"] - ms["grad+bins"], 2),
            "topk+refine+merge": round(ms["detect_full"] - ms["runs"], 2),
            "lbd": round(ms["detect+lbd"] - ms["detect_full"], 2),
        }}))


if __name__ == "__main__":
    main()
