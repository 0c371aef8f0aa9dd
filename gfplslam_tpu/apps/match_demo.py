"""Detection/matching smoke tool on an image folder or synthetic frames.

Parity with the reference's smoke utility (src/test_line_matching.cpp:7-64:
run line detection + matching over a monocular image folder and show imshow
canvases; not built by default). Headless here: consecutive frames are
matched (points + lines) and annotated side-by-side canvases are written as
PNGs.

Usage:
  python -m gfplslam_tpu.apps.match_demo --synthetic -n 4 -o /tmp/demo
  python -m gfplslam_tpu.apps.match_demo --dir /data/imgs -o /tmp/demo
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _load_dir(path: str, n: int):
    from gfplslam_tpu.io.native_loader import decode_image as imread_gray
    names = sorted(os.listdir(path))
    names = [f for f in names
             if f.lower().endswith((".png", ".jpg", ".jpeg", ".pgm"))]
    if n:
        names = names[:n]
    return [imread_gray(os.path.join(path, f)) for f in names]


def main(argv=None):
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--synthetic", action="store_true")
    src.add_argument("--dir", metavar="DIR")
    ap.add_argument("-n", "--frames", type=int, default=4)
    ap.add_argument("-o", "--out", default="/tmp/gfpl_match_demo")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    import jax.numpy as jnp
    from gfplslam_tpu.config import CameraParams, CapacityParams, Config, OrbParams
    from gfplslam_tpu.io import synthetic
    from gfplslam_tpu.models import frame as frame_mod
    from gfplslam_tpu.ops.hamming import hamming_matrix
    from gfplslam_tpu.ops import matching as match_ops

    if args.synthetic:
        world = synthetic.make_world(n_frames=args.frames, n_points=250,
                                     n_lines=40, seed=9)
        imgs = [synthetic.render_frame(world, i, noise=1.0)[0]
                for i in range(args.frames)]
        cam = world.cam
    else:
        imgs = _load_dir(args.dir, args.frames)
        h, w = imgs[0].shape
        cam = CameraParams(width=w, height=h, fx=0.9 * w, fy=0.9 * w,
                           cx=w / 2.0, cy=h / 2.0, baseline=0.11)

    cfg = Config(cap=CapacityParams(n_pt=512, n_ln=256),
                 orb=OrbParams(nlevels=2), camera=cam)
    fth = jnp.asarray(20.0)
    feats = [frame_mod.detect_camera_features(jnp.asarray(im), cfg, fth)
             for im in imgs]

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    stats = []
    for i in range(1, len(imgs)):
        fa, fb = feats[i - 1], feats[i]
        dp = hamming_matrix(fa.pt_desc, fb.pt_desc, fa.pt_valid, fb.pt_valid)
        mp = match_ops.mutual_best(dp.astype(jnp.float32))
        dl = hamming_matrix(fa.ln_desc, fb.ln_desc, fa.ln_valid, fb.ln_valid)
        ml = match_ops.mutual_best(dl.astype(jnp.float32))

        h, w = imgs[i].shape
        canvas = np.concatenate([imgs[i - 1], imgs[i]], axis=1)
        fig, ax = plt.subplots(figsize=(12, 5))
        ax.imshow(canvas, cmap="gray")
        pv = np.asarray(mp.valid)
        xa = np.asarray(fa.pt_xy)[pv]
        xb = np.asarray(fb.pt_xy)[np.asarray(mp.idx)[pv]]
        for a, b in zip(xa[:120], xb[:120]):
            ax.plot([a[0], b[0] + w], [a[1], b[1]], "-", lw=0.5, alpha=0.6)
        lv = np.asarray(ml.valid)
        sa = np.asarray(fa.ln_sp)[lv]
        ea = np.asarray(fa.ln_ep)[lv]
        sb = np.asarray(fb.ln_sp)[np.asarray(ml.idx)[lv]]
        eb = np.asarray(fb.ln_ep)[np.asarray(ml.idx)[lv]]
        for s, e in zip(sa, ea):
            ax.plot([s[0], e[0]], [s[1], e[1]], "r-", lw=1.2)
        for s, e in zip(sb, eb):
            ax.plot([s[0] + w, e[0] + w], [s[1], e[1]], "r-", lw=1.2)
        ax.set_axis_off()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, f"match_{i:03d}.png"), dpi=110)
        plt.close(fig)
        stats.append(dict(frame=i, pt_matches=int(pv.sum()),
                          ln_matches=int(lv.sum())))

    summary = dict(pairs=len(stats),
                   mean_pt=float(np.mean([s["pt_matches"] for s in stats])),
                   mean_ln=float(np.mean([s["ln_matches"] for s in stats])))
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(dict(summary=summary, frames=stats), f)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
