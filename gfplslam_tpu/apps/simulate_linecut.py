"""Monte-Carlo validation of the line-cut objective on synthetic geometry.

Parity with the reference's simulators + analysis notebooks
(src/simulate_line_cut.cpp:11-60: fabricate random frames with known motion,
run the cut machinery 1000x, log loss/volume landscapes;
simu/simu_line_vol_assessment.py plots them). Here the rounds run batched on
device and the plots are written headlessly.

Checks the property the reference relies on (stereoFrameHandler.cpp:1472-75
comment: "the pose covariance matrix being convex wrt the line cutting
ratio"): the log-volume objective along each cut axis is well-behaved and
the greedy solver lands within tolerance of the exhaustive-grid optimum.

Usage: python -m gfplslam_tpu.apps.simulate_linecut -n 200 -o /tmp/linecut
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--rounds", type=int, default=200)
    ap.add_argument("-o", "--out", default="/tmp/gfpl_linecut")
    ap.add_argument("--lines", type=int, default=8)
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    import jax.numpy as jnp
    from gfplslam_tpu.config import CameraParams
    from gfplslam_tpu.models import linecut
    from gfplslam_tpu.models.pose_opt import LineMatches, PointMatches

    # camera matching simulate_line_cut.cpp:14-38 (640x480, f=525, b=0.12)
    cam = CameraParams(width=640, height=480, fx=525.0, fy=525.0,
                       cx=320.0, cy=240.0, baseline=0.12)
    rng = np.random.default_rng(7)
    m = args.lines

    gaps = []
    grid_best = []
    greedy_best = []
    landscape_sum = None
    grid = np.arange(0.0, 1.0001, 0.05)

    for round_i in range(args.rounds):
        sp = np.stack([rng.uniform(-2, 2, m), rng.uniform(-1.5, 1.5, m),
                       rng.uniform(2, 8, m)], 1).astype(np.float32)
        ep = sp + rng.normal(0, 1.0, (m, 3)).astype(np.float32)
        ep[:, 2] = np.abs(ep[:, 2]) + 2

        def proj(p):
            return np.stack([cam.fx * p[:, 0] / p[:, 2] + cam.cx,
                             cam.fy * p[:, 1] / p[:, 2] + cam.cy], 1)
        s2, e2 = proj(sp), proj(ep)
        le = np.cross(np.concatenate([s2, np.ones((m, 1))], 1),
                      np.concatenate([e2, np.ones((m, 1))], 1))
        le /= np.linalg.norm(le[:, :2], axis=1, keepdims=True)
        lns = LineMatches(sp3d=jnp.asarray(sp), ep3d=jnp.asarray(ep),
                          le_obs=jnp.asarray(le.astype(np.float32)),
                          sigma2=jnp.ones(m), valid=jnp.ones(m, bool))
        scale = rng.uniform(0.1, 2.0, m).astype(np.float32)
        cov_s = jnp.asarray(np.einsum("m,ij->mij", 0.01 * scale, np.eye(3))
                            .astype(np.float32))
        cov_e = jnp.asarray(np.einsum("m,ij->mij", 1.0 * scale, np.eye(3))
                            .astype(np.float32))
        pts = PointMatches(p3d=jnp.ones((4, 3)), obs=jnp.zeros((4, 2)),
                           sigma2=jnp.ones(4), valid=jnp.zeros(4, bool))

        cut = linecut.cut_lines(cam, jnp.eye(4), lns, cov_s, cov_e, pts,
                                max_steps=20)
        greedy = float(linecut._logdet_pd(cut.info_sum))

        # exhaustive landscape for line 0 (others at greedy solution)
        rest = np.asarray(cut.info_sum) - np.asarray(cut.info[0])
        vals = np.zeros((len(grid), len(grid)), np.float32)
        for i, r0 in enumerate(grid):
            for j, r1 in enumerate(grid):
                if r0 + r1 > 1.0:
                    vals[i, j] = np.nan
                    continue
                info = np.asarray(linecut.pose_info_line(
                    cam, jnp.eye(4), lns.sp3d[0], lns.ep3d[0], cov_s[0],
                    cov_e[0], lns.le_obs[0], jnp.asarray(float(r0)),
                    jnp.asarray(float(r1))))
                vals[i, j] = float(linecut._logdet_pd(
                    jnp.asarray(rest + info)))
        best_grid = np.nanmax(vals)
        own = float(linecut._logdet_pd(jnp.asarray(
            rest + np.asarray(cut.info[0]))))
        gaps.append(best_grid - own)
        grid_best.append(best_grid)
        greedy_best.append(greedy)
        if landscape_sum is None:
            landscape_sum = np.nan_to_num(vals - np.nanmax(vals))
        else:
            landscape_sum += np.nan_to_num(vals - np.nanmax(vals))
        if round_i >= 20 and round_i % 50 == 0:
            print(f"round {round_i}: mean optimality gap "
                  f"{np.mean(gaps):.4f}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    im = axes[0].imshow(landscape_sum / args.rounds, origin="lower",
                        extent=[0, 1, 0, 1], aspect="auto")
    axes[0].set_xlabel("r1")
    axes[0].set_ylabel("r0")
    axes[0].set_title("mean logdet landscape (rel. to max)")
    fig.colorbar(im, ax=axes[0])
    axes[1].hist(gaps, bins=30)
    axes[1].set_xlabel("grid-optimum minus greedy (line 0)")
    axes[1].set_title("optimality gap")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "linecut_landscape.png"), dpi=110)

    summary = dict(rounds=args.rounds,
                   mean_gap=float(np.mean(gaps)),
                   p95_gap=float(np.percentile(gaps, 95)))
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
