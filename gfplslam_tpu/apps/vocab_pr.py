"""Retrieval precision/recall for the place-recognition vocabulary.

The reference trusts DBoW2's pre-trained 10^5-word vocabularies for loop
candidacy (TemplatedVocabulary.h:1066-1127, config.cpp:59-60); this app
measures what our trained codebooks actually deliver at map scale: a
multi-lap textured circuit world (every lap re-passes the same places;
mid-lap frames alias across laps) is scored frame-against-frame through the
REAL scoring path (``insert_kf_bow``'s conf matrix — tf-idf + L1 + the
count/dispersion-weighted dual combination), ground-truth revisit labels
come from GT poses, and the score threshold is swept into a PR curve.

Usage:
  python -m gfplslam_tpu.apps.vocab_pr --frames 241 --laps 3 \
      -o VOCAB_PR.json [--compare 256]
Writes per-vocabulary PR curves + average precision to the JSON.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def build_score_matrix(vocab_k: int, frames, cfg_base):
    """Run every frame through insert_kf_bow at the given vocabulary size;
    return the [N, N] conf-score matrix (upper triangle meaningful)."""
    import jax.numpy as jnp
    from dataclasses import replace
    from gfplslam_tpu.models import loop as loop_ops

    n = len(frames)
    cfg = replace(cfg_base, cap=replace(cfg_base.cap, vocab_k=vocab_k,
                                        n_kf_max=n))
    ls = loop_ops.empty_loop_state(cfg)
    for i, f in enumerate(frames):
        ls = loop_ops.insert_kf_bow(cfg, ls, jnp.asarray(i), f)
    return np.asarray(ls.conf)


def revisit_labels(poses: np.ndarray, min_sep: int = 30,
                   pos_dist: float = 0.6, pos_deg: float = 12.0,
                   neg_dist: float = 1.5):
    """GT labels per (i, j<i-min_sep) pair: 1 = same place (revisit),
    0 = different place; pairs in the distance margin between pos and neg
    are excluded (ambiguous)."""
    n = len(poses)
    t = poses[:, :3, 3]
    labels = {}
    for i in range(n):
        for j in range(0, i - min_sep):
            d = np.linalg.norm(t[i] - t[j])
            r = poses[i][:3, :3].T @ poses[j][:3, :3]
            ang = np.degrees(np.arccos(np.clip((np.trace(r) - 1) / 2, -1, 1)))
            if d < pos_dist and ang < pos_deg:
                labels[(i, j)] = 1
            elif d > neg_dist:
                labels[(i, j)] = 0
    return labels


def pr_curve(scores: np.ndarray, labels: dict):
    """Precision/recall over the score threshold sweep + average precision."""
    pairs = sorted(labels.items(), key=lambda kv: -scores[kv[0][0], kv[0][1]])
    n_pos = sum(v for _, v in pairs)
    if n_pos == 0:
        return [], [], 0.0
    prec, rec, tp = [], [], 0
    ap = 0.0
    prev_r = 0.0
    for rank, ((i, j), y) in enumerate(pairs, 1):
        tp += y
        p = tp / rank
        r = tp / n_pos
        prec.append(p)
        rec.append(r)
        ap += p * (r - prev_r)
        prev_r = r
    return prec, rec, ap


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=241)
    ap.add_argument("--laps", type=int, default=3)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--words", type=int, default=4096)
    ap.add_argument("--compare", type=int, nargs="*", default=[256])
    ap.add_argument("--random-anchors", action="store_true",
                    help="also score the untrained random-anchor fallback")
    ap.add_argument("-o", "--out", default="VOCAB_PR.json")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from gfplslam_tpu.config import CameraParams, Config
    from gfplslam_tpu.io import synthetic
    from gfplslam_tpu.models import loop as loop_ops
    from gfplslam_tpu.models.frame import process_stereo_pair

    cam = CameraParams()
    cfg = Config(camera=cam)
    world = synthetic.make_world(
        n_frames=args.frames, n_points=900, n_lines=90, seed=args.seed,
        motion="circuit", cam=cam, textured=True, laps=args.laps)
    idx = list(range(0, args.frames, args.stride))
    print(f"rendering {len(idx)} frames ({args.laps}-lap circuit)...")
    frames = []
    for i in idx:
        il, ir = synthetic.render_frame(world, i, noise=1.0)
        frames.append(process_stereo_pair(
            jnp.asarray(np.clip(np.round(il), 0, 255).astype(np.uint8)),
            jnp.asarray(np.clip(np.round(ir), 0, 255).astype(np.uint8)),
            cfg, jnp.asarray(20.0)))
    poses = world.poses[idx]
    labels = revisit_labels(poses)
    n_pos = sum(labels.values())
    print(f"{len(labels)} labeled pairs, {n_pos} true revisits")

    out = {"frames": len(idx), "laps": args.laps,
           "n_pairs": len(labels), "n_revisit": n_pos, "curves": {}}
    for k in [args.words] + list(args.compare):
        scores = build_score_matrix(k, frames, cfg)
        prec, rec, ap_v = pr_curve(scores, labels)
        name = f"trained_{k}" if loop_ops._TRAINED.get(k) else f"random_{k}"
        # decimate the curve for the JSON (keep every ~1% of recall)
        keep = np.unique(np.linspace(0, len(prec) - 1, 101).astype(int))
        out["curves"][name] = {
            "average_precision": round(float(ap_v), 4),
            "precision": [round(float(prec[i]), 4) for i in keep],
            "recall": [round(float(rec[i]), 4) for i in keep],
            "p_at_r50": round(float(max(
                (p for p, r in zip(prec, rec) if r >= 0.5), default=0.0)), 4),
        }
        print(f"vocab {name}: AP={ap_v:.4f}")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
