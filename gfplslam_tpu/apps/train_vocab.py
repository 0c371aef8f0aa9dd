"""Train binary bag-of-words vocabularies from sequence descriptors.

Parity with DBoW2's offline vocabulary training (the reference ships
pre-trained ``voc_all_datasets_{orb,bld}.yml`` built with hierarchical
k-means over ORB/LBD descriptors, TemplatedVocabulary.h:135-162 — the files
are absent from the snapshot, build.sh:17-20). This trainer runs binary
k-means (k-majority: cluster center = bitwise majority of members) over
descriptors harvested from synthetic or dataset frames and writes an anchor
vocabulary npz that ``models/loop.py`` can load in place of the default
random anchors.

Usage:
  python -m gfplslam_tpu.apps.train_vocab --synthetic --frames 20 \
      -o vocab.npz --words 256
"""

from __future__ import annotations

import argparse

import numpy as np


def unpack_bits(desc: np.ndarray) -> np.ndarray:
    """[N, 8] uint32 -> [N, 256] uint8 bits."""
    b = desc.view(np.uint8).reshape(len(desc), -1)
    return np.unpackbits(b, axis=1, bitorder="little")


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """[N, 256] bits -> [N, 8] uint32."""
    by = np.packbits(bits.astype(np.uint8), axis=1, bitorder="little")
    return by.view(np.uint32)


def kmajority(desc: np.ndarray, k: int, iters: int = 10,
              seed: int = 0) -> np.ndarray:
    """Binary k-means with majority-vote centers (DBoW2's descriptor
    clustering, TemplatedVocabulary.h initiateClusters/meanValue).

    Device-accelerated: assignment is the packed-popcount Hamming matrix
    (ops/hamming) over row blocks, and the majority vote is ONE one-hot
    matmul ``assign_onehot.T @ bits`` — the dense numpy broadcast the old
    trainer used is O(N*k*256) bytes and infeasible past k~512."""
    import jax
    import jax.numpy as jnp
    from gfplslam_tpu.ops.hamming import hamming_matrix

    rng = np.random.default_rng(seed)
    n = len(desc)
    bits = jnp.asarray(unpack_bits(desc))                   # [N, 256] uint8
    packed = jnp.asarray(desc)                              # [N, 8] uint32
    centers = desc[rng.choice(n, size=k, replace=n < k)]    # packed [k, 8]

    @jax.jit
    def assign_block(block, cen):
        return jnp.argmin(hamming_matrix(block, cen), axis=1)

    @jax.jit
    def majority(assign, reseed_bits):
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)   # [N, k]
        counts = jnp.sum(onehot, axis=0)                        # [k]
        sums = onehot.T @ bits.astype(jnp.float32)              # [k, 256]
        maj = (sums * 2.0 > counts[:, None]).astype(jnp.uint8)
        # empty clusters re-seed from random members
        return jnp.where(counts[:, None] > 0, maj, reseed_bits), counts

    block = 8192
    assign = np.empty(n, np.int32)
    for it in range(iters):
        cen_dev = jnp.asarray(centers)
        for s in range(0, n, block):
            assign[s:s + block] = np.asarray(
                assign_block(packed[s:s + block], cen_dev))
        reseed_bits = jnp.asarray(unpack_bits(desc[rng.choice(n, size=k)]))
        maj_bits, counts = majority(jnp.asarray(assign), reseed_bits)
        new_centers = pack_bits(np.asarray(maj_bits))
        if np.array_equal(new_centers, centers):
            break
        centers = new_centers
    return centers


def document_frequencies(vocab: np.ndarray, docs: list) -> np.ndarray:
    """[V] document frequencies: number of training frames whose descriptor
    set contains each word (DBoW2 computes idf from the training corpus and
    FREEZES it, TemplatedVocabulary.h:1066-1127 setNodeWeights)."""
    import jax.numpy as jnp
    from gfplslam_tpu.ops.hamming import hamming_matrix

    vb = jnp.asarray(vocab)
    df = np.zeros(len(vocab), np.int64)
    for d in docs:
        if not len(d):
            continue
        words = np.unique(np.asarray(
            jnp.argmin(hamming_matrix(jnp.asarray(d), vb), axis=1)))
        df[words] += 1
    return df


def harvest_descriptors(args):
    """Descriptors from several distinct synthetic worlds/motions — the
    stand-in for the reference's multi-dataset training corpus
    (voc_all_datasets_*, config.cpp:59-60). Returns flat descriptor arrays
    plus the per-frame document lists for idf training."""
    import jax.numpy as jnp
    from gfplslam_tpu.config import (CameraParams, CapacityParams, Config,
                                     OrbParams)
    from gfplslam_tpu.io import synthetic
    from gfplslam_tpu.models.frame import process_stereo_pair

    cfg = Config(
        cap=CapacityParams(n_pt=256, n_ln=128), orb=OrbParams(nlevels=2),
        camera=CameraParams(width=376, height=240, fx=217.6, fy=217.6,
                            cx=183.7, cy=126.1, baseline=0.11))
    # diverse corpus: three motions x blob tier + textured raycast tier +
    # extra scene seeds (cross-SCENE discrimination needs words that split
    # scenes, not only viewpoints — a narrow corpus overfits common
    # texture statistics and scores unrelated scenes high)
    specs = [(17, "forward", False), (41, "orbit", False),
             (73, "loop", False), (21, "loop", True), (55, "forward", True),
             (8, "forward", False), (99, "forward", False)]
    if args.words >= 1024:
        # large codebooks need a larger/more diverse corpus: ~16 scenes
        # spanning every motion family and both render tiers (k-majority
        # with fewer than ~10 members per word degenerates to memorized
        # descriptors)
        specs += [(s, m, tex)
                  for s, m in [(5, "circuit"), (29, "circuit"),
                               (61, "orbit"), (83, "loop"), (123, "forward"),
                               (151, "orbit"), (203, "circuit")]
                  for tex in (False, True)]
    worlds = [synthetic.make_world(n_frames=args.frames, seed=s, motion=m,
                                   n_points=400, n_lines=50,
                                   cam=cfg.camera, textured=tex)
              for s, m, tex in specs]
    pt_desc, ln_desc = [], []
    for world in worlds:
        for i in range(0, args.frames, 2):
            il, ir = synthetic.render_frame(world, i)
            f = process_stereo_pair(jnp.asarray(il), jnp.asarray(ir), cfg,
                                    jnp.asarray(20.0))
            pv = np.asarray(f.points.valid)
            lv = np.asarray(f.lines.valid)
            pt_desc.append(np.asarray(f.points.desc)[pv])
            ln_desc.append(np.asarray(f.lines.desc)[lv])
    return (np.concatenate(pt_desc), np.concatenate(ln_desc),
            pt_desc, ln_desc)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true", required=True)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--words", type=int, default=256)
    ap.add_argument("-o", "--out", default="vocab.npz")
    args = ap.parse_args(argv)

    pt_desc, ln_desc, pt_docs, ln_docs = harvest_descriptors(args)
    print(f"harvested {len(pt_desc)} point / {len(ln_desc)} line descriptors")
    vp = kmajority(pt_desc, args.words, iters=20)
    vl = kmajority(ln_desc, min(args.words, max(16, len(ln_desc) // 4)), iters=20)
    if len(vl) < args.words:  # pad with random anchors to the word count
        rng = np.random.default_rng(5)
        pad = rng.integers(0, 2 ** 32, size=(args.words - len(vl), 8),
                           dtype=np.uint32)
        vl = np.concatenate([vl, pad])
    # frozen training-corpus idf (DBoW2 semantics): scores stay on one scale
    # no matter how many KFs the online map accumulates
    df_p = document_frequencies(vp, pt_docs)
    df_l = document_frequencies(vl, ln_docs)
    n_docs = len(pt_docs)
    np.savez(args.out, vocab_p=vp, vocab_l=vl, df_p=df_p, df_l=df_l,
             n_docs=np.asarray(n_docs))
    print(f"wrote {args.out}: {vp.shape} point words, {vl.shape} line words, "
          f"df over {n_docs} docs")


if __name__ == "__main__":
    main()
