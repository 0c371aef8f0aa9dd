"""Trained-vocabulary quality: revisit vs non-revisit discrimination.

The reference's loop detector depends on pre-trained DBoW2 vocabularies
(config.cpp:59-60); this test trains the k-majority vocabulary in-process
over one corpus (apps/train_vocab.py) and checks that BoW scores separate a
true revisit (same viewpoint, different noise) from a different place — and
that the trained words separate them more sharply than the random-anchor
fallback."""

import numpy as np
import jax.numpy as jnp
import pytest

from gfplslam_tpu.apps.train_vocab import kmajority
from gfplslam_tpu.config import (CameraParams, CapacityParams, Config,
                                 OrbParams)
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.models import loop as loop_ops
from gfplslam_tpu.models.frame import process_stereo_pair


@pytest.fixture(scope="module")
def cfg():
    return Config(
        cap=CapacityParams(n_pt=256, n_ln=128, n_kf_max=8, vocab_k=64),
        orb=OrbParams(nlevels=2),
        camera=CameraParams(width=376, height=240, fx=217.6, fy=217.6,
                            cx=183.7, cy=126.1, baseline=0.11))


def _frames(cfg):
    """KF0: place A; KF1: place A re-rendered (revisit, new noise);
    KF2: different world entirely (non-revisit)."""
    wa = synthetic.make_world(n_frames=2, n_points=350, n_lines=40, seed=5)
    wb = synthetic.make_world(n_frames=2, n_points=350, n_lines=40, seed=99)
    fa0 = synthetic.render_frame(wa, 0, noise=1.0, seed=11)
    fa1 = synthetic.render_frame(wa, 0, noise=1.0, seed=77)
    fb = synthetic.render_frame(wb, 0, noise=1.0, seed=33)
    out = []
    for il, ir in (fa0, fa1, fb):
        out.append(process_stereo_pair(jnp.asarray(il), jnp.asarray(ir),
                                       cfg, jnp.asarray(20.0)))
    return out


def _margin(cfg, frames):
    """conf[revisit] - conf[non-revisit] under the active vocabulary."""
    ls = loop_ops.empty_loop_state(cfg)
    for i, f in enumerate(frames):
        ls = loop_ops.insert_kf_bow(cfg, ls, jnp.asarray(i), f)
    conf = np.asarray(ls.conf)
    return float(conf[1, 0] - conf[2, 0]), conf


def test_trained_vocab_beats_random_anchors(cfg):
    frames = _frames(cfg)
    try:
        import jax

        loop_ops.set_vocab(loop_ops.make_vocab(seed=31),
                           loop_ops.make_vocab(seed=67))
        jax.clear_caches()
        m_rand, _ = _margin(cfg, frames)

        # train words on place-A descriptors (the corpus)
        pd = np.asarray(frames[0].points.desc)[
            np.asarray(frames[0].points.valid)]
        ld = np.asarray(frames[0].lines.desc)[
            np.asarray(frames[0].lines.valid)]
        vp = kmajority(pd, cfg.cap.vocab_k, seed=1)
        vl = kmajority(ld, min(cfg.cap.vocab_k, max(8, len(ld) // 2)),
                       seed=2)
        if len(vl) < cfg.cap.vocab_k:
            rng = np.random.default_rng(5)
            vl = np.concatenate([vl, rng.integers(
                0, 2 ** 32, size=(cfg.cap.vocab_k - len(vl), 8),
                dtype=np.uint32)])
        loop_ops.set_vocab(vp, vl)
        jax.clear_caches()
        m_trained, conf = _margin(cfg, frames)
    finally:
        import jax

        loop_ops.set_vocab(loop_ops.make_vocab(seed=31),
                           loop_ops.make_vocab(seed=67))
        loop_ops._load_default_vocab()
        jax.clear_caches()

    # the revisit must outscore the non-revisit decisively with trained
    # words, and by more than the random-anchor fallback manages
    assert m_trained > 0.05, (m_trained, conf)
    assert m_trained > m_rand, (m_trained, m_rand)


def test_default_vocab_is_trained():
    """The package ships a trained vocabulary and loads it by default
    (parity with the reference loading voc_all_datasets_*.yml,
    config.cpp:59-60)."""
    assert loop_ops.VOCAB_SOURCE != "random-anchors", loop_ops.VOCAB_SOURCE


def test_shipped_vocab_has_frozen_idf():
    """The shipped vocabulary carries training-corpus document frequencies
    so idf weighting is frozen (DBoW2 setNodeWeights semantics,
    TemplatedVocabulary.h:1066-1127)."""
    idf = loop_ops.active_idf(256)
    assert idf is not None, "vocab_synth.npz lacks df_p/df_l/n_docs"
    assert np.isfinite(idf[0]).all() and np.isfinite(idf[1]).all()
    assert (idf[0] >= 0).all()


def test_frozen_idf_scores_are_epoch_consistent():
    """The BoW score of the same two keyframes must not depend on how many
    other keyframes were inserted in between — online-df scoring drifts
    across epochs as the map grows; frozen trained idf does not."""
    cfg = Config(
        cap=CapacityParams(n_pt=256, n_ln=128, n_kf_max=16, vocab_k=256),
        orb=OrbParams(nlevels=2),
        camera=CameraParams(width=376, height=240, fx=217.6, fy=217.6,
                            cx=183.7, cy=126.1, baseline=0.11))
    assert loop_ops.active_idf(cfg.cap.vocab_k) is not None

    wa = synthetic.make_world(n_frames=2, n_points=350, n_lines=40, seed=5)
    wd = synthetic.make_world(n_frames=10, n_points=350, n_lines=40, seed=42)
    fa0 = synthetic.render_frame(wa, 0, noise=1.0, seed=11)
    fa1 = synthetic.render_frame(wa, 0, noise=1.0, seed=77)
    distract = [synthetic.render_frame(wd, i, noise=1.0) for i in range(8)]
    fr = []
    for il, ir in [fa0, fa1] + distract:
        fr.append(process_stereo_pair(jnp.asarray(il), jnp.asarray(ir),
                                      cfg, jnp.asarray(20.0)))

    # early epoch: A, revisit-A back to back
    ls = loop_ops.empty_loop_state(cfg)
    ls = loop_ops.insert_kf_bow(cfg, ls, jnp.asarray(0), fr[0])
    ls = loop_ops.insert_kf_bow(cfg, ls, jnp.asarray(1), fr[1])
    s_early = float(np.asarray(ls.conf)[1, 0])

    # late epoch: A, 8 distractors, then revisit-A
    ls = loop_ops.empty_loop_state(cfg)
    ls = loop_ops.insert_kf_bow(cfg, ls, jnp.asarray(0), fr[0])
    for i, f in enumerate(fr[2:]):
        ls = loop_ops.insert_kf_bow(cfg, ls, jnp.asarray(1 + i), f)
    ls = loop_ops.insert_kf_bow(cfg, ls, jnp.asarray(9), fr[1])
    s_late = float(np.asarray(ls.conf)[9, 0])

    assert s_early > 0, s_early
    np.testing.assert_allclose(s_late, s_early, rtol=1e-5)


def test_shipped_4096_vocab_is_default_scale():
    """The default capacity ships the 4096-word trained codebook (retrieval
    AP 0.73 vs 0.39 at 256 words on the 3-lap aliased circuit —
    VOCAB_PR.json); its frozen idf must load with it."""
    from gfplslam_tpu.config import CapacityParams
    assert CapacityParams().vocab_k == 4096
    vp, vl = loop_ops.active_vocab(4096)
    assert vp.shape == (4096, 8) and vl.shape == (4096, 8)
    assert 4096 in loop_ops._TRAINED, "data/vocab_synth4096.npz not loaded"
    idf = loop_ops.active_idf(4096)
    assert idf is not None and np.isfinite(idf[0]).all()
