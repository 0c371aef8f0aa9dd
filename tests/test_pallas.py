"""Parity of the Pallas TPU matching kernel against the XLA reference path.

On the CPU test fixture the kernel runs in Pallas interpreter mode; on a
real TPU backend `hamming_matrix(use_pallas=None)` selects the compiled
kernel automatically (ops/hamming.py) and bench.py exercises it.
"""

import numpy as np
import jax.numpy as jnp

from gfplslam_tpu.ops.hamming import hamming_matrix, hamming_matrix_xla
from gfplslam_tpu.ops.pallas.hamming_pl import hamming_matrix_pallas


def _rand_desc(n, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 2 ** 32, size=(n, 8),
                                    dtype=np.uint32))


def test_pallas_hamming_parity_interpret():
    a = _rand_desc(256, 0)
    b = _rand_desc(128, 1)
    ref = np.asarray(hamming_matrix_xla(a, b))
    out = np.asarray(hamming_matrix_pallas(a, b, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pallas_hamming_parity_large():
    a = _rand_desc(1024, 2)
    b = _rand_desc(512, 3)
    ref = np.asarray(hamming_matrix_xla(a, b))
    out = np.asarray(hamming_matrix_pallas(a, b, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pallas_fallback_shapes():
    # non-tiling shapes must fall back to the XLA path transparently
    a = _rand_desc(100, 4)
    b = _rand_desc(60, 5)
    ref = np.asarray(hamming_matrix_xla(a, b))
    out = np.asarray(hamming_matrix_pallas(a, b, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_hamming_matrix_masking_consistency():
    a = _rand_desc(256, 6)
    b = _rand_desc(128, 7)
    va = jnp.asarray(np.arange(256) % 3 != 0)
    vb = jnp.asarray(np.arange(128) % 2 == 0)
    d0 = np.asarray(hamming_matrix(a, b, va, vb, use_pallas=False))
    big = 1 << 16
    assert (d0[~np.asarray(va)] == big).all()
    assert (d0[:, ~np.asarray(vb)] == big).all()


# ---- FAST score-map kernel (ops/pallas/fast_pl.py) ----

def test_pallas_fast_score_parity_interpret():
    """Bit-exact parity with the XLA roll formulation on every pixel (both
    paths zero the 3px border where their edge semantics differ)."""
    from gfplslam_tpu.ops.fast import fast_score_map_xla
    from gfplslam_tpu.ops.pallas.fast_pl import fast_score_map_pallas

    rng = np.random.default_rng(11)
    for h, w in [(480, 752), (240, 376), (376, 1241)]:
        img = jnp.asarray(rng.integers(0, 256, size=(h, w)).astype(np.float32))
        ref = np.asarray(fast_score_map_xla(img, jnp.asarray(20.0)))
        out = np.asarray(fast_score_map_pallas(img, jnp.asarray(20.0),
                                               interpret=True))
        np.testing.assert_array_equal(out, ref)


def test_pallas_fast_score_vmap_traced_threshold():
    """frame.py's per-level pattern: vmap over padded levels with a
    closed-over traced threshold (the adaptive-FAST scalar)."""
    import jax
    from gfplslam_tpu.ops.fast import fast_score_map_xla
    from gfplslam_tpu.ops.pallas.fast_pl import fast_score_map_pallas

    rng = np.random.default_rng(12)
    imgs = jnp.asarray(rng.integers(0, 256, size=(3, 120, 190))
                       .astype(np.float32))

    @jax.jit
    def run(imgs, th):
        return jax.vmap(
            lambda im: fast_score_map_pallas(im, th, interpret=True))(imgs)

    for th in (10.0, 35.0):
        out = np.asarray(run(imgs, jnp.asarray(th)))
        ref = np.stack([np.asarray(fast_score_map_xla(imgs[i],
                                                      jnp.asarray(th)))
                        for i in range(3)])
        np.testing.assert_array_equal(out, ref)
