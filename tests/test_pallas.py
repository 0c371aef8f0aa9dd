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
