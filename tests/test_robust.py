"""Masked robust statistics (vector_stdv_mad parity, auxiliar.cpp:104-141)."""

import jax.numpy as jnp
import numpy as np

from gfplslam_tpu.utils import robust


def test_masked_median_odd():
    x = jnp.asarray([5.0, 1.0, 3.0, 99.0, 2.0])
    mask = jnp.asarray([True, True, True, False, True])
    assert float(robust.masked_median(x, mask)) == 2.5  # median of {1,2,3,5}


def test_masked_median_matches_numpy(rng):
    x = rng.normal(size=64).astype(np.float32)
    mask = rng.uniform(size=64) > 0.3
    ours = float(robust.masked_median(jnp.asarray(x), jnp.asarray(mask)))
    theirs = float(np.median(x[mask]))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_mad_scale(rng):
    # MAD stdev of a large normal sample approximates sigma
    x = rng.normal(scale=2.0, size=4096).astype(np.float32)
    mask = np.ones(4096, bool)
    s = float(robust.masked_stdv_mad(jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(s, 2.0, rtol=0.1)


def test_mad_robust_to_outliers(rng):
    x = rng.normal(size=256).astype(np.float32)
    x[:10] = 1e6  # gross outliers
    mask = np.ones(256, bool)
    s = float(robust.masked_stdv_mad(jnp.asarray(x), jnp.asarray(mask)))
    assert s < 3.0


def test_empty_mask():
    x = jnp.asarray([1.0, 2.0])
    mask = jnp.asarray([False, False])
    assert float(robust.masked_median(x, mask)) == 0.0
