"""Robust statistics over masked arrays.

The reference computes MAD-based robust standard deviations over dynamic
vectors (``vector_stdv_mad``, auxiliar.cpp:104-141) for outlier gating in
matching and pose optimization. Here every statistic takes an explicit validity
mask so it works on fixed-capacity padded arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAD_SCALE = 1.4826  # consistency constant for normal data (auxiliar.cpp:115)


def masked_median(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Median of ``x[mask]`` without dynamic shapes.

    Sorts with invalid entries pushed to +inf, then gathers the middle of the
    valid prefix. Returns 0 when nothing is valid.
    """
    n = jnp.sum(mask)
    big = jnp.asarray(jnp.inf, dtype=x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big))
    lo = jnp.clip((n - 1) // 2, 0, x.shape[0] - 1)
    hi = jnp.clip(n // 2, 0, x.shape[0] - 1)
    med = 0.5 * (xs[lo] + xs[hi])
    return jnp.where(n > 0, med, jnp.zeros((), dtype=x.dtype))


def masked_stdv_mad(x: jax.Array, mask: jax.Array) -> jax.Array:
    """1.4826 * median(|x - median(x)|) over valid entries
    (vector_stdv_mad, auxiliar.cpp:104-121)."""
    med = masked_median(x, mask)
    return _MAD_SCALE * masked_median(jnp.abs(x - med), mask)


def masked_stdv_mad_nozero(x: jax.Array, mask: jax.Array) -> jax.Array:
    """MAD stdev with a small floor, as used for match-distance gates
    (vector_stdv_mad_nozero, auxiliar.cpp:124-141)."""
    s = masked_stdv_mad(x, mask)
    return jnp.maximum(s, jnp.asarray(1e-6, dtype=x.dtype))


def masked_mean(x: jax.Array, mask: jax.Array, axis=None) -> jax.Array:
    n = jnp.sum(mask, axis=axis)
    return jnp.sum(jnp.where(mask, x, 0), axis=axis) / jnp.maximum(n, 1)
