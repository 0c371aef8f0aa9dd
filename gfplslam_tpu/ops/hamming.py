"""Batched Hamming-distance matrices for binary descriptors.

The reference computes Hamming distances pairwise inside BFMatcher loops and a
hand-rolled popcount (stereoFrame.h:185-201). Here the whole N x M distance
matrix is one device program: XOR-broadcast + ``lax.population_count``, with a
Pallas TPU kernel (`ops/pallas/hamming_pl.py`) for the tiled production path
and this XLA reference path for CPU tests and autodiff-free fallback.

Descriptors: [N, W] uint32 (W=8 words = 256 bits). Invalid rows are masked by
setting their distances to ``BIG``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = jnp.uint32(1 << 16)  # > max possible distance (256)


def hamming_matrix_xla(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N, W] x [M, W] uint32 -> [N, M] uint32 Hamming distances."""
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1, dtype=jnp.uint32)


_ON_TPU = None


def _tpu_backend() -> bool:
    """True when the default backend is a TPU (incl. the axon tunnel
    platform); decided once at first trace."""
    global _ON_TPU
    if _ON_TPU is None:
        try:
            _ON_TPU = jax.default_backend() in ("tpu", "axon")
        except Exception:
            _ON_TPU = False
    return _ON_TPU


def hamming_matrix(a: jax.Array, b: jax.Array,
                   valid_a: jax.Array | None = None,
                   valid_b: jax.Array | None = None,
                   use_pallas: bool | None = None) -> jax.Array:
    """Masked Hamming distance matrix; invalid rows/cols get BIG.

    ``use_pallas=None`` (default) selects the tiled Pallas kernel on TPU
    backends and the XLA popcount path elsewhere; pass True/False to force.
    """
    if use_pallas is None:
        use_pallas = _tpu_backend()
    if use_pallas:
        from gfplslam_tpu.ops.pallas.hamming_pl import hamming_matrix_pallas
        d = hamming_matrix_pallas(a, b)
    else:
        d = hamming_matrix_xla(a, b)
    if valid_a is not None:
        d = jnp.where(valid_a[:, None], d, BIG)
    if valid_b is not None:
        d = jnp.where(valid_b[None, :], d, BIG)
    return d
