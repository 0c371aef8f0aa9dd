"""Pallas TPU kernel: tiled Hamming-distance matrix over uint32 descriptors.

The hot matching op of the front-end (stereo L-R and cross-frame candidate
scoring — stereoFrame.cpp:534-557, stereoFrameHandler.cpp:477-599 in the
reference, where it is a BFMatcher loop). Tiling: a 2D grid of
[256, <=2048] output tiles (row block of ``a`` x column block of ``b``) so
the accumulator stays well under the 16 MB scoped-VMEM limit even for the
map-association shapes ([1024, 16384] OOMed with a full-``b`` panel);
XOR + popcount on the VPU, accumulate over descriptor words.

Falls back to the XLA path automatically for shapes that don't tile (see
``hamming.hamming_matrix``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256
TILE_M_MAX = 2048


def _hamming_kernel(a_ref, b_ref, out_ref):
    # a_ref: [TILE_N, W]; b_ref: [TILE_M, W]; out: [TILE_N, TILE_M] int32
    a = a_ref[:]
    b = b_ref[:]
    w = a.shape[1]
    acc = jnp.zeros((a.shape[0], b.shape[0]), jnp.int32)
    for k in range(w):  # static unroll over descriptor words
        x = jnp.bitwise_xor(a[:, k][:, None], b[:, k][None, :])
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:] = acc


@partial(jax.jit, static_argnames=("interpret",))
def hamming_matrix_pallas(a: jax.Array, b: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """[N, W] x [M, W] uint32 -> [N, M] uint32; N must be a multiple of 256
    and M a multiple of 128 (capacities in CapacityParams are); other shapes
    fall back to the XLA path. ``interpret=True`` runs the kernel in Pallas
    interpreter mode (CPU parity tests)."""
    n, w = a.shape
    m = b.shape[0]
    if n % TILE_N != 0 or m % 128 != 0:
        from gfplslam_tpu.ops.hamming import hamming_matrix_xla
        return hamming_matrix_xla(a, b)
    tile_m = next(t for t in (TILE_M_MAX, 1024, 512, 256, 128)
                  if m % t == 0)
    grid = (n // TILE_N, m // tile_m)
    out = pl.pallas_call(
        _hamming_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, w), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, w), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, tile_m), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.int32),
        interpret=interpret,
    )(a, b)
    return out.astype(jnp.uint32)
