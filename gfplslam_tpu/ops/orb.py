"""ORB orientation + 256-bit binary descriptors as batched gather kernels.

Capability parity with the reference's extractor (ORBextractor.cc): intensity
-centroid orientation ``IC_Angle`` (:77-102) and rotated-BRIEF descriptors
(:103-142, 1043-1105). TPU-native design decisions:

- orientation and description are ``vmap``-ed closed forms over the padded
  keypoint array (one gather kernel each), not per-keypoint loops;
- the sampling pattern is generated, not copied: an isotropic-Gaussian BRIEF
  pattern (sigma = patch/5, the classic BRIEF recipe) from a fixed seed.
  Descriptors only ever compare against descriptors produced by this same
  module (matching, BoW vocabulary are all in-engine), so the learned
  ORB table is unnecessary — determinism and bit layout are what matter;
- descriptors are packed into 8 uint32 words for popcount matching
  (stereoFrame.h:185-201's bit-hack becomes ``lax.population_count``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PATCH_RADIUS = 15          # orientation disc radius (HALF_PATCH_SIZE)
DESC_BITS = 256
DESC_WORDS = 8             # 256 bits / 32


def _disc_mask(radius: int) -> np.ndarray:
    y, x = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return (x * x + y * y <= radius * radius).astype(np.float32)


_DISC = _disc_mask(PATCH_RADIUS)
_DISC_X = (_DISC * np.mgrid[-PATCH_RADIUS:PATCH_RADIUS + 1,
                            -PATCH_RADIUS:PATCH_RADIUS + 1][1]).astype(np.float32)
_DISC_Y = (_DISC * np.mgrid[-PATCH_RADIUS:PATCH_RADIUS + 1,
                            -PATCH_RADIUS:PATCH_RADIUS + 1][0]).astype(np.float32)


def make_brief_pattern(seed: int = 1234, n_bits: int = DESC_BITS,
                       radius: int = 13) -> np.ndarray:
    """[n_bits, 4] int32 (x1, y1, x2, y2) — BRIEF-II isotropic Gaussian pairs,
    sigma = patch_size/5, clipped to the sampling radius. Deterministic."""
    rng = np.random.default_rng(seed)
    sigma = (2 * radius + 1) / 5.0
    pts = rng.normal(scale=sigma, size=(n_bits, 4))
    return np.clip(np.round(pts), -radius, radius).astype(np.int32)


BRIEF_PATTERN = make_brief_pattern()


def make_brief_pool(seed: int = 1234, n_pool: int = DESC_BITS,
                    n_bits: int = DESC_BITS, radius: int = 13):
    """Sample-pool BRIEF: ``n_pool`` isotropic-Gaussian offsets plus
    ``n_bits`` comparison pairs drawn from the pool (each sample feeds ~2
    bits). Halves the per-keypoint gather count vs independent pairs at a
    negligible descriptor-correlation cost. Deterministic."""
    rng = np.random.default_rng(seed)
    sigma = (2 * radius + 1) / 5.0
    pool = np.clip(np.round(rng.normal(scale=sigma, size=(n_pool, 2))),
                   -radius, radius).astype(np.int32)
    pairs = set()
    out = []
    while len(out) < n_bits:
        i, j = rng.integers(0, n_pool, 2)
        key = (min(i, j), max(i, j))
        if i != j and key not in pairs and not np.array_equal(pool[i], pool[j]):
            pairs.add(key)
            out.append((i, j))
    return pool, np.asarray(out, np.int32)


BRIEF_POOL, BRIEF_PAIRS = make_brief_pool()


def _gather_patch(img: jax.Array, cx: jax.Array, cy: jax.Array,
                  radius: int) -> jax.Array:
    """[2r+1, 2r+1] patch around (cx, cy) with clamped borders."""
    h, w = img.shape
    dy = jnp.arange(-radius, radius + 1)
    dx = jnp.arange(-radius, radius + 1)
    ys = jnp.clip(cy.astype(jnp.int32) + dy, 0, h - 1)
    xs = jnp.clip(cx.astype(jnp.int32) + dx, 0, w - 1)
    return img[ys[:, None], xs[None, :]]


def ic_angle_one(img: jax.Array, xy: jax.Array) -> jax.Array:
    """Intensity-centroid orientation of one keypoint (IC_Angle,
    ORBextractor.cc:77-102): atan2(m01, m10) over the radius-15 disc."""
    patch = _gather_patch(img, xy[0], xy[1], PATCH_RADIUS)
    m10 = jnp.sum(patch * jnp.asarray(_DISC_X))
    m01 = jnp.sum(patch * jnp.asarray(_DISC_Y))
    return jnp.arctan2(m01, m10)


def ic_angles(img: jax.Array, xy: jax.Array) -> jax.Array:
    """[N,2] keypoints -> [N] angles (radians)."""
    return jax.vmap(lambda p: ic_angle_one(img, p))(xy)


def _box_filter(x: jax.Array, radius: int) -> jax.Array:
    """(2r+1)-square box sum via cumsum + shifted differences (dense)."""
    from gfplslam_tpu.ops.pyramid import _shift
    for axis in (0, 1):
        c = jnp.cumsum(x, axis=axis)
        lo = (radius, 0) if axis == 0 else (0, radius)
        hi = (-radius - 1, 0) if axis == 0 else (0, -radius - 1)
        x = _shift(c, -lo[0], -lo[1]) - _shift(c, -hi[0], -hi[1])
    return x


def ic_angle_maps(img: jax.Array, radius: int = PATCH_RADIUS
                  ) -> tuple[jax.Array, jax.Array]:
    """Dense intensity-centroid moment maps (m10, m01) over a square window.

    TPU-native replacement for per-keypoint disc-patch gathers (IC_Angle,
    ORBextractor.cc:77-102): three cumsum-based box filters compute the
    centered first moments for EVERY pixel; per-keypoint work drops to two
    1-element gathers. The square window (vs the reference's disc) changes
    angles slightly — descriptors are self-consistent in-engine, so only
    determinism and stability matter."""
    h, w = img.shape
    xr = jnp.arange(w, dtype=img.dtype)[None, :]
    yr = jnp.arange(h, dtype=img.dtype)[:, None]
    s = _box_filter(img, radius)
    sx = _box_filter(img * xr, radius)
    sy = _box_filter(img * yr, radius)
    return sx - xr * s, sy - yr * s


def ic_angles_dense(img: jax.Array, xy: jax.Array) -> jax.Array:
    """[N,2] keypoints -> [N] angles via the dense moment maps (two gathers
    per keypoint instead of a 31x31 patch gather)."""
    h, w = img.shape
    m10, m01 = ic_angle_maps(img)
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, h - 1)
    return jnp.arctan2(m01[yi, xi], m10[yi, xi])


def brief_descriptor_one(img_blur: jax.Array, xy: jax.Array,
                         angle: jax.Array) -> jax.Array:
    """256-bit steered BRIEF of one keypoint -> [8] uint32.

    Pool offsets are rotated by the keypoint angle and rounded, matching the
    reference's steered sampling (ORBextractor.cc:103-142 GET_VALUE); bits
    compare pool-sample pairs (one gather per pool sample).
    """
    h, w = img_blur.shape
    pool = jnp.asarray(BRIEF_POOL, jnp.float32)         # [P, 2]
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    rx = jnp.round(ca * pool[:, 0] - sa * pool[:, 1])
    ry = jnp.round(sa * pool[:, 0] + ca * pool[:, 1])
    xi = jnp.clip((xy[0] + rx).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((xy[1] + ry).astype(jnp.int32), 0, h - 1)
    vals = img_blur[yi, xi]                             # [P]
    pairs = jnp.asarray(BRIEF_PAIRS)
    bits = (vals[pairs[:, 0]] < vals[pairs[:, 1]]).astype(jnp.uint32)
    words = bits.reshape(DESC_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, :], axis=1, dtype=jnp.uint32)


def brief_descriptors(img_blur: jax.Array, xy: jax.Array,
                      angles: jax.Array) -> jax.Array:
    """[N,2] keypoints + [N] angles -> [N, 8] uint32 descriptors."""
    return jax.vmap(lambda p, a: brief_descriptor_one(img_blur, p, a))(xy, angles)
