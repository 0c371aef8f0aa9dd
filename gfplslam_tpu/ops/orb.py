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


def brief_descriptor_one(img_blur: jax.Array, xy: jax.Array,
                         angle: jax.Array) -> jax.Array:
    """256-bit steered BRIEF of one keypoint -> [8] uint32.

    Pattern points are rotated by the keypoint angle and rounded, matching the
    reference's steered sampling (ORBextractor.cc:103-142 GET_VALUE).
    """
    h, w = img_blur.shape
    pat = jnp.asarray(BRIEF_PATTERN, jnp.float32)       # [256, 4]
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    def rot(px, py):
        rx = jnp.round(ca * px - sa * py)
        ry = jnp.round(sa * px + ca * py)
        return rx, ry
    x1, y1 = rot(pat[:, 0], pat[:, 1])
    x2, y2 = rot(pat[:, 2], pat[:, 3])
    def sample(px, py):
        xi = jnp.clip((xy[0] + px).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip((xy[1] + py).astype(jnp.int32), 0, h - 1)
        return img_blur[yi, xi]
    bits = (sample(x1, y1) < sample(x2, y2)).astype(jnp.uint32)  # [256]
    words = bits.reshape(DESC_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, :], axis=1, dtype=jnp.uint32)


def brief_descriptors(img_blur: jax.Array, xy: jax.Array,
                      angles: jax.Array) -> jax.Array:
    """[N,2] keypoints + [N] angles -> [N, 8] uint32 descriptors."""
    return jax.vmap(lambda p, a: brief_descriptor_one(img_blur, p, a))(xy, angles)
