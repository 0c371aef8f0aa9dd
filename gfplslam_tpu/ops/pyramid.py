"""Image pyramid + separable filtering primitives, pure XLA.

Replaces the reference's per-level ``ComputePyramid`` + cv::resize/GaussianBlur
(ORBextractor.cc:1107-1133, binary_descriptor_custom.cpp:350-413). Levels use
the reference operating point: ``orb_nlevels=4``, scale 1.2 (config.cpp:135-137).
All levels are computed in one jitted call; each level has a static shape.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(h: int, w: int, nlevels: int, scale: float) -> List[Tuple[int, int]]:
    """Static per-level (h, w); level i is scaled by scale^-i."""
    return [(int(round(h / scale ** i)), int(round(w / scale ** i)))
            for i in range(nlevels)]


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize [H, W] -> [out_h, out_w] (align-corners=False)."""
    h, w = img.shape
    ys = (jnp.arange(out_h, dtype=img.dtype) + 0.5) * (h / out_h) - 0.5
    xs = (jnp.arange(out_w, dtype=img.dtype) + 0.5) * (w / out_w) - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    top = img[y0i][:, x0i] * (1 - fx)[None, :] + img[y0i][:, x1i] * fx[None, :]
    bot = img[y1i][:, x0i] * (1 - fx)[None, :] + img[y1i][:, x1i] * fx[None, :]
    return top * (1 - fy)[:, None] + bot * fy[:, None]


def build_pyramid(img: jax.Array, nlevels: int, scale: float) -> List[jax.Array]:
    """[H, W] float32 -> list of per-level images (level 0 = input)."""
    h, w = img.shape
    shapes = level_shapes(h, w, nlevels, scale)
    levels = [img]
    for (lh, lw) in shapes[1:]:
        levels.append(resize_bilinear(levels[-1], lh, lw))
    return levels


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("sigma", "radius"))
def gaussian_blur(img: jax.Array, sigma: float = 2.0, radius: int = 3) -> jax.Array:
    """Separable Gaussian blur (the 7x7 sigma-2 blur before BRIEF sampling,
    ORBextractor.cc:1043-1048)."""
    k = jnp.asarray(gaussian_kernel1d(sigma, radius))
    pad = radius
    x = jnp.pad(img, ((pad, pad), (pad, pad)), mode="edge")
    # horizontal then vertical, via conv on [1,1,H,W]
    x4 = x[None, None, :, :]
    kh = k[None, None, None, :]
    kv = k[None, None, :, None]
    y = jax.lax.conv_general_dilated(x4, kh, (1, 1), "VALID")
    y = jax.lax.conv_general_dilated(y, kv, (1, 1), "VALID")
    return y[0, 0]


def sobel(img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """3x3 Sobel dx, dy (gradient input for LSD/LBD; replaces cv::Sobel in
    binary_descriptor_custom.cpp:395-413). Border replicated."""
    x = jnp.pad(img, ((1, 1), (1, 1)), mode="edge")
    kx = jnp.asarray([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
    ky = kx.T
    x4 = x[None, None]
    gx = jax.lax.conv_general_dilated(x4, kx[None, None], (1, 1), "VALID")[0, 0]
    gy = jax.lax.conv_general_dilated(x4, ky[None, None], (1, 1), "VALID")[0, 0]
    return gx, gy
