"""Line-segment detection as a fixed-iteration batched XLA program.

Replaces the reference's LSD wrapper (3rdparty LSDDetector_custom.cpp:218-281
around cv::LineSegmentDetector, options descriptor_custom.hpp:906-917). LSD's
sequential region-growing does not map to TPU, so detection is re-designed:

1. Gaussian smooth + Sobel -> gradient magnitude and level-line angle.
2. Support mask: magnitude above the LSD gradient threshold
   ``quant / sin(ang_th)`` (the same rho as LSD derives from its options).
3. Connected components of orientation-aligned support pixels via
   label propagation with pointer jumping (O(log diameter) rounds, all
   masked min-gathers — no data-dependent loops).
4. Per-component moment accumulation (scatter-add) -> PCA line fit;
   exact endpoints from a second scatter (min/max projection on the
   principal axis).
5. Gates mirroring the reference filters: relative minimum length
   (min_line_length * image diagonal, config.cpp:108), width/density
   (density_th), then top-K by length (keep top ``lsd_nfeatures`` by
   response, stereoFrame.cpp:1155-1227).

Output is a fixed-capacity padded segment set.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gfplslam_tpu.ops.pyramid import gaussian_blur, sobel


class LineSegments(NamedTuple):
    sp: jax.Array      # [N, 2] float32 start point (x, y)
    ep: jax.Array      # [N, 2] float32 end point (x, y)
    angle: jax.Array   # [N] float32 orientation in (-pi/2, pi/2]
    length: jax.Array  # [N] float32
    score: jax.Array   # [N] float32 response (avg gradient magnitude)
    valid: jax.Array   # [N] bool


def _angle_diff_mod_2pi(a: jax.Array, b: jax.Array) -> jax.Array:
    """Smallest circular difference between level-line angles (mod 2pi).

    LSD compares level-line angles on the full circle, so the two edges of a
    bright ridge (opposite gradient signs) grow into separate regions."""
    d = jnp.abs(a - b) % (2 * jnp.pi)
    return jnp.minimum(d, 2 * jnp.pi - d)


def _propagate_labels(labels: jax.Array, support: jax.Array,
                      angle: jax.Array, ang_tol: float, rounds: int) -> jax.Array:
    """Min-label connected components over 8-neighborhoods of aligned support
    pixels, with pointer jumping for O(log) convergence.

    The 8 neighbor-alignment masks depend only on the (fixed) angle field,
    so they are computed once outside the round loop; each round is then 8
    masked-roll mins + 2 pointer-jump gathers."""
    h, w = labels.shape
    big = jnp.int32(h * w + 1)
    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
               if (dy, dx) != (0, 0)]

    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    aligned = []
    for dy, dx in offsets:
        na = jnp.roll(angle, (dy, dx), (0, 1))
        ns = jnp.roll(support, (dy, dx), (0, 1))
        inb = ((yy - dy >= 0) & (yy - dy < h) &
               (xx - dx >= 0) & (xx - dx < w))
        aligned.append(ns & inb & (_angle_diff_mod_2pi(angle, na) < ang_tol))

    def body(_, lab):
        best = lab
        for (dy, dx), ok in zip(offsets, aligned):
            nl = jnp.roll(lab, (dy, dx), (0, 1))
            best = jnp.minimum(best, jnp.where(ok, nl, big))
        lab = jnp.where(support, best, big)
        # pointer jumping: follow the label's label twice
        flat = lab.reshape(-1)
        safe = jnp.clip(flat, 0, h * w - 1)
        flat = jnp.minimum(flat, jnp.where(flat < big, flat[safe], big))
        safe = jnp.clip(flat, 0, h * w - 1)
        flat = jnp.minimum(flat, jnp.where(flat < big, flat[safe], big))
        return flat.reshape(h, w)

    return jax.lax.fori_loop(0, rounds, body, labels)


@partial(jax.jit, static_argnames=("n_out", "rounds", "ang_th_deg", "quant",
                                   "min_rel_length", "max_width"))
def detect_lines(img: jax.Array, n_out: int = 512, rounds: int = 8,
                 ang_th_deg: float = 22.5, quant: float = 2.0,
                 min_rel_length: float = 0.025,
                 max_width: float = 3.0) -> LineSegments:
    """[H, W] float32 image -> padded LineSegments (level-0 coordinates)."""
    h, w = img.shape
    sm = gaussian_blur(img, sigma=0.8, radius=2)
    gx, gy = sobel(sm)
    # Sobel has gain 8 vs the 2x2 LSD gradient; normalize magnitude so the
    # LSD threshold rho = quant/sin(ang_th) applies on the same scale.
    gx = gx / 8.0
    gy = gy / 8.0
    mag = jnp.sqrt(gx * gx + gy * gy)
    # level-line angle = gradient angle + pi/2, orientation mod pi
    ang = jnp.arctan2(gy, gx) + jnp.pi / 2
    ang_tol = float(np.deg2rad(ang_th_deg))
    rho = quant / np.sin(ang_tol)
    support = mag > rho
    # exclude 1px border (roll wrap)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    support &= (yy > 0) & (yy < h - 1) & (xx > 0) & (xx < w - 1)

    ids = (yy * w + xx).astype(jnp.int32)
    big = jnp.int32(h * w + 1)
    labels = jnp.where(support, ids, big)
    labels = _propagate_labels(labels, support, ang, ang_tol, rounds)

    # --- per-component moments via scatter-add into [h*w] bins ---
    flat_lab = jnp.clip(labels.reshape(-1), 0, h * w - 1)
    in_comp = (labels < big).reshape(-1)
    flat_ids = ids.reshape(-1)
    fx = (flat_ids % w).astype(jnp.float32)
    fy = (flat_ids // w).astype(jnp.float32)
    fm = jnp.where(in_comp, mag.reshape(-1), 0.0)
    one = in_comp.astype(jnp.float32)

    # one fused scatter-add with a 7-vector payload (7 separate scatters
    # paid the index cost 7 times)
    payload = jnp.stack([one, fx, fy, fx * fx, fx * fy, fy * fy, fm], axis=1)
    payload = jnp.where(in_comp[:, None], payload, 0.0)
    moments = jnp.zeros((h * w, 7), jnp.float32).at[flat_lab].add(payload)
    cnt, sx, sy, sxx, sxy, syy, smag = [moments[:, i] for i in range(7)]

    # top-K components by pixel count
    k = n_out
    top_cnt, top_lab = jax.lax.top_k(cnt, k)

    cxm = sx[top_lab] / jnp.maximum(top_cnt, 1.0)
    cym = sy[top_lab] / jnp.maximum(top_cnt, 1.0)
    vxx = sxx[top_lab] / jnp.maximum(top_cnt, 1.0) - cxm * cxm
    vxy = sxy[top_lab] / jnp.maximum(top_cnt, 1.0) - cxm * cym
    vyy = syy[top_lab] / jnp.maximum(top_cnt, 1.0) - cym * cym
    # principal axis of the 2x2 covariance
    tr = vxx + vyy
    det = vxx * vyy - vxy * vxy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
    lam1 = tr / 2 + disc
    lam2 = jnp.maximum(tr / 2 - disc, 0.0)
    # eigvec for lam1
    dirx = jnp.where(jnp.abs(vxy) > 1e-9, lam1 - vyy, 1.0)
    diry = jnp.where(jnp.abs(vxy) > 1e-9, vxy, 0.0)
    nrm = jnp.sqrt(dirx * dirx + diry * diry)
    dirx = dirx / jnp.maximum(nrm, 1e-9)
    diry = diry / jnp.maximum(nrm, 1e-9)

    # --- endpoints from second moments: centroid +- dir * L/2 with
    # L = sqrt(12 lambda_1) (exact for a uniform segment; avoids a second
    # scatter pass over the image, which measured ~15 ms/frame on TPU) ---
    half_len = jnp.sqrt(12.0 * jnp.maximum(lam1, 0.0)) * 0.5
    tmin = -half_len
    tmax = half_len

    spx = cxm + tmin * dirx
    spy = cym + tmin * diry
    epx = cxm + tmax * dirx
    epy = cym + tmax * diry
    length = tmax - tmin
    width = jnp.sqrt(12.0 * lam2)
    # density: support pixels per unit length (a 1px-wide perfect segment
    # has cnt ~= length); LSD's density_th analog
    density = top_cnt / jnp.maximum(length, 1.0)

    diag = float(np.hypot(h, w))
    ok = (top_cnt >= 8)
    ok &= length >= min_rel_length * diag
    ok &= width <= max_width
    ok &= density >= 0.6
    ok &= jnp.isfinite(length)

    score = smag[top_lab] / jnp.maximum(top_cnt, 1.0)
    # order by length (response), invalid last
    order = jnp.argsort(jnp.where(ok, -length, jnp.inf))
    def g(a):
        return a[order]
    # canonical endpoint order: sp.x <= ep.x (ties: smaller y first)
    swap = (epx < spx) | ((epx == spx) & (epy < spy))
    spx2 = jnp.where(swap, epx, spx)
    spy2 = jnp.where(swap, epy, spy)
    epx2 = jnp.where(swap, spx, epx)
    epy2 = jnp.where(swap, spy, epy)
    angle = jnp.arctan2(epy2 - spy2, epx2 - spx2)

    return LineSegments(
        sp=jnp.stack([g(spx2), g(spy2)], -1),
        ep=jnp.stack([g(epx2), g(epy2)], -1),
        angle=g(angle), length=g(length), score=g(score), valid=g(ok))
