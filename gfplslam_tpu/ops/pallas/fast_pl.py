"""Pallas TPU kernel: FAST-9 corner score map in one fused VMEM pass.

The XLA formulation (`ops/fast.py:fast_score_map`) builds 16 rolled image
copies and min/max-doubles over a [16, H, W] margin stack; the rolls are
data-movement ops XLA cannot fuse through, so the program materializes
~200 H*W planes in HBM and runs at ~2x the image's own bandwidth cost
(PROFILE_VO.md round-5 sub-stage table: 3.05 ms/frame for 8 level-images).
Here the same arithmetic — identical circle taps, identical bf16 margin
math, identical shift-min doubling order — runs tile-resident: each grid
step holds a row strip plus its 3-row halo in VMEM, the 16 circle shifts
become static sublane slices + lane rolls of that strip, and every
intermediate plane lives and dies in VMEM. HBM traffic drops to one read
of the image (x3 for the halo overlap) plus one write of the score map.

Halo pattern: three BlockSpecs view the SAME image at block rows i-1, i,
i+1 (clamped at the ends); the kernel concatenates [prev[-3:], cur,
next[:3]]. Scores within 3 px of the clamped array edges differ from the
roll-wrap of the XLA path, but both paths zero that border (the segment
test needs the full Bresenham circle), so the two score maps are equal on
every pixel that can ever become a keypoint.

Reference behavior covered: ORBextractor.cc:809-941 (FAST with threshold
fallback) — same parity contract as ops/fast.py, which remains the CPU /
interpret-mode path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gfplslam_tpu.ops.fast import ARC_LEN, FAST_CIRCLE

TILE_H = 32  # row-strip height; peak VMEM ~80 live [TILE_H+6, W] bf16 planes


def _fast_score_kernel(t_ref, prev_ref, cur_ref, next_ref, out_ref):
    t = t_ref[0].astype(jnp.bfloat16)
    tile_h = cur_ref.shape[0]
    strip = jnp.concatenate(
        [prev_ref[tile_h - 3:], cur_ref[:], next_ref[:3]], axis=0)
    center = strip[3:3 + tile_h]
    neg = jnp.asarray(-jnp.inf, jnp.bfloat16)

    # d[k] = I(p + c_k) - I(p): static sublane slice (dy) + lane roll (dx)
    d = []
    for dx, dy in FAST_CIRCLE:
        sh = strip[3 + int(dy):3 + int(dy) + tile_h]
        if int(dx) != 0:
            sh = jnp.roll(sh, -int(dx), axis=1)
        d.append(sh - center)

    def arc_score(x):
        # windowed min over 9 consecutive circle entries (circular), as
        # shift-min doubling on a python list of planes — the same
        # reduction tree as ops/fast.py's stacked form, so results match
        # bf16-bit-exactly on the interior
        xx = x + x[:ARC_LEN - 1]
        m = xx
        for s in (1, 2, 4):
            m = [jnp.minimum(m[k], m[k + s]) for k in range(len(m) - s)]
        wmin = [jnp.minimum(m[k], xx[k + ARC_LEN - 1]) for k in range(16)]
        out = wmin[0]
        for k in range(1, 16):
            out = jnp.maximum(out, wmin[k])
        return out

    # comparisons run in f32: Mosaic on v5e rejects bf16 vector cmpf, and
    # bf16->f32 is exact so the masks equal the XLA path's bf16 compares
    t32 = t.astype(jnp.float32)
    d32 = [dk.astype(jnp.float32) for dk in d]
    db = [jnp.where(d32[k] > t32, d[k] - t, neg) for k in range(16)]
    score_b = arc_score(db)
    dd = [jnp.where(d32[k] < -t32, -d[k] - t, neg) for k in range(16)]
    score_d = arc_score(dd)
    score = jnp.maximum(score_b, score_d).astype(jnp.float32)
    score = jnp.where(jnp.isfinite(score), score, 0.0)
    out_ref[:] = jnp.maximum(score, 0.0)


@partial(jax.jit, static_argnames=("interpret",))
def fast_score_map_pallas(img: jax.Array, threshold: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """Per-pixel FAST-9 corner score, [H, W] float32 — drop-in for
    `ops/fast.py:fast_score_map` on TPU backends. ``threshold`` may be a
    traced scalar (the adaptive-FAST loop retunes it without recompiling)."""
    h, w = img.shape
    hp = -(-h // TILE_H) * TILE_H
    wp = -(-w // 128) * 128
    img16 = jnp.pad(img.astype(jnp.bfloat16), ((0, hp - h), (0, wp - w)))
    t = jnp.asarray(threshold, jnp.float32).reshape(1)
    nblk = hp // TILE_H

    score = pl.pallas_call(
        _fast_score_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_H, wp), lambda i: (jnp.maximum(i - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, wp),
                         lambda i: (jnp.minimum(i + 1, nblk - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_H, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=interpret,
    )(t, img16, img16, img16)

    score = score[:h, :w]
    # kill the 3px border (halo clamping / lane-roll wrap land only here;
    # identical contract to the XLA path's roll-wrap border zeroing)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    valid = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return jnp.where(valid, score, 0.0)
