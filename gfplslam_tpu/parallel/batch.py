"""Multi-sequence batch execution across a device mesh.

The pod-scale analog of the reference's batch scripts (SURVEY.md section 7
item 7: "use the pod for multi-sequence batch eval — 11 EuRoC seqs in
parallel"): a batch of stereo sequences is sharded across the mesh, each
device runs the whole-sequence VO scan for its sequences, results gather
back as stacked trajectories.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gfplslam_tpu.config import Config
from gfplslam_tpu.models.vo import run_vo_scan


def run_vo_batch(cfg: Config, imgs_l, imgs_r, timestamps,
                 mesh: Mesh | None = None):
    """Run VO over a batch of sequences, optionally sharded over ``mesh``.

    Args: imgs_l/imgs_r [S, T, H, W] float32, timestamps [S, T].
    Returns (poses [S, T, 4, 4], aux dict of [S, T-1] diagnostics).
    """
    if mesh is not None:
        sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
        imgs_l = jax.device_put(imgs_l, sharding)
        imgs_r = jax.device_put(imgs_r, sharding)
        timestamps = jax.device_put(timestamps, sharding)

    fn = jax.jit(jax.vmap(
        lambda a, b, c: run_vo_scan(cfg, a, b, c)))
    return fn(imgs_l, imgs_r, timestamps)
