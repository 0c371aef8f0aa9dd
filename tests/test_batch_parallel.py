"""Multi-sequence batch VO sharded across the virtual device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfplslam_tpu.config import CameraParams, CapacityParams, Config, OrbParams
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.parallel import dist_ba
from gfplslam_tpu.parallel.batch import run_vo_batch
from gfplslam_tpu.utils.trajectory import ate_rmse


def test_batch_vo_sharded_over_mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    cfg = Config(
        cap=CapacityParams(n_pt=128, n_ln=64), orb=OrbParams(nlevels=1),
        camera=CameraParams(width=188, height=120, fx=108.8, fy=108.8,
                            cx=91.8, cy=63.0, baseline=0.11))
    n_seq, n_frames = 4, 4
    worlds = [synthetic.make_world(n_frames=n_frames, seed=40 + s,
                                   cam=cfg.camera, n_points=150, n_lines=20)
              for s in range(n_seq)]
    il, ir, ts = [], [], []
    for w in worlds:
        fr = [synthetic.render_frame(w, i) for i in range(n_frames)]
        il.append(np.stack([f[0] for f in fr]))
        ir.append(np.stack([f[1] for f in fr]))
        ts.append(w.timestamps.astype(np.float32))
    mesh = dist_ba.make_mesh(4, axis="seq")
    poses, aux = run_vo_batch(cfg, jnp.asarray(np.stack(il)),
                              jnp.asarray(np.stack(ir)),
                              jnp.asarray(np.stack(ts)), mesh=mesh)
    assert poses.shape == (n_seq, n_frames, 4, 4)
    p = np.asarray(poses)
    assert np.all(np.isfinite(p))
    # each sequence's trajectory tracks its own ground truth
    for s in range(n_seq):
        rmse = ate_rmse(p[s], worlds[s].poses)
        assert rmse < 0.2, (s, rmse)
