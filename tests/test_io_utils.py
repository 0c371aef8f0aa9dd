"""IO + utility subsystems: checkpointing, trajectories, native loader,
dataset parsing, viz, vocab training."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from gfplslam_tpu.utils import checkpoint, trajectory


def test_checkpoint_roundtrip(tmp_path):
    from gfplslam_tpu.config import CapacityParams, Config
    from gfplslam_tpu.models import map as map_ops
    from gfplslam_tpu.models import loop as loop_ops
    cfg = Config(cap=CapacityParams(n_kf_max=8, n_map_pt=64, n_map_ln=32,
                                    n_obs_pt=32, n_obs_ln=16, vocab_k=32))
    m = map_ops.empty_map(cfg)
    m = m._replace(n_kf=jnp.asarray(3, jnp.int32),
                   pt_pos=m.pt_pos.at[0].set(jnp.asarray([1.0, 2.0, 3.0])))
    ls = loop_ops.empty_loop_state(cfg)
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save_state(p, map=m, loop=ls)
    out = checkpoint.load_state(p, map=map_ops.empty_map(cfg),
                                loop=loop_ops.empty_loop_state(cfg))
    assert int(out["map"].n_kf) == 3
    np.testing.assert_allclose(np.asarray(out["map"].pt_pos[0]), [1, 2, 3])
    assert out["loop"].bow_p.shape == ls.bow_p.shape


def test_tum_roundtrip(tmp_path, rng):
    from gfplslam_tpu.utils.se3 import expmap_se3
    poses = [np.asarray(expmap_se3(jnp.asarray(
        rng.normal(size=6).astype(np.float32) * 0.3))) for _ in range(5)]
    ts = np.arange(5) * 0.1
    p = str(tmp_path / "traj.txt")
    trajectory.write_tum(p, ts, poses)
    ts2, poses2 = trajectory.read_tum(p)
    np.testing.assert_allclose(ts2, ts, atol=1e-6)
    for a, b in zip(poses, poses2):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_ate_alignment_invariance(rng):
    from gfplslam_tpu.utils.se3 import expmap_se3
    gt = np.stack([np.asarray(expmap_se3(jnp.asarray(
        rng.normal(size=6).astype(np.float32)))) for _ in range(10)])
    # estimate = rigidly transformed ground truth -> ATE must be ~0
    t = np.asarray(expmap_se3(jnp.asarray(
        np.array([1.0, 2, 3, 0.3, 0.2, 0.1], np.float32))))
    est = np.einsum("ij,njk->nik", t, gt)
    assert trajectory.ate_rmse(est, gt) < 1e-5


def test_native_loader_decode(tmp_path):
    from gfplslam_tpu.io import native_loader
    if not native_loader.native_available():
        pytest.skip("native loader not built")
    cv2 = pytest.importorskip("cv2")
    img = (np.arange(48 * 64).reshape(48, 64) % 251).astype(np.uint8)
    p = str(tmp_path / "img.png")
    cv2.imwrite(p, img)
    out = native_loader.decode_image(p)
    np.testing.assert_allclose(out, img.astype(np.float32), atol=0.5)


def test_native_stereo_loader(tmp_path):
    from gfplslam_tpu.io import native_loader
    if not native_loader.native_available():
        pytest.skip("native loader not built")
    cv2 = pytest.importorskip("cv2")
    paths_l, paths_r = [], []
    for i in range(5):
        il = np.full((32, 40), i * 10, np.uint8)
        ir = np.full((32, 40), i * 10 + 5, np.uint8)
        pl = str(tmp_path / f"l{i}.png")
        pr = str(tmp_path / f"r{i}.png")
        cv2.imwrite(pl, il)
        cv2.imwrite(pr, ir)
        paths_l.append(pl)
        paths_r.append(pr)
    loader = native_loader.StereoLoader(paths_l, paths_r, 40, 32,
                                        n_threads=2, queue_depth=2)
    got = list(loader)
    assert [g[0] for g in got] == [0, 1, 2, 3, 4]
    for i, il, ir in got:
        assert abs(float(il[0, 0]) - i * 10) < 0.5
        assert abs(float(ir[0, 0]) - (i * 10 + 5)) < 0.5
    loader.close()


def test_viz_writes_pngs(tmp_path, rng):
    from gfplslam_tpu.utils import viz
    poses = np.tile(np.eye(4), (6, 1, 1))
    poses[:, 0, 3] = np.arange(6) * 0.1
    viz.plot_trajectory(str(tmp_path / "t.png"), poses, poses)
    viz.plot_map(str(tmp_path / "m.png"),
                 rng.normal(size=(20, 3)), np.ones(20, bool),
                 rng.normal(size=(5, 3)), rng.normal(size=(5, 3)),
                 np.ones(5, bool), poses)
    assert (tmp_path / "t.png").stat().st_size > 1000
    assert (tmp_path / "m.png").stat().st_size > 1000


def test_vocab_kmajority(rng):
    from gfplslam_tpu.apps.train_vocab import kmajority, pack_bits, unpack_bits
    desc = rng.integers(0, 2 ** 32, size=(100, 8), dtype=np.uint32)
    np.testing.assert_array_equal(pack_bits(unpack_bits(desc)), desc)
    vocab = kmajority(desc, k=8, iters=3)
    assert vocab.shape == (8, 8) and vocab.dtype == np.uint32


def test_timestamp_pairing():
    from gfplslam_tpu.io.datasets import _pair_by_timestamp
    ts_l = np.array([0.0, 0.05, 0.10, 0.151])
    ts_r = np.array([0.001, 0.049, 0.2])
    pairs = _pair_by_timestamp(ts_l, ts_r)
    assert (0, 0) in pairs and (1, 1) in pairs
    assert all(j != 2 or i == 3 for i, j in pairs) is not None
    assert (2, 2) not in pairs  # 0.10 vs 0.2 beyond 3 ms


def test_gazebo_loader(tmp_path):
    """Gazebo layout (batch_script/Run_Gazebo.py + gazebo_params.yaml):
    cam0/data + cam1/data, ideal-pinhole 640x480 rig, baseline 0.1 m."""
    from gfplslam_tpu.io.datasets import load_gazebo
    for cam in ("cam0", "cam1"):
        d = tmp_path / cam / "data"
        d.mkdir(parents=True)
        for i in range(3):
            (d / f"{int(1e9 * 0.05 * i):019d}.png").write_bytes(b"x")
    seq = load_gazebo(str(tmp_path))
    assert len(seq.paths_l) == 3 and len(seq.paths_r) == 3
    assert seq.cam.width == 640 and seq.cam.height == 480
    assert abs(seq.cam.fx - 554.25626) < 1e-5
    assert abs(seq.cam.baseline - 0.1) < 1e-9
    assert abs(seq.timestamps[1] - 0.05) < 1e-6
