"""Full-capacity, trained-vocab, FILE-BACKED loop-closure e2e.

The evidence tier the dataset batch runs provide in the reference
(batch_script/Run_EuRoC.py:8-49 + config/asl/gt-ass): this test drives the
production operating point end to end —

- full EuRoC capacities (752x480, 1024-pt/512-ln budgets, default Config),
- the SHIPPED 256-word trained vocabulary (vocab_k=256 default — the loop
  e2e at reduced capacity exercises the random-anchor fallback instead),
- the textured raycast renderer (procedural walls, occluding boxes,
  exposure variation — io/synthetic.py textured tier),
- the real FILE path: frames written as PGM, decoded + prefetched by the
  native C++ loader (native/dataloader.cpp), with decode parity asserted
  against the in-memory arrays so both paths provably produce the same
  trajectory.
"""

import os

import numpy as np
import pytest

from gfplslam_tpu.config import Config, SlamParams
from gfplslam_tpu.io import native_loader, synthetic
from gfplslam_tpu.models import loop as loop_ops
from gfplslam_tpu.models.slam import SLAMSystem
from gfplslam_tpu.utils.trajectory import ate_rmse

# 40 frames (~14 KFs at max_kf_num_frames=2): the loop-candidate gate needs
# n_far > lc_kf_max_dist far keyframes, which a 24-frame sequence (~8 KFs at
# lc_kf_dist=6) can never produce — root cause of the round-3 "0 loop
# closures" failure; at 40 frames the trained-vocab textured revisit
# verifies and closes (reproduced at reduced scale before committing).
N_FRAMES = 40

pytestmark = pytest.mark.slow  # >1 h of XLA compiles on the CPU fixture;
# the same code paths run at reduced shapes in the default tier
# (tests/test_slam_loop_e2e.py::test_file_backed_loop_reduced)


def _write_pgm(path: str, img: np.ndarray) -> None:
    """8-bit binary PGM (P5) — the native loader's simplest decode path."""
    arr = np.clip(np.round(img), 0, 255).astype(np.uint8)
    h, w = arr.shape
    with open(path, "wb") as f:
        f.write(f"P5\n{w} {h}\n255\n".encode())
        f.write(arr.tobytes())


@pytest.fixture(scope="module")
def cfg():
    # full default capacities/camera => the shipped trained vocabulary is
    # the active one (loop.active_vocab(256))
    return Config(slam=SlamParams(max_kf_num_frames=2, lc_kf_dist=6,
                                  lc_kf_max_dist=3, lc_nkf_closest=2))


def test_full_capacity_file_backed_loop(cfg, tmp_path_factory):
    if not native_loader.native_available():
        pytest.skip("native dataloader not built")
    # the shipped vocabulary must be the active one at this capacity
    vocab_p, _ = loop_ops.active_vocab(cfg.cap.vocab_k)
    assert loop_ops.VOCAB_SOURCE.endswith("vocab_synth.npz"), \
        loop_ops.VOCAB_SOURCE

    world = synthetic.make_world(n_frames=N_FRAMES, n_points=900, n_lines=90,
                                 seed=21, motion="loop", cam=cfg.camera,
                                 textured=True)
    root = tmp_path_factory.mktemp("seq")
    paths_l, paths_r, rendered = [], [], []
    for i in range(N_FRAMES):
        il, ir = synthetic.render_frame(world, i, noise=1.0)
        pl = os.path.join(root, f"l_{i:04d}.pgm")
        pr = os.path.join(root, f"r_{i:04d}.pgm")
        _write_pgm(pl, il)
        _write_pgm(pr, ir)
        paths_l.append(pl)
        paths_r.append(pr)
        rendered.append((np.round(np.clip(il, 0, 255)),
                         np.round(np.clip(ir, 0, 255))))

    # --- native decode parity: the file path reproduces the in-memory
    # images exactly (same ATE as the in-memory path follows) ---
    loader = native_loader.StereoLoader(paths_l, paths_r,
                                        cfg.camera.width, cfg.camera.height,
                                        n_threads=2, queue_depth=4)
    frames = [None] * N_FRAMES
    for k, il, ir in loader:
        frames[k] = (il, ir)
    for k in range(N_FRAMES):
        np.testing.assert_array_equal(frames[k][0], rendered[k][0])
        np.testing.assert_array_equal(frames[k][1], rendered[k][1])

    # --- full-capacity SLAM over the file-decoded frames ---
    slam = SLAMSystem(cfg)
    for i in range(N_FRAMES):
        il, ir = frames[i]
        slam.process(il, ir, world.timestamps[i])
    slam.finish()
    assert not slam.vo.lost
    assert len(slam.keyframe_trajectory) >= 8
    ate = ate_rmse(slam.all_frame_trajectory, world.poses)
    assert ate < 0.10, ate
    # the trained vocabulary + textured revisit must produce a loop event
    # (candidate scoring ran on every KF; closure on the revisit)
    assert slam.n_loop_closures >= 1
