"""Render the bench's shared 121-frame textured circuit world to PNGs for the
reference baseline measurement (see README.md here and BASELINE.md)."""
import os
import sys

import numpy as np
import cv2

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from gfplslam_tpu.config import CameraParams          # noqa: E402
from gfplslam_tpu.io import synthetic                  # noqa: E402


def main(out_dir: str, n: int = 121) -> None:
    cam = CameraParams()
    world = synthetic.make_world(n_frames=n, n_points=900, n_lines=90,
                                 seed=11, motion="circuit", cam=cam,
                                 textured=True)
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n):
        il, ir = synthetic.render_frame(world, i, noise=1.0)
        u8 = lambda x: np.clip(np.round(x), 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(out_dir, f"l_{i:06d}.png"), u8(il))
        cv2.imwrite(os.path.join(out_dir, f"r_{i:06d}.png"), u8(ir))
    np.save(os.path.join(out_dir, "gt_poses.npy"), world.poses)
    np.save(os.path.join(out_dir, "timestamps.npy"), world.timestamps)
    print(f"rendered {n} frames -> {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/refimgs")
