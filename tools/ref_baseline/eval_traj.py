"""ATE of a ref_vo_bench trajectory against the rendered world's GT."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from gfplslam_tpu.utils.trajectory import ate_rmse     # noqa: E402


def main(traj_path: str, gt_path: str) -> None:
    gt = np.load(gt_path)
    rows = np.loadtxt(traj_path)
    est = [np.eye(4)]
    for r in rows:
        m = np.eye(4)
        m[:3, :4] = r[1:].reshape(3, 4)
        est.append(m)
    est = np.stack(est)
    print("frames:", est.shape[0])
    print("ATE RMSE (m):", round(float(ate_rmse(est, gt[:est.shape[0]])), 4))
    print("end error (m):", round(float(np.linalg.norm(
        est[-1][:3, 3] - gt[est.shape[0] - 1][:3, 3])), 4))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
