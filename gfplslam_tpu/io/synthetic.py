"""Synthetic stereo-sequence generator with exact ground truth.

Fills the role of the reference's synthetic simulators
(src/simulate_line_cut.cpp:14-60, simulate_pl_loss.cpp:9-50 fabricate random
frames with known motion) and — in this offline environment — of the EuRoC/
KITTI datasets for end-to-end trajectory tests and benchmarking: a static
world of 3D corner clusters and 3D segments is rendered into rectified
stereo pairs along a smooth ground-truth trajectory.

Rendering is deliberately simple (painted blobs + 1px bright segments on a
textured background): enough structure for FAST/LSD to fire while keeping
generation fast on host.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from gfplslam_tpu.config import CameraParams


@dataclass
class SyntheticWorld:
    cam: CameraParams
    points: np.ndarray     # [P, 3] world points
    seg_start: np.ndarray  # [L, 3]
    seg_end: np.ndarray    # [L, 3]
    poses: np.ndarray      # [T, 4, 4] cam->world ground truth
    timestamps: np.ndarray  # [T]


def make_world(n_frames: int = 30, n_points: int = 600, n_lines: int = 60,
               seed: int = 0, cam: CameraParams | None = None,
               motion: str = "forward") -> SyntheticWorld:
    """World in a corridor [-6,6]x[-4,4]x[0,40]; camera advances with gentle
    yaw so features flow but remain visible."""
    rng = np.random.default_rng(seed)
    cam = cam or CameraParams(width=376, height=240,
                              fx=217.6, fy=217.6, cx=183.7, cy=126.1,
                              baseline=0.11)
    pts = np.stack([rng.uniform(-6, 6, n_points),
                    rng.uniform(-4, 4, n_points),
                    rng.uniform(1.0, 30.0, n_points)], 1)
    # lines stay near enough that endpoint disparity is measurable — the
    # reference's line_cov_th legitimately rejects lines with sub-3px
    # disparity (stereoFrame.cpp:706-759)
    s = np.stack([rng.uniform(-6, 6, n_lines),
                  rng.uniform(-4, 4, n_lines),
                  rng.uniform(1.5, 10.0, n_lines)], 1)
    d = rng.normal(size=(n_lines, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    e = s + d * rng.uniform(0.8, 3.0, (n_lines, 1))

    poses = []
    ts = []
    for t in range(n_frames):
        if motion == "forward":
            z = 0.04 * t
            yaw = 0.002 * t
            x = 0.01 * np.sin(0.2 * t)
        elif motion == "still":
            z = yaw = x = 0.0
        elif motion == "loop":
            # closed circuit returning exactly to the start pose — the
            # revisit world for loop-closure tests (the analog of the
            # reference's EuRoC/KITTI looping batch runs,
            # batch_script/Run_EuRoC.py): camera keeps facing +z so the
            # same scene is visible at departure and return
            phase = 2.0 * np.pi * t / max(n_frames - 1, 1)
            x = 0.6 * np.sin(phase)
            z = 0.45 * (1.0 - np.cos(phase))
            yaw = 0.04 * np.sin(phase)
        else:  # orbit
            z = 0.03 * t
            yaw = 0.01 * t
            x = 0.05 * np.sin(0.3 * t)
        c, sn = np.cos(yaw), np.sin(yaw)
        r = np.array([[c, 0, sn], [0, 1, 0], [-sn, 0, c]])
        p = np.eye(4)
        p[:3, :3] = r
        p[:3, 3] = [x, 0.0, z]
        poses.append(p)
        ts.append(t / 20.0)
    return SyntheticWorld(cam=cam, points=pts, seg_start=s, seg_end=e,
                          poses=np.stack(poses), timestamps=np.asarray(ts))


def _paint_point(img, u, v, pattern):
    """Paint a unique 5x5 texture patch per landmark so descriptors are
    discriminative (identical blobs make BRIEF matching ambiguous)."""
    h, w = img.shape
    ui, vi = int(round(u)), int(round(v))
    if 3 <= vi < h - 3 and 3 <= ui < w - 3:
        img[vi - 2:vi + 3, ui - 2:ui + 3] = pattern


def _paint_segment(img, u0, v0, u1, v1, val=255.0):
    """Anti-aliased max-blend painting: keeps the gradient orientation
    smooth along the segment so the angle-aligned region grower can chain
    the support pixels."""
    h, w = img.shape
    n = int(max(abs(u1 - u0), abs(v1 - v0)) * 3 + 2)
    for t in np.linspace(0, 1, n):
        u = u0 + t * (u1 - u0)
        v = v0 + t * (v1 - v0)
        ui, vi = int(np.floor(u)), int(np.floor(v))
        fu, fv = u - ui, v - vi
        for dv, wv in ((0, 1 - fv), (1, fv)):
            for du, wu in ((0, 1 - fu), (1, fu)):
                y, x = vi + dv, ui + du
                if 0 <= y < h and 0 <= x < w:
                    img[y, x] = max(img[y, x], val * wv * wu)


def render_frame(world: SyntheticWorld, frame_idx: int, noise: float = 2.0,
                 seed: int = 99) -> tuple[np.ndarray, np.ndarray]:
    """Render (img_l, img_r) float32 [H, W] for ground-truth pose i."""
    cam = world.cam
    h, w = cam.height, cam.width
    rng = np.random.default_rng(seed + frame_idx * 7919)
    t_wc = world.poses[frame_idx]
    r_cw = t_wc[:3, :3].T
    t_cw = -r_cw @ t_wc[:3, 3]

    def to_cam(p, baseline_shift=0.0):
        q = p @ r_cw.T + t_cw
        q[:, 0] -= baseline_shift
        return q

    imgs = []
    for shift in (0.0, cam.baseline):
        img = rng.uniform(20, 60, size=(h, w)).astype(np.float32)
        # smooth the noise so it doesn't trigger FAST
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)
               + np.roll(img, (1, 1), (0, 1))) / 4.0
        pc = to_cam(world.points.copy(), shift)
        vis = np.nonzero(pc[:, 2] > 0.3)[0]
        u = cam.fx * pc[vis, 0] / pc[vis, 2] + cam.cx
        v = cam.fy * pc[vis, 1] / pc[vis, 2] + cam.cy
        for pi, ui, vi in zip(vis, u, v):
            prng = np.random.default_rng(1000 + int(pi))
            pattern = prng.uniform(90, 255, (5, 5)).astype(np.float32)
            pattern[2, 2] = 255.0
            _paint_point(img, ui, vi, pattern)
        sc = to_cam(world.seg_start.copy(), shift)
        ec = to_cam(world.seg_end.copy(), shift)
        ok = (sc[:, 2] > 0.3) & (ec[:, 2] > 0.3)
        us = cam.fx * sc[ok, 0] / sc[ok, 2] + cam.cx
        vs = cam.fy * sc[ok, 1] / sc[ok, 2] + cam.cy
        ue = cam.fx * ec[ok, 0] / ec[ok, 2] + cam.cx
        ve = cam.fy * ec[ok, 1] / ec[ok, 2] + cam.cy
        for a, b, c, dd in zip(us, vs, ue, ve):
            _paint_segment(img, a, b, c, dd)
        if noise > 0:
            img += rng.normal(0, noise, size=(h, w)).astype(np.float32)
        imgs.append(np.clip(img, 0, 255).astype(np.float32))
    return imgs[0], imgs[1]
