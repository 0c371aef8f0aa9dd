"""Host-side visual-odometry driver: the tiny sequential loop around the
jitted per-frame programs.

Role parity with the `plstvo` apps + StereoFrameHandler's frame shifting
(app/plstvo_mod.cpp:249-318, stereoFrameHandler.cpp:83-151, 864-922): feed
rectified stereo pairs, collect per-frame poses, timing, and keyframe
signals. The device does all compute in two programs per frame
(front-end `process_stereo_pair`, tracking `track_step`); the host only
shifts pytrees and logs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from gfplslam_tpu.config import Config
from gfplslam_tpu.models import tracker as trk
from gfplslam_tpu.models.frame import StereoFrame, process_stereo_pair
from gfplslam_tpu.utils.timing import StageTimer, TimeLog, TimeLogWriter


@dataclass
class FrameRecord:
    timestamp: float
    t_cam_w: np.ndarray      # absolute cam->world (world = first KF frame)
    is_kf: bool
    n_pt: int
    n_ln: int
    accepted: bool


@dataclass
class VisualOdometry:
    cfg: Config
    state: Optional[trk.TrackerState] = None
    prev_frame: Optional[StereoFrame] = None
    prev_time: float = 0.0
    t_base_w: np.ndarray = field(default_factory=lambda: np.eye(4))
    records: List[FrameRecord] = field(default_factory=list)
    timelog: TimeLogWriter = field(default_factory=TimeLogWriter)
    frame_idx: int = 0
    lost: bool = False

    def process(self, img_l: np.ndarray, img_r: np.ndarray,
                timestamp: float) -> FrameRecord:
        """One camera frame. Returns this frame's record."""
        cfg = self.cfg
        timer = StageTimer()
        log = TimeLog()
        if self.state is None:
            self.state = trk.initial_state(cfg)
        frame = process_stereo_pair(jnp.asarray(img_l), jnp.asarray(img_r),
                                    cfg, self.state.fast_th)
        frame.points.valid.block_until_ready()
        log.time_pt_extract = timer.lap()
        log.num_pt_stereo = int(jnp.sum(frame.points.valid))
        log.num_ln_stereo = int(jnp.sum(frame.lines.valid))

        if self.prev_frame is None:
            # frame 0: initialize (StVO->initialize, plslam_mod.cpp:375-381)
            self.prev_frame = frame
            self.prev_time = timestamp
            rec = FrameRecord(timestamp, self.t_base_w.copy(), True,
                              log.num_pt_stereo, log.num_ln_stereo, True)
            self.records.append(rec)
            self.timelog.append(log)
            self.frame_idx += 1
            return rec

        delta_t = max(timestamp - self.prev_time, 1e-3)
        out = trk.track_step(cfg, self.state, self.prev_frame, frame,
                             jnp.asarray(delta_t, jnp.float32))
        out.pose.dt.block_until_ready()
        log.time_pose_optim = timer.lap()
        log.num_pt_cross = int(out.n_inliers_pt)
        log.num_ln_cross = int(out.n_inliers_ln)
        log.time_track = log.time_pt_extract + log.time_pose_optim

        self.state = out.state
        need_kf = bool(out.need_kf)
        if need_kf:
            # absolute pose base moves to this KF (updateFrame_ECCV18 +
            # currFrameIsKF composition)
            self.t_base_w = self.t_base_w @ np.asarray(out.state.t_cam_w)
            self.state = trk.mark_keyframe(out.state)
            t_abs = self.t_base_w.copy()
        else:
            t_abs = self.t_base_w @ np.asarray(out.state.t_cam_w)
        self.lost = self.lost or bool(out.track_lost)

        self.prev_frame = frame
        self.prev_time = timestamp
        rec = FrameRecord(timestamp, t_abs, need_kf,
                          int(out.n_inliers_pt), int(out.n_inliers_ln),
                          bool(out.pose.accepted))
        self.records.append(rec)
        self.timelog.append(log)
        self.frame_idx += 1
        return rec

    @property
    def trajectory(self) -> np.ndarray:
        return np.stack([r.t_cam_w for r in self.records])

    @property
    def timestamps(self) -> np.ndarray:
        return np.asarray([r.timestamp for r in self.records])
