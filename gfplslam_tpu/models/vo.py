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
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gfplslam_tpu.config import Config
from gfplslam_tpu.models import tracker as trk
from gfplslam_tpu.models.frame import StereoFrame, process_stereo_pair
from gfplslam_tpu.utils.timing import StageTimer, TimeLog, TimeLogWriter


@partial(jax.jit, static_argnames=("cfg",))
def run_vo_scan(cfg: Config, imgs_l, imgs_r, timestamps):
    """Whole-sequence visual odometry as ONE device program.

    ``lax.scan`` over frames: per step the front-end + tracker run on-device
    with zero host round-trips; the trajectory comes back as a single array.
    This is the throughput path (the host-driven ``VisualOdometry`` below
    exists for interactive/driver use and SLAM-back-end interleaving).

    Args: imgs_l/imgs_r [T, H, W] float32 (rectified), timestamps [T].
    Returns (poses [T, 4, 4] absolute cam->world, aux dict of per-frame
    diagnostics).
    """
    import jax
    import jax.numpy as jnp
    from gfplslam_tpu.models.frame import process_stereo_pair
    from gfplslam_tpu.models.tracker import (initial_state, mark_keyframe,
                                             track_step)

    def step(carry, inputs):
        st, prev_frame, prev_ts, t_abs = carry
        img_l, img_r, ts = inputs
        frame = process_stereo_pair(img_l, img_r, cfg, st.fast_th)
        out = track_step(cfg, st, prev_frame, frame,
                         jnp.maximum(ts - prev_ts, 1e-3))
        t_abs_new = t_abs @ out.state.dt_store
        # KF bookkeeping reset (currFrameIsKF) without touching t_abs
        st_kf = mark_keyframe(out.state)
        st_next = jax.tree.map(
            lambda a, b: jnp.where(out.need_kf, a, b), st_kf, out.state)
        aux = dict(accepted=out.pose.accepted, n_pt=out.n_inliers_pt,
                   n_ln=out.n_inliers_ln, is_kf=out.need_kf,
                   err=out.pose.err)
        return (st_next, frame, ts, t_abs_new), (t_abs_new, aux)

    st0 = initial_state(cfg)
    frame0 = process_stereo_pair(imgs_l[0], imgs_r[0], cfg, st0.fast_th)
    carry0 = (st0, frame0, timestamps[0], jnp.eye(4))
    _, (poses, aux) = jax.lax.scan(
        step, carry0, (imgs_l[1:], imgs_r[1:], timestamps[1:]))
    poses = jnp.concatenate([jnp.eye(4)[None], poses])
    return poses, aux


@dataclass
class FrameRecord:
    timestamp: float
    t_cam_w: np.ndarray      # absolute cam->world (world = first KF frame)
    is_kf: bool
    n_pt: int
    n_ln: int
    accepted: bool
    # pose relative to the base keyframe, and which KF that is — these let
    # the SLAM layer re-express every frame on the *optimized* map KF poses
    # (the reference writes trajectories from T_base_kf * DT, see
    # plslam_mod.cpp:471-493 + mapHandler KF poses)
    base_kf: int = 0
    t_rel_base: np.ndarray = None


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
    kf_count: int = 0
    # VO-only relative motion KF_{k-1} -> KF_k captured at the latest KF
    # decision (the reference's T_rel handed to MapHandler::addKeyFrame,
    # mapHandler.cpp:126-128 — pure odometry, independent of any map
    # correction)
    last_kf_rel: Optional[np.ndarray] = None

    def rebase(self, t_base_w: np.ndarray) -> None:
        """Re-base the tracker's absolute frame onto a corrected base-KF pose
        (the back-end feeds BA/PGO corrections forward so subsequent frames
        ride the optimized map, mirroring the reference's use of the map KF
        pose as T_base in updateFrame_ECCV18, plslam_mod.cpp:471-477)."""
        self.t_base_w = np.asarray(t_base_w, np.float64).copy()

    def _frontend(self, img_l, img_r, log: TimeLog,
                  timer: StageTimer) -> StereoFrame:
        """Front-end hook: one fused device program (production path).
        TimedVO overrides with staged programs for full TimeLog rows."""
        frame = process_stereo_pair(jnp.asarray(img_l), jnp.asarray(img_r),
                                    self.cfg, self.state.fast_th)
        frame.points.valid.block_until_ready()
        log.time_pt_extract = timer.lap()
        return frame

    def _track(self, frame: StereoFrame, delta_t: float, log: TimeLog,
               timer: StageTimer):
        """Tracking hook: fused track_step (production path)."""
        out = trk.track_step(self.cfg, self.state, self.prev_frame, frame,
                             jnp.asarray(delta_t, jnp.float32))
        out.pose.dt.block_until_ready()
        log.time_pose_optim = timer.lap()
        return out

    def process(self, img_l: np.ndarray, img_r: np.ndarray,
                timestamp: float) -> FrameRecord:
        """One camera frame. Returns this frame's record."""
        timer = StageTimer()
        log = TimeLog()
        if self.state is None:
            self.state = trk.initial_state(self.cfg)
        frame = self._frontend(img_l, img_r, log, timer)
        log.num_pt_stereo = int(jnp.sum(frame.points.valid))
        log.num_ln_stereo = int(jnp.sum(frame.lines.valid))

        if self.prev_frame is None:
            # frame 0: initialize (StVO->initialize, plslam_mod.cpp:375-381)
            self.prev_frame = frame
            self.prev_time = timestamp
            self.kf_count = 1
            self.last_kf_rel = np.eye(4)
            rec = FrameRecord(timestamp, self.t_base_w.copy(), True,
                              log.num_pt_stereo, log.num_ln_stereo, True,
                              base_kf=0, t_rel_base=np.eye(4))
            self.records.append(rec)
            self.timelog.append(log)
            self.frame_idx += 1
            return rec

        delta_t = max(timestamp - self.prev_time, 1e-3)
        out = self._track(frame, delta_t, log, timer)
        log.num_pt_cross = int(out.n_inliers_pt)
        log.num_ln_cross = int(out.n_inliers_ln)
        log.time_track = sum(getattr(log, f) for f in (
            "time_pt_extract", "time_ln_detect", "time_ln_descri",
            "time_pt_stereo", "time_ln_stereo", "time_pt_cross",
            "time_ln_cross", "time_ln_cut", "time_pose_optim"))

        self.state = out.state
        need_kf = bool(out.need_kf)
        t_rel = np.asarray(out.state.t_cam_w)
        if need_kf:
            # absolute pose base moves to this KF (updateFrame_ECCV18 +
            # currFrameIsKF composition); keep the raw VO relative motion
            # for the map layer's pose composition
            self.last_kf_rel = t_rel.copy()
            self.t_base_w = self.t_base_w @ t_rel
            self.state = trk.mark_keyframe(out.state)
            t_abs = self.t_base_w.copy()
            base_kf = self.kf_count
            t_rel_base = np.eye(4)
            self.kf_count += 1
        else:
            t_abs = self.t_base_w @ t_rel
            base_kf = self.kf_count - 1
            t_rel_base = t_rel
        self.lost = self.lost or bool(out.track_lost)

        self.prev_frame = frame
        self.prev_time = timestamp
        rec = FrameRecord(timestamp, t_abs, need_kf,
                          int(out.n_inliers_pt), int(out.n_inliers_ln),
                          bool(out.pose.accepted),
                          base_kf=base_kf, t_rel_base=t_rel_base)
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
