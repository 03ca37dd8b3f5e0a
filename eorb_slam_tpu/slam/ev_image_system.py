"""Event-Image synchronized SLAM (EVENT_MONO mode).

Replaces the reference's synch-tracker hook web (§3.4 of SURVEY.md):
``System::TrackEvMono`` slaves event processing to the image-frame clock —
per image, an MCI is reconstructed at the image timestamp
(``EvTrackManager::reconstSynchEvMCI`` -> ``EvImBuilder::getSynchMCI``,
src/Event/EvTrackManager.cpp:651-690), the event frame is paired with the
ORB frame (``Frame::mpEvFrame`` weak link, include/Frame.h:403), twin
keyframes cross-link the two maps (``KeyFrame::mpSynchOrbKF/mpSynchEvKF``),
and every pose optimization pulls BOTH frames' map-point edges into one
graph (``EvOptimizer::PoseOptimization`` / ``setEventMapVxAndEdges``,
src/Event/EvOptimizer.cpp:634,3714-4032).

Here the two maps are two MapState values (the reference's two Atlases),
and the joint optimization is literally ONE ``pose_only.pose_optimization``
call over the concatenation of both matched observation sets — valid
because a DAVIS sensor's events and frames share one pixel array and hence
one camera model (the reference's event modes use the same YAML camera
section for both).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from eorb_slam_tpu.event import builder as ev_builder
from eorb_slam_tpu.geometry import lie
from eorb_slam_tpu.ops import frontend
from eorb_slam_tpu.optim import pose_only
from eorb_slam_tpu.slam import system as slam_system


class EvImageSlam:
    """One clock (image frames), two maps (image + event), joint pose opt."""

    def __init__(
        self,
        cam_params: jnp.ndarray,
        cfg: Optional[ev_builder.BuilderConfig] = None,
        img_w: int = 240,
        img_h: int = 180,
        max_kp: int = 512,
        ev_max_kp: int = 256,
        synch_window_s: float = 0.15,
        **slam_kw,
    ):
        self.cam = cam_params
        self.cfg = cfg or ev_builder.BuilderConfig(img_w=img_w, img_h=img_h)
        self.builder = ev_builder.EventWindowBuilder(self.cfg, cam_params)
        self.synch_window_s = synch_window_s
        self.max_kp = max_kp
        self.ev_max_kp = ev_max_kp

        self.im = slam_system.MonoSlam(
            cam_params, img_w=img_w, img_h=img_h, N=max_kp, **slam_kw
        )
        self.ev = slam_system.MonoSlam(
            cam_params, img_w=img_w, img_h=img_h, N=ev_max_kp,
            min_init_matches=max(
                20, slam_kw.get("min_init_matches", 40) // 2
            ),
            min_track_inliers=8,
        )
        self._ev_buf = np.zeros((0, 4), np.float32)
        self._last_im_ts: Optional[float] = None
        self.joint_frames = 0

    # ---------------------------------------------------------------- input

    def track_ev_mono(self, events: np.ndarray, img: np.ndarray, ts: float):
        """System::TrackEvMono (src/System.cc:868-939): buffer events, build
        the synch MCI at the image timestamp, run both trackers + joint
        refinement."""
        if len(events):
            self._ev_buf = np.concatenate(
                [self._ev_buf, np.asarray(events, np.float32)]
            )

        mci = self._synch_mci(ts)

        # image tracker first (clock master)
        im_res = self.im.process_image(
            jnp.asarray(img, jnp.float32), ts, max_kp=self.max_kp
        )

        ev_res = None
        if mci is not None:
            # seed the event tracker's motion model from the image tracker
            # (EvSynchTracker uses the ORB pose as its prior)
            if (
                self.im.state == slam_system.OK
                and self.ev.state == slam_system.OK
            ):
                self.ev.velocity = self.im.velocity
            ev_res = self.ev.process_image(
                jnp.asarray(mci.img * 255.0, jnp.float32), ts,
                max_kp=self.ev_max_kp,
            )

        joint = self._joint_refine(ts)
        self._last_im_ts = ts
        return {"image": im_res, "event": ev_res, "joint": joint}

    def _synch_mci(self, ts: float) -> Optional[ev_builder.PoseImage]:
        """getSynchMCI: MCI over the events ending at the image timestamp
        (reference src/Event/EvImBuilder.cpp:1249)."""
        sel = self._ev_buf[:, 0] <= ts
        window = self._ev_buf[sel]
        self._ev_buf = self._ev_buf[~sel]
        if len(window) < self.cfg.min_chunk:
            return None
        window = window[window[:, 0] >= ts - self.synch_window_s]
        if len(window) < self.cfg.min_chunk:
            return None
        self.builder.chunks_in_window = [window]
        return self.builder._finish_window()

    # ------------------------------------------------------------ joint opt

    def _joint_refine(self, ts: float):
        """EvOptimizer::PoseOptimization equivalent: one GN solve over the
        union of image-map and event-map matches of the paired frames."""
        if (
            self.im.state != slam_system.OK
            or self.ev.state != slam_system.OK
            or self.im.last_track is None
            or self.ev.last_track is None
            or self.im.last_frame is None
            or self.ev.last_frame is None
            or self.im.last_frame.ts != ts
            or self.ev.last_frame.ts != ts
        ):
            return None

        tr_i, f_i = self.im.last_track, self.im.last_frame
        tr_e, f_e = self.ev.last_track, self.ev.last_frame

        # the two maps live in different scale gauges (both monocular); align
        # the event-side points into the image gauge via the relative scale of
        # the two current pose translations before stacking
        # (the reference instead rescales the event map after IMU/merge —
        # ApplyScaleAndRotationEvSynch; a per-frame gauge bridge is the
        # tensor-state equivalent for the vision-only mode)
        Ti = np.asarray(tr_i.Tcw)
        Te = np.asarray(tr_e.Tcw)
        ni = float(np.linalg.norm(Ti[:3, 3]))
        ne = float(np.linalg.norm(Te[:3, 3]))
        if ne < 1e-6 or ni < 1e-6:
            return None
        s = ni / ne

        mi = tr_i.feat_lm >= 0
        me = tr_e.feat_lm >= 0
        pts_i = self.im.map.lm_pos[jnp.where(mi, tr_i.feat_lm, 0)]
        pts_e = self.ev.map.lm_pos[jnp.where(me, tr_e.feat_lm, 0)] * s

        pts = jnp.concatenate([pts_i, pts_e])
        uv = jnp.concatenate([f_i.xy_ud, f_e.xy_ud])
        inv_sig = jnp.concatenate(
            [frontend.inv_sigma(f_i.octave), frontend.inv_sigma(f_e.octave)]
        )
        valid = jnp.concatenate([mi, me])

        Tj, inlier, n_inl = pose_only.pose_optimization(
            self.cam, tr_i.Tcw, pts, uv, inv_sig, valid
        )
        # write the joint pose back into both trackers (and their gauges)
        Tj_np = np.asarray(Tj)
        self.im.velocity = jnp.asarray(Tj_np) @ lie.se3_inv(self.im.T_last)
        self.im.T_last = jnp.asarray(Tj_np)
        Te_j = Tj_np.copy()
        Te_j[:3, 3] /= s
        self.ev.velocity = jnp.asarray(Te_j) @ lie.se3_inv(self.ev.T_last)
        self.ev.T_last = jnp.asarray(Te_j)
        if self.im.trajectory and self.im.trajectory[-1][0] == ts:
            self.im.trajectory.pop()
            self.im._log_pose(ts, jnp.asarray(Tj_np))
        self.joint_frames += 1
        return {"n_inliers": int(n_inl), "scale_bridge": s}

    # --------------------------------------------------------------- output

    def trajectory_twc(self):
        return self.im.trajectory_twc()

    @property
    def stats(self):
        return {
            "im": dict(self.im.stats),
            "ev": dict(self.ev.stats),
            "joint_frames": self.joint_frames,
        }
