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

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from eorb_slam_tpu.event import builder as ev_builder
from eorb_slam_tpu.geometry import lie
from eorb_slam_tpu.ops import frontend
from eorb_slam_tpu.optim import pose_only, schur_ba
from eorb_slam_tpu.slam import system as slam_system


@functools.partial(jax.jit, static_argnames=("iters",))
def _joint_local_ba_step(
    im_map, ev_map, cam_params,
    R_ie, t_ie, s_ie,            # Sim3: event-map coords -> image-map coords
    kf_free_im, kf_free_ev,      # (K_im,), (K_ev,) bool BA windows
    ev_sigma_scale: float = 0.5,
    iters: int = 8,
):
    """JOINT local bundle adjustment over the union of the image map and the
    Sim3-bridged event map — the reference's EvOptimizer::LocalBundleAdjust-
    ment / setEventMapVxAndEdges (src/Event/EvOptimizer.cpp:990,3714-4032),
    which pulls the paired event frames' map points into every BA.

    Event keyframes/landmarks are mapped into the image gauge
    (p_im = s R p_ev + t; camera poses transform as R' = R_ev R^T,
    t' = s t_ev - R' t, which preserves projections under the uniform
    camera-frame scaling), both observation tables concatenate into one
    BAProblem (keyframe axis offset for the event rows), and the solution
    is split back — the event side through the inverse Sim3.

    Returns (im_map', ev_map', stats[cost0, cost])."""
    K_im = im_map.kf_T.shape[0]
    Rm = R_ie.astype(jnp.float32)
    tm = t_ie.astype(jnp.float32)
    sm = s_ie.astype(jnp.float32)

    def ev_pose_to_im(T):
        Rp = T[:3, :3] @ Rm.T
        tp = sm * T[:3, 3] - Rp @ tm
        return jnp.eye(4, dtype=T.dtype).at[:3, :3].set(Rp).at[:3, 3].set(tp)

    def im_pose_to_ev(T):
        Re = T[:3, :3] @ Rm
        te = (T[:3, 3] + T[:3, :3] @ tm) / sm
        return jnp.eye(4, dtype=T.dtype).at[:3, :3].set(Re).at[:3, 3].set(te)

    ev_T_im = jax.vmap(ev_pose_to_im)(ev_map.kf_T)
    ev_lm_im = sm * (ev_map.lm_pos @ Rm.T) + tm

    kf_T = jnp.concatenate([im_map.kf_T, ev_T_im])
    kf_valid = jnp.concatenate([im_map.kf_valid, ev_map.kf_valid])
    kf_fixed = ~jnp.concatenate([kf_free_im, kf_free_ev])
    lm_pos = jnp.concatenate([im_map.lm_pos, ev_lm_im])
    lm_valid = jnp.concatenate([im_map.lm_valid, ev_map.lm_valid])

    obs_uv_im = im_map.kf_xy[im_map.obs_kf, im_map.obs_feat]
    obs_uv_ev = ev_map.kf_xy[ev_map.obs_kf, ev_map.obs_feat]
    sig_im = frontend.inv_sigma(im_map.kf_octave[im_map.obs_kf,
                                                 im_map.obs_feat])
    sig_ev = frontend.inv_sigma(ev_map.kf_octave[ev_map.obs_kf,
                                                 ev_map.obs_feat])

    prob = schur_ba.BAProblem(
        cam_params=cam_params,
        kf_T=kf_T,
        kf_fixed=kf_fixed,
        kf_valid=kf_valid,
        lm_pos=lm_pos,
        lm_valid=lm_valid,
        obs_kf=jnp.concatenate([im_map.obs_kf, ev_map.obs_kf + K_im]),
        obs_uv=jnp.concatenate([obs_uv_im, obs_uv_ev]),
        obs_inv_sigma=jnp.concatenate([sig_im, ev_sigma_scale * sig_ev]),
        obs_valid=jnp.concatenate([
            im_map.obs_valid & im_map.kf_valid[im_map.obs_kf],
            ev_map.obs_valid & ev_map.kf_valid[ev_map.obs_kf],
        ]),
    )
    res = schur_ba.bundle_adjust(prob, iters=iters)

    M_im = im_map.lm_pos.shape[0]
    im_map = im_map._replace(
        kf_T=res.kf_T[:K_im], lm_pos=res.lm_pos[:M_im],
    )
    ev_T_new = jax.vmap(im_pose_to_ev)(res.kf_T[K_im:])
    ev_lm_new = ((res.lm_pos[M_im:] - tm) @ Rm) / sm
    ev_map = ev_map._replace(kf_T=ev_T_new, lm_pos=ev_lm_new)
    return im_map, ev_map, jnp.stack([res.cost0, res.cost])


@jax.jit
def _joint_pose_step(
    cam_params,
    im_lm_pos, ev_lm_pos,
    feat_lm_i, xy_i, oct_i,
    feat_lm_e, xy_e, oct_e,
    R_ie, t_ie, s_ie,
    Tcw0,
):
    """Joint image+event pose optimization as ONE dispatch: gather both
    matched landmark sets (event side Sim3-bridged), one GN solve, packed
    host flags [n_inl_total, n_inl_image, finite]."""
    mi = feat_lm_i >= 0
    me = feat_lm_e >= 0
    pts_i = im_lm_pos[jnp.where(mi, feat_lm_i, 0)]
    pts_e_raw = ev_lm_pos[jnp.where(me, feat_lm_e, 0)]
    pts_e = s_ie * (pts_e_raw @ R_ie.T) + t_ie
    pts = jnp.concatenate([pts_i, pts_e])
    uv = jnp.concatenate([xy_i, xy_e])
    inv_sig = jnp.concatenate(
        [frontend.inv_sigma(oct_i), 0.5 * frontend.inv_sigma(oct_e)]
    )
    valid = jnp.concatenate([mi, me])
    Tj, inlier, n_inl = pose_only.pose_optimization(
        cam_params, Tcw0, pts, uv, inv_sig, valid
    )
    n_im = xy_i.shape[0]
    flags = jnp.stack([
        n_inl.astype(jnp.float32),
        jnp.sum(inlier[:n_im]).astype(jnp.float32),
        jnp.isfinite(Tj).all().astype(jnp.float32),
    ])
    return Tj, flags


@jax.jit
def _joint_writeback(Tj, T_last_im, T_last_ev, R_ie, t_ie, s_ie, ref_T_im):
    """Post-joint-solve pose algebra in one dispatch: both trackers' motion
    models, the event-gauge twin pose, and the trajectory entry."""
    vel_im = Tj @ lie.se3_inv(T_last_im)
    Te = (
        jnp.eye(4, dtype=Tj.dtype)
        .at[:3, :3].set(Tj[:3, :3] @ R_ie)
        .at[:3, 3].set((Tj[:3, :3] @ t_ie + Tj[:3, 3]) / s_ie)
    )
    vel_ev = Te @ lie.se3_inv(T_last_ev)
    T_rel = Tj @ lie.se3_inv(ref_T_im)
    return vel_im, Te, vel_ev, T_rel


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
        ev_min_init = max(20, slam_kw.get("min_init_matches", 40) // 2)
        self.ev = slam_system.MonoSlam(
            cam_params, img_w=img_w, img_h=img_h, N=ev_max_kp,
            K=slam_kw.get("K", 32), M=slam_kw.get("M", 4096),
            min_init_matches=ev_min_init,
            min_init_triangulated=max(15, ev_min_init * 3 // 4),
            min_track_inliers=8,
        )
        # event twin map: no fuse pass (EvLocalMapping has none; coarse MCI
        # features make duplicate-merging net-harmful)
        self.ev.fuse_enabled = False
        self._ev_buf = np.zeros((0, 4), np.float64)
        self._last_im_ts: Optional[float] = None
        self.joint_frames = 0
        # paired per-tracker poses (ts, Tcw_im, Tcw_ev) feeding the Sim3
        # gauge bridge between the two monocular maps (the reference aligns
        # the event map with scale AND rotation — ApplyScaleAndRotationEvSynch,
        # src/LoopClosing.cc:2075-2094)
        self._gauge_pairs: list[tuple[float, np.ndarray, np.ndarray]] = []
        self._gauge_window = 12
        # joint event+image LOCAL BA (reference EvOptimizer::LocalBundle-
        # Adjustment dispatch, src/LocalMapping.cc:163-188): runs after an
        # image keyframe insertion once the Sim3 gauge bridge is healthy
        self.joint_ba_enabled = True
        self.joint_bas = 0
        self._last_gauge = None

    # ---------------------------------------------------------------- input

    def track_ev_mono(self, events: np.ndarray, img: np.ndarray, ts: float,
                      imu=None):
        """System::TrackEvMono (src/System.cc:868-939): buffer events, build
        the synch MCI at the image timestamp, run both trackers + joint
        refinement. ``imu`` (ImuChunk since the previous frame) is forwarded
        to inertial image trackers (EVENT_IMU_MONO mode)."""
        if len(events):
            self._ev_buf = np.concatenate(
                [self._ev_buf, np.asarray(events, np.float64)]
            )

        mci = self._synch_mci(ts)

        # image tracker first (clock master)
        im_res = self._track_image(img, ts, imu)

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
        # joint event+image local BA on image-KF insertions (the reference
        # pulls event map points into every LocalMapping BA; here it is one
        # fused dispatch over the union problem)
        if (
            self.joint_ba_enabled
            and self._last_gauge is not None
            and joint is not None and not joint.get("rejected")
            and isinstance(im_res, dict) and im_res.get("kf")
            and self.ev.n_kf >= 2
        ):
            self._run_joint_ba()
        self._last_im_ts = ts
        return {"image": im_res, "event": ev_res, "joint": joint}

    def _run_joint_ba(self):
        s, R_ie, t_ie = self._last_gauge
        im_free = self.im._ba_window()
        ev_free = self.ev._ba_window()
        self.im.map, self.ev.map, stats = _joint_local_ba_step(
            self.im.map, self.ev.map, self.cam,
            jnp.asarray(R_ie, jnp.float32), jnp.asarray(t_ie, jnp.float32),
            jnp.asarray(s, jnp.float32),
            jnp.asarray(im_free), jnp.asarray(ev_free),
        )
        # current-frame poses follow their just-refined keyframes
        if self.im.last_kf_slot >= 0:
            self.im.T_last = self.im.map.kf_T[self.im.last_kf_slot]
        self.joint_bas += 1

    def _track_image(self, img: np.ndarray, ts: float, imu=None):
        """Image-tracker hook; the inertial variant overrides this to route
        the IMU window into the frame (slam/event_inertial.py)."""
        return self.im.process_image(
            jnp.asarray(img, jnp.float32), ts, max_kp=self.max_kp
        )

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
        # build_mci does NOT touch builder buffers — the reference's
        # getSynchMCI likewise builds from the passed events without
        # re-injecting an overlap tail into a queue nothing drains
        return self.builder.build_mci(window)

    # ------------------------------------------------------------ joint opt

    def _estimate_gauge(self):
        """Full Sim3 (s, R_ie, t_ie) mapping event-map coordinates into the
        image-map gauge, from recent frames where BOTH trackers tracked
        independently. Two independently initialized monocular maps differ by
        a full Sim3, not just a scale (the reference applies scale AND
        rotation: ApplyScaleAndRotationEvSynch, src/LoopClosing.cc:2075-2094).

        Per pair k the rotations give R_ie = R_im^T R_ev directly; the scale
        comes from camera-center baseline ratios; the translation from the
        residual means. Returns (s, R_ie, t_ie, residual) or None if under-
        constrained / the two gauges disagree."""
        pairs = self._gauge_pairs[-self._gauge_window:]
        if len(pairs) < 3:
            return None
        R_sum = np.zeros((3, 3))
        C_im, C_ev = [], []
        for _, Ti, Te in pairs:
            R_sum += Ti[:3, :3].T @ Te[:3, :3]
            C_im.append(-Ti[:3, :3].T @ Ti[:3, 3])
            C_ev.append(-Te[:3, :3].T @ Te[:3, 3])
        # chordal mean of the per-frame R_ie estimates
        U, _, Vt = np.linalg.svd(R_sum)
        R_ie = U @ np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))]) @ Vt
        C_im = np.stack(C_im)
        C_ev = np.stack(C_ev)

        d_im = np.linalg.norm(np.diff(C_im, axis=0), axis=1)
        d_ev = np.linalg.norm(np.diff(C_ev, axis=0), axis=1)
        ok = d_ev > 1e-4
        if ok.sum() < 2 or float(d_im[ok].max()) < 1e-4:
            return None
        s = float(np.median(d_im[ok] / d_ev[ok]))
        if not np.isfinite(s) or s < 1e-6:
            return None
        t_ie = (C_im - s * (R_ie @ C_ev.T).T).mean(axis=0)

        # agreement gate: the Sim3 must actually explain the paired centers
        resid = np.linalg.norm(C_im - (s * (R_ie @ C_ev.T).T + t_ie), axis=1)
        span = float(d_im.sum())
        if float(np.median(resid)) > max(0.25 * span, 1e-3):
            return None
        return s, R_ie, t_ie, float(np.median(resid))

    def _joint_refine(self, ts: float):
        """EvOptimizer::PoseOptimization equivalent: one GN solve over the
        union of image-map and event-map matches of the paired frames, with
        the event landmarks Sim3-bridged into the image gauge."""
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
        self._gauge_pairs.append(
            (ts, np.asarray(tr_i.Tcw), np.asarray(tr_e.Tcw))
        )
        gauge = self._estimate_gauge()
        if gauge is None:
            self._last_gauge = None
            return None
        s, R_ie, t_ie, resid = gauge
        self._last_gauge = (s, R_ie, t_ie)

        # ONE dispatch for the joint solve + ONE packed flags pull (the
        # eager gather/concat/solve path was ~10 round trips per frame on
        # a remote link). Event points carry half weight: Sim3-bridged
        # through an estimated (drifting) gauge, and MCI keypoints are
        # intrinsically blurrier.
        Tj, flags = _joint_pose_step(
            self.cam, self.im.map.lm_pos, self.ev.map.lm_pos,
            tr_i.feat_lm, f_i.xy_ud, f_i.octave,
            tr_e.feat_lm, f_e.xy_ud, f_e.octave,
            jnp.asarray(R_ie, jnp.float32), jnp.asarray(t_ie, jnp.float32),
            jnp.asarray(s, jnp.float32), tr_i.Tcw,
        )
        n_inl, im_inl_joint, finite = (float(x) for x in np.asarray(flags))
        # inlier-count sanity on the IMAGE subset: a bad gauge shows up as
        # the joint solve losing image inliers vs the image-only solve —
        # keep the image pose then (event inliers alone must not vouch)
        if im_inl_joint < int(tr_i.n_inliers) or not finite:
            return {"n_inliers": int(n_inl), "rejected": True}

        # write the joint pose back into both trackers (and their gauges):
        # Tcw_ev = [R_j R_ie | (R_j t_ie + t_j)/s] maps event-world to the
        # camera in event-map units — one fused dispatch, nothing pulled
        vel_im, Te_j, vel_ev, T_rel = _joint_writeback(
            Tj, self.im.T_last, self.ev.T_last,
            jnp.asarray(R_ie, jnp.float32), jnp.asarray(t_ie, jnp.float32),
            jnp.asarray(s, jnp.float32),
            self.im.map.kf_T[self.im._kf_ref()],
        )
        self.im.velocity = vel_im
        self.im.T_last = Tj
        self.ev.velocity = vel_ev
        self.ev.T_last = Te_j
        if self.im.trajectory and self.im.trajectory[-1][0] == ts:
            self.im.trajectory.pop()
            self.im.trajectory.append((ts, T_rel, self.im._kf_ref()))
        self.joint_frames += 1
        return {"n_inliers": int(n_inl), "scale_bridge": s, "gauge_resid": resid}

    # --------------------------------------------------------------- output

    def trajectory_twc(self):
        return self.im.trajectory_twc()

    def fused_trajectory(self, **kw):
        """System::FuseEventORB equivalent: weld the event tracker's KF
        chains into the image trajectory's gauge via the joint pose-graph
        solve (slam/fusion.py; reference MyOptimizer::MergeVisualEvent,
        src/Utils/MyOptimizer.cpp:3471). Returns the fusion result dict."""
        from eorb_slam_tpu.slam import fusion

        return fusion.fuse_event_orb(
            self.im.trajectory_twc(), self.ev.trajectory_twc(), **kw
        )

    @property
    def stats(self):
        return {
            "im": dict(self.im.stats),
            "ev": dict(self.ev.stats),
            "joint_frames": self.joint_frames,
            "joint_bas": self.joint_bas,
        }
