"""Stereo, RGB-D, and stereo-inertial SLAM systems.

Covers the reference's STEREO / RGBD / IMU_STEREO sensor configurations
(reference MySensorConfig, include/Utils/MyDataTypes.h:203-214; stereo
frame construction src/Frame.cc ComputeStereoMatches /
ComputeStereoFromRGBD; single-frame map bootstrap
Tracking::StereoInitialization, src/Tracking.cc).

Design: metric depth enters the tensor-map pipeline at exactly two points —
(1) initialization creates the map from ONE frame's depth-founded landmarks
(no two-view RANSAC, no scale gauge: stereo depth is metric), and
(2) every new keyframe turns its unmatched depth-valid features into
landmarks (slam/local_mapping.create_depth_landmarks). Tracking itself is
the same jitted project-match-optimize step as monocular.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from eorb_slam_tpu.geometry import camera as cam_mod
from eorb_slam_tpu.ops import frontend, stereo_match
from eorb_slam_tpu.slam import local_mapping, map_state
from eorb_slam_tpu.slam.system import NOT_INITIALIZED, OK, FrameInput, MonoSlam
from eorb_slam_tpu.slam.vi_system import ImuChunk, MonoInertialSlam


class _DepthInitMixin:
    """Single-frame depth initialization shared by stereo / RGB-D / VI
    variants (replaces two-view monocular init)."""

    min_init_depth_points: int = 60

    def _try_initialize(self, f: FrameInput):
        if f.depth is None:
            return super()._try_initialize(f)
        ok = np.asarray(f.valid & (f.depth > 0) & jnp.isfinite(f.depth))
        n_ok = int(ok.sum())
        if n_ok < self.min_init_depth_points:
            return {"state": self.state, "n": n_ok}

        # founding keyframe at the origin; landmarks at unprojected depth
        # (reference StereoInitialization sets the first KF to identity and
        # creates a MapPoint per depth-valid feature)
        N = f.xy_ud.shape[0]
        m = map_state.insert_keyframe(
            self.map, jnp.asarray(0), jnp.eye(4), f.ts, f.xy_ud, f.octave,
            f.angle, f.desc_pm1, f.valid, jnp.full(N, -1, jnp.int32),
        )
        self.map = m
        self.map, n_new = local_mapping.create_depth_landmarks(
            self.map, self.cam, jnp.asarray(0), jnp.asarray(f.depth)
        )
        self.n_kf = 1
        self.state = OK
        self.T_last = jnp.eye(4)
        self.velocity = jnp.eye(4)
        self.frames_since_kf = 0
        self.n_inliers_ref = int(n_new)
        self._log_pose(f.ts, self.T_last)
        self.stats["kf"] = 1
        self.stats["lm"] = int(self.map.lm_valid.sum())
        return {"state": self.state, "n": n_ok, "n_pts": self.stats["lm"]}


class StereoSlam(_DepthInitMixin, MonoSlam):
    """Rectified-stereo pipeline (STEREO mode). ``baseline`` in meters; the
    right camera shares intrinsics (rectified pair, reference
    MyCamParams::mLinkedCam)."""

    def __init__(self, cam_params, baseline: float, **kw):
        super().__init__(cam_params, **kw)
        self.baseline = float(baseline)

    def make_stereo_frame(
        self, img_l: jnp.ndarray, img_r: jnp.ndarray, ts: float,
        max_kp: int | None = None,
    ) -> FrameInput:
        if max_kp is None:
            max_kp = self.map.N  # frame capacity == extraction budget
        fl = frontend.extract(img_l, max_kp=max_kp)
        fr = frontend.extract(img_r, max_kp=max_kp)
        xy_l = cam_mod.undistort_points(self.cam, fl.xy)
        xy_r = cam_mod.undistort_points(self.cam, fr.xy)
        depth, _, _ = stereo_match.stereo_match(
            xy_l, fl.octave, fl.desc_pm1, fl.valid,
            xy_r, fr.octave, fr.desc_pm1, fr.valid,
            self.cam[0], self.baseline,
        )
        return FrameInput(ts, xy_l, fl.octave, fl.angle, fl.desc_pm1,
                          fl.valid, depth=depth)

    def process_stereo(self, img_l, img_r, ts: float,
                       max_kp: int | None = None):
        return self.process_features(
            self.make_stereo_frame(
                jnp.asarray(img_l, jnp.float32),
                jnp.asarray(img_r, jnp.float32), ts, max_kp,
            )
        )


class RgbdSlam(_DepthInitMixin, MonoSlam):
    """RGB-D pipeline (RGBD mode): depth sampled at keypoint locations."""

    def __init__(self, cam_params, max_depth: float = 40.0, **kw):
        super().__init__(cam_params, **kw)
        self.max_depth = float(max_depth)

    def make_rgbd_frame(
        self, img: jnp.ndarray, depth_map: jnp.ndarray, ts: float,
        max_kp: int | None = None,
    ) -> FrameInput:
        if max_kp is None:
            max_kp = self.map.N
        ft = frontend.extract(img, max_kp=max_kp)
        xy_ud = cam_mod.undistort_points(self.cam, ft.xy)
        # depth is sampled at the DISTORTED keypoint location (that is where
        # the sensor measured it)
        d, ok = stereo_match.depth_from_depthmap(ft.xy, depth_map, ft.valid)
        d = jnp.where(ok & (d <= self.max_depth), d, -1.0)
        return FrameInput(ts, xy_ud, ft.octave, ft.angle, ft.desc_pm1,
                          ft.valid, depth=d)

    def process_rgbd(self, img, depth_map, ts: float,
                     max_kp: int | None = None):
        return self.process_features(
            self.make_rgbd_frame(
                jnp.asarray(img, jnp.float32),
                jnp.asarray(depth_map, jnp.float32), ts, max_kp,
            )
        )


class StereoInertialSlam(_DepthInitMixin, MonoInertialSlam):
    """Stereo + IMU (IMU_STEREO mode): metric stereo init + the inertial
    machinery of MonoInertialSlam. Because stereo depth already fixes the
    scale, inertial initialization estimates gravity/biases around scale≈1
    (the reference's stereo-inertial path likewise fixes scale, reference
    src/LocalMapping.cc InitializeIMU with bFixedScale=true)."""

    def __init__(self, cam_params, calib, baseline: float, **kw):
        super().__init__(cam_params, calib, **kw)
        self.baseline = float(baseline)
        self._imu_fix_scale = True
        # right image of the in-flight frame (deferred stereo depth at KFs)
        self._pending_right = None

    make_stereo_frame = StereoSlam.make_stereo_frame

    def process_stereo_imu(self, img_l, img_r, ts: float, imu: ImuChunk,
                           max_kp: int | None = None):
        """Steady-state stereo-inertial frames run the SAME fused one-
        dispatch step as mono-VI on the LEFT image only: per-frame tracking
        never consumes stereo depth — depth enters the map exclusively at
        keyframe creation (create_depth_landmarks), so the right image's
        extraction + stereo matching is deferred to _insert_keyframe and
        paid at KF rate, not frame rate (reference stereo frames likewise
        only use mvDepth for KF point creation once the map exists;
        r4 measured 1,417 ms/frame for the unfused both-eyes-every-frame
        path vs ~200 ms mono-VI)."""
        if self.imu_initialized and self.state == OK:
            self._pending_right = (jnp.asarray(img_r, jnp.float32), max_kp)
            try:
                return self.process_image_imu(
                    jnp.asarray(img_l, jnp.float32), ts, imu, max_kp=max_kp)
            finally:
                self._pending_right = None
        f = self.make_stereo_frame(
            jnp.asarray(img_l, jnp.float32), jnp.asarray(img_r, jnp.float32),
            ts, max_kp,
        )
        return self.process_features_imu(f, imu)

    def _insert_keyframe(self, f: FrameInput, res, n_inl=None):
        if f.depth is None and getattr(self, "_pending_right", None) is not None:
            # deferred stereo depth: extract the right image + match NOW
            # (keyframe rate), so the new KF still founds metric landmarks
            import dataclasses

            img_r, max_kp = self._pending_right
            fr = frontend.extract(img_r, max_kp=max_kp or self.map.N)
            xy_r = cam_mod.undistort_points(self.cam, fr.xy)
            depth, _, _ = stereo_match.stereo_match(
                f.xy_ud, f.octave, f.desc_pm1, f.valid,
                xy_r, fr.octave, fr.desc_pm1, fr.valid,
                self.cam[0], self.baseline,
            )
            f = dataclasses.replace(f, depth=depth)
        super()._insert_keyframe(f, res, n_inl)

    def _try_initialize(self, f: FrameInput):
        out = _DepthInitMixin._try_initialize(self, f)
        if self.state == OK:
            # single-KF init: the preintegration window now spans KF0 only
            from eorb_slam_tpu.imu import preintegration as pre_mod

            self.pre_since_kf = pre_mod.identity_preintegrated()
        return out
