"""Stereo / RGB-D modes: rectified stereo matching, depth-founded landmark
creation, single-frame metric initialization, and METRIC tracking accuracy
(no Sim3 scale freedom in the evaluation — stereo depth fixes the scale,
reference Tracking::StereoInitialization, Frame::ComputeStereoMatches)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from eorb_slam_tpu.geometry import camera
from eorb_slam_tpu.ops import stereo_match
from eorb_slam_tpu.slam import rgbd_stereo, system as slam_system
from tests import synth


def test_stereo_match_recovers_depth():
    """Left/right projections of a 3D cloud under a rectified baseline must
    match and reproduce the true depths."""
    rng = np.random.default_rng(3)
    fx, fy, cx, cy = 458.0, 457.0, 376.0, 240.0
    baseline = 0.11
    n = 200
    pts = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(2, 20, n)],
        axis=1,
    )
    uv_l = np.stack([fx * pts[:, 0] / pts[:, 2] + cx,
                     fy * pts[:, 1] / pts[:, 2] + cy], axis=1)
    uv_r = uv_l.copy()
    uv_r[:, 0] -= fx * baseline / pts[:, 2]          # disparity shift
    desc = synth.random_descriptors(n, 7)

    depth, u_right, ok = stereo_match.stereo_match(
        jnp.asarray(uv_l, jnp.float32), jnp.zeros(n, jnp.int32),
        jnp.asarray(desc), jnp.ones(n, bool),
        jnp.asarray(uv_r, jnp.float32), jnp.zeros(n, jnp.int32),
        jnp.asarray(desc), jnp.ones(n, bool),
        fx, baseline,
    )
    ok = np.asarray(ok)
    assert ok.sum() >= 0.9 * n
    err = np.abs(np.asarray(depth)[ok] - pts[ok, 2]) / pts[ok, 2]
    assert np.median(err) < 0.01


def test_depth_from_depthmap():
    dm = np.zeros((120, 160), np.float32)
    dm[50, 60] = 3.5
    xy = jnp.asarray([[60.2, 49.8], [10.0, 10.0], [200.0, 10.0]], jnp.float32)
    d, ok = stereo_match.depth_from_depthmap(
        xy, jnp.asarray(dm), jnp.ones(3, bool)
    )
    d, ok = np.asarray(d), np.asarray(ok)
    assert ok[0] and abs(d[0] - 3.5) < 1e-6
    assert not ok[1] and d[1] < 0          # zero depth = invalid
    assert not ok[2]                        # clipped outside still invalid-z


def _run_depth_slam(slam, world, ts, **frame_kw):
    gt = []
    for t in ts:
        f, Tcw = world.frame(float(t), with_depth=True, **frame_kw)
        slam.process_features(f)
        gt.append((float(t), np.linalg.inv(Tcw)))
    return gt


def test_stereo_slam_metric_tracking():
    """Depth-founded pipeline initializes from ONE frame and tracks with
    METRIC accuracy (evaluation without scale alignment)."""
    world = synth.SynthWorld(seed=11)
    slam = rgbd_stereo.StereoSlam(synth.CAM, baseline=0.11,
                                  min_init_matches=60)
    ts = np.arange(0.0, 2.0, 0.1)
    gt = _run_depth_slam(slam, world, ts)

    assert slam.state == slam_system.OK
    assert slam.n_kf >= 2
    assert slam.stats["lost"] == 0

    from eorb_slam_tpu.evals import ate

    traj = slam.trajectory_twc()
    rmse, n, scale, _, _ = ate.ate_rmse(traj, gt, with_scale=False,
                                        max_dt=0.02)
    assert n >= len(ts) - 2
    assert rmse < 0.05, rmse               # metric: no scale gauge


def test_rgbd_slam_depth_map_pipeline():
    """RGB-D entry: depth map lookup at keypoints feeds the same pipeline."""
    rng = np.random.default_rng(5)
    cam = camera.make_pinhole(200.0, 200.0, 160.0, 120.0)
    H, W = 240, 320
    slam = rgbd_stereo.RgbdSlam(cam, min_init_matches=40)
    # single synthetic plane at 4m: every pixel has depth 4
    depth_map = np.full((H, W), 4.0, np.float32)
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    f = slam.make_rgbd_frame(jnp.asarray(img), jnp.asarray(depth_map), 0.0,
                             max_kp=256)
    d = np.asarray(f.depth)
    v = np.asarray(f.valid)
    assert (np.abs(d[v & (d > 0)] - 4.0) < 1e-5).all()
    assert (d[v] > 0).sum() >= 50          # most keypoints got depth


def test_stereo_inertial_smoke():
    """IMU_STEREO: metric init from one frame + inertial init with fixed
    scale; gravity must align and tracking stay OK."""
    world = synth.SynthWorld(seed=13)
    from eorb_slam_tpu.imu.preintegration import make_calib

    calib = make_calib(
        gyro_noise=1e-4, acc_noise=1e-3, gyro_walk=1e-6, acc_walk=1e-5,
    )
    slam = rgbd_stereo.StereoInertialSlam(
        synth.CAM, calib, baseline=0.11,
        min_init_matches=60, min_kf_imu_init=4, min_time_imu_init=0.8,
    )
    ts = np.arange(0.0, 2.6, 0.1)
    prev = None
    for t in ts:
        f, _ = world.frame(float(t), with_depth=True)
        imu = synth.imu_between(world, prev if prev is not None else float(t),
                                float(t))
        slam.process_features_imu(f, imu)
        prev = float(t)
    assert slam.state == slam_system.OK
    assert slam.imu_initialized
    # fixed-scale inertial init must not have rescaled the metric map
    assert 0.8 < slam.scale_applied < 1.25, slam.scale_applied
