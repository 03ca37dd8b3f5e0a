"""End-to-end monocular-inertial SLAM: metric scale + gravity recovery.

The decisive capability over pure monocular: after IMU initialization the
trajectory must align to ground truth under SE3 (scale FIXED at 1) — the
reference achieves this via InertialOptimization + ApplyScaledRotation
(reference src/LocalMapping.cc:198-241, src/IMU/IMU_Manager.cpp:214-427)."""

import numpy as np
import pytest

from eorb_slam_tpu.evals import ate
from eorb_slam_tpu.imu import preintegration as pre_mod
from eorb_slam_tpu.slam.system import OK
from eorb_slam_tpu.slam.vi_system import ImuChunk, MonoInertialSlam
from tests.synth import CAM, SynthWorld, imu_between

BG_TRUE = np.asarray([0.004, -0.006, 0.003])
BA_TRUE = np.asarray([0.02, -0.015, 0.03])


@pytest.fixture(scope="module")
def run_result():
    world = SynthWorld(n_landmarks=1500, seed=0, noise_px=0.4)
    calib = pre_mod.make_calib(freq=200.0)
    slam = MonoInertialSlam(CAM, calib, K=32, M=4096, N=512, P=8)
    gt = []
    fps = 20.0
    n_frames = 120
    t_prev = 0.0
    for i in range(n_frames):
        t = i / fps
        f, Tcw_gt = world.frame(t)
        chunk = imu_between(world, t_prev, t, bg=BG_TRUE, ba=BA_TRUE)
        slam.process_features_imu(f, chunk)
        gt.append((t, np.linalg.inv(Tcw_gt)))
        t_prev = t
    return slam, gt


def test_tracks_and_initializes_imu(run_result):
    slam, _ = run_result
    assert slam.state == OK
    assert slam.stats["lost"] == 0
    assert slam.imu_initialized, "IMU initialization never triggered"


def test_metric_scale_recovered(run_result):
    slam, gt = run_result
    est = slam.trajectory_twc()
    # SE3 alignment (scale pinned to 1): only passes if the map is metric
    rmse, n, s, _, _ = ate.ate_rmse(est, gt, with_scale=False)
    assert n > 80
    assert rmse < 0.08, f"metric ATE RMSE {rmse:.3f} m"
    # and the Sim3 alignment scale should be ~1
    _, _, s_free, _, _ = ate.ate_rmse(est, gt, with_scale=True)
    assert s_free == pytest.approx(1.0, abs=0.05)


def test_gyro_bias_estimated(run_result):
    slam, _ = run_result
    assert np.allclose(np.asarray(slam.bg), BG_TRUE, atol=2e-3)
