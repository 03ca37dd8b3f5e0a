"""End-to-end monocular SLAM on a synthetic world: init, tracking, mapping,
ATE gate. This is the M3 milestone test (SURVEY.md §7)."""

import numpy as np
import pytest

from eorb_slam_tpu.evals import ate
from eorb_slam_tpu.slam.system import LOST, NOT_INITIALIZED, OK, MonoSlam
from tests.synth import CAM, SynthWorld


@pytest.fixture(scope="module")
def run_result():
    world = SynthWorld(n_landmarks=1500, seed=0, noise_px=0.4)
    slam = MonoSlam(CAM, K=32, M=4096, N=512, P=8)
    gt = []
    fps = 20.0
    n_frames = 120
    for i in range(n_frames):
        t = i / fps
        f, Tcw_gt = world.frame(t)
        slam.process_features(f)
        gt.append((t, np.linalg.inv(Tcw_gt)))
    return slam, gt


def test_initializes(run_result):
    slam, _ = run_result
    assert slam.state == OK
    assert slam.n_kf >= 2
    assert slam.stats["lm"] > 100


def test_never_lost(run_result):
    slam, _ = run_result
    assert slam.stats["lost"] == 0


def test_tracks_most_frames(run_result):
    slam, gt = run_result
    est = slam.trajectory_twc()
    assert len(est) > 0.9 * (len(gt) - 2)


def test_ate_gate(run_result):
    slam, gt = run_result
    est = slam.trajectory_twc()
    rmse, n, s, _, _ = ate.ate_rmse(est, gt, with_scale=True)
    # trajectory spans ~7m; gate at 5cm (reference-class accuracy on easy
    # synthetic data). Scale is free (monocular Sim3 alignment).
    assert n > 100
    assert rmse < 0.05, f"ATE RMSE {rmse:.4f} m over {n} poses"


def test_keyframes_and_map_grow(run_result):
    slam, _ = run_result
    assert slam.n_kf >= 4, "keyframes should be inserted as the camera moves"
    assert slam.stats["lm"] > 300
