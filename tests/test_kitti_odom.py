"""KITTI odometry protocol evaluator (reference
evaluation/kitti-odom-eval/eval_odom.py)."""

import numpy as np

from eorb_slam_tpu.evals import kitti_odom as ko
from eorb_slam_tpu.geometry import lie
import jax.numpy as jnp


def _circle_traj(n=600, radius=200.0, step_m=2.0):
    """Camera driving a circle: n poses, ~step_m metres apart."""
    dtheta = step_m / radius
    out = []
    for i in range(n):
        th = i * dtheta
        T = np.eye(4)
        T[:3, :3] = np.asarray(
            lie.so3_exp(jnp.asarray([0.0, th, 0.0], jnp.float32))
        )
        T[:3, 3] = [radius * np.sin(th), 0.0, radius * (1 - np.cos(th))]
        out.append(T)
    return np.stack(out)


class TestKittiOdomEval:
    def test_perfect_trajectory_zero_error(self):
        gt = _circle_traj()
        res = ko.kitti_odom_eval(gt, gt.copy())
        assert res["n_subseq"] > 0
        assert res["t_err_pct"] < 1e-6
        assert res["r_err_deg_per_100m"] < 1e-6
        assert res["ate_rmse"] < 1e-6

    def test_scale_error_measured(self):
        gt = _circle_traj()
        est = gt.copy()
        est[:, :3, 3] *= 1.02  # 2% scale drift
        res = ko.kitti_odom_eval(gt, est)
        # a uniform 2% scale error shows up as ~2% translation error
        assert 1.0 < res["t_err_pct"] < 3.5
        assert res["r_err_deg_per_100m"] < 1e-6

    def test_rotation_noise_measured(self):
        rng = np.random.default_rng(0)
        gt = _circle_traj()
        est = gt.copy()
        for i in range(len(est)):
            phi = rng.normal(0, 0.002, 3).astype(np.float32)
            est[i, :3, :3] = est[i, :3, :3] @ np.asarray(
                lie.so3_exp(jnp.asarray(phi)))
        res = ko.kitti_odom_eval(gt, est)
        assert res["r_err_deg_per_100m"] > 1e-4

    def test_pose_file_roundtrip(self, tmp_path):
        gt = _circle_traj(n=50)
        path = tmp_path / "poses.txt"
        np.savetxt(path, gt[:, :3, :].reshape(len(gt), 12))
        back = ko.load_kitti_poses(str(path))
        assert np.allclose(back, gt, atol=1e-9)

    def test_short_sequence_no_subseq(self):
        gt = _circle_traj(n=20)  # ~40 m: shorter than the 100 m bucket
        res = ko.kitti_odom_eval(gt, gt.copy())
        assert res["n_subseq"] == 0
        assert np.isnan(res["t_err_pct"])
        assert np.isfinite(res["ate_rmse"])
