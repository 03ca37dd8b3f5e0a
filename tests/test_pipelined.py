"""Pipelined (speculative) tracking: the per-frame decision pull overlaps
the next frame's dispatch (MonoSlam(pipelined=True), the run_slam mono
default). Host decisions trail one frame; a misprediction (lost frame)
rolls the speculation back and replays synchronously — so the state
machine semantics match the synchronous path up to one-frame KF lag."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from eorb_slam_tpu.evals import ate
from eorb_slam_tpu.io import synth_dataset as sd
from eorb_slam_tpu.slam.system import OK, MonoSlam

pytestmark = pytest.mark.slow

W, H = 376, 240  # half-res corridor: fast CPU rendering, real texture


def _cam_half():
    from eorb_slam_tpu.geometry import camera
    return camera.make_pinhole(229.0, 229.0, W / 2.0, H / 2.0)


_renderer = sd.make_box_renderer("corridor", W, H, 229.0, seed=1)
_pose_fn = sd.make_trajectory("corridor", 30.0)


def run(pipelined: bool, blank_at=None, n_frames=60, fps=20.0):
    slam = MonoSlam(_cam_half(), img_w=W, img_h=H, K=32, M=4096, N=384,
                    pipelined=pipelined)
    gt = []
    for i in range(n_frames):
        t = i / fps
        Tcw = np.asarray(_pose_fn(t), np.float32)
        if blank_at is not None and i in blank_at:
            img = np.zeros((H, W), np.uint8)
        else:
            img = np.asarray(_renderer(jnp.asarray(Tcw)) * 255.0
                             ).astype(np.uint8)
        slam.process_image(jnp.asarray(img), t)
        gt.append((t, np.linalg.inv(Tcw)))
    slam.flush_pipeline()
    return slam, gt


def _ate(slam, gt):
    traj = slam.trajectory_twc()
    gt_m = dict((round(t, 6), T) for t, T in gt)
    pairs = [(t, T) for t, T in traj if round(t, 6) in gt_m]
    g = [(t, gt_m[round(t, 6)]) for t, _ in pairs]
    r, n, _, _, _ = ate.ate_rmse(pairs, g, with_scale=True)
    return r, n


def test_pipelined_matches_sync():
    s_sync, gt = run(False)
    s_pipe, _ = run(True)
    r_s, n_s = _ate(s_sync, gt)
    r_p, n_p = _ate(s_pipe, gt)
    assert s_pipe.state == OK
    assert n_p >= n_s - 2            # same frames tracked (1-frame lag)
    assert r_p < max(0.05, 2.0 * r_s + 0.01), (r_p, r_s)
    # KF cadence within one frame of the synchronous policy
    assert abs(s_pipe.stats["kf"] - s_sync.stats["kf"]) <= 3, (
        s_pipe.stats, s_sync.stats)


def test_pipelined_misprediction_recovers():
    """A blank frame mid-run forces a failed speculation: the rollback must
    remove the bogus trajectory entries and recover like the sync path."""
    s_pipe, gt = run(True, blank_at={30})
    assert s_pipe.state == OK, s_pipe.stats
    r_p, n_p = _ate(s_pipe, gt)
    assert n_p >= 50
    assert r_p < 0.12, r_p
    # no duplicate / phantom timestamps survived the rollback
    traj = s_pipe.trajectory_twc()
    ts = [t for t, _ in traj]
    assert len(ts) == len(set(ts))
