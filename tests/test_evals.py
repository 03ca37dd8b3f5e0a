"""Evaluation-math tests: RPE (scale-normalized option) and piecewise APE
over disconnected trajectories — the synthetic-trajectory fixture strategy
of the reference (evaluation/eorb-slam-utils/gen_test_traj.py)."""

from __future__ import annotations

import numpy as np

from eorb_slam_tpu.evals import ate, rpe


def _traj(ts, offset=np.zeros(3), scale=1.0, noise=0.0, rng=None):
    """Smooth Twc trajectory: circle + yaw."""
    out = []
    for t in ts:
        c, s = np.cos(0.4 * t), np.sin(0.4 * t)
        R = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        p = scale * np.asarray([np.cos(t), 0.2 * t, np.sin(t)]) + offset
        if noise > 0 and rng is not None:
            p = p + rng.normal(0, noise, 3)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = p
        out.append((float(t), T))
    return out


def test_rpe_perfect_trajectory():
    ts = np.arange(0, 5, 0.1)
    gt = _traj(ts)
    r = rpe.rpe(gt, gt, delta=1)
    assert r["n"] == len(ts) - 1
    assert r["trans_rmse"] < 1e-9
    assert r["rot_rmse"] < 1e-9


def test_rpe_scale_normalization():
    """A globally rescaled trajectory has large raw RPE but ~zero
    scale-normalized RPE (monocular convention)."""
    ts = np.arange(0, 5, 0.1)
    gt = _traj(ts)
    est = _traj(ts, scale=2.5)
    raw = rpe.rpe(est, gt, delta=1)
    norm = rpe.rpe(est, gt, delta=1, scale_norm=True)
    assert raw["trans_rmse"] > 0.05
    assert norm["trans_rmse"] < 1e-6
    # rotation is scale-invariant either way
    assert raw["rot_rmse"] < 1e-9


def test_rpe_detects_noise():
    rng = np.random.default_rng(0)
    ts = np.arange(0, 5, 0.1)
    gt = _traj(ts)
    est = _traj(ts, noise=0.01, rng=rng)
    r = rpe.rpe(est, gt, delta=1)
    assert 0.005 < r["trans_rmse"] < 0.08


def test_break_pieces_on_ts_jump_and_reset():
    ts1 = np.arange(0, 2, 0.1)
    ts2 = np.arange(5, 7, 0.1)  # 3 s gap
    a = _traj(ts1, offset=np.ones(3))
    b = _traj(ts2, offset=np.ones(3))
    # segment c restarts at identity (re-init after loss)
    c = [(8.0 + 0.1 * k, np.eye(4)) for k in range(3)]
    for k, (t, T) in enumerate(c):
        T2 = np.eye(4)
        T2[:3, 3] = [0.1 * k, 0, 0]
        c[k] = (t, T2)
    pieces = rpe.break_pieces(a + b + c, th_ts=1.0)
    assert len(pieces) == 3
    assert len(pieces[0]) == len(ts1)
    assert len(pieces[1]) == len(ts2)


def test_piecewise_ape_aligns_each_segment():
    """Two segments with different gauges (offset + scale) both align to
    ~zero error piecewise; a single global alignment cannot."""
    ts1 = np.arange(0, 2, 0.05)
    ts2 = np.arange(5, 7, 0.05)
    gt = _traj(np.concatenate([ts1, ts2]))
    est = _traj(ts1, offset=np.asarray([3.0, 0, 0]), scale=0.5) + _traj(
        ts2, offset=np.asarray([-2.0, 1, 0]), scale=2.0
    )
    res = rpe.ate_piecewise(est, gt, with_scale=True, max_dt=0.03)
    assert len(res["pieces"]) == 2
    assert res["rmse"] < 1e-6
    assert res["traj_len"] > 0
    # global Sim3 alignment fails: one scale cannot fit both segments
    global_rmse, n, _, _, _ = ate.ate_rmse(est, gt, with_scale=True,
                                           max_dt=0.03)
    assert global_rmse > 0.1


def test_piecewise_ape_scale_per_piece():
    ts = np.arange(0, 3, 0.05)
    gt = _traj(ts)
    est = _traj(ts, scale=0.25)
    res = rpe.ate_piecewise(est, gt, with_scale=True, max_dt=0.03)
    assert len(res["pieces"]) == 1
    assert abs(res["pieces"][0]["scale"] - 4.0) < 1e-6
