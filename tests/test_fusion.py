"""Event-ORB fusion tests (System::FuseEventORB / MergeVisualEvent
equivalent): disconnected event chains with their own monocular gauges are
welded into the image trajectory's gauge by the joint pose-graph solve."""

from __future__ import annotations

import numpy as np

from eorb_slam_tpu.slam import fusion


def _pose(t: float) -> np.ndarray:
    """GT Twc at time t: circle + slow yaw."""
    c, s = np.cos(0.3 * t), np.sin(0.3 * t)
    R = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = [np.cos(0.8 * t), 0.15 * t, np.sin(0.8 * t)]
    return T


def _regauge(traj, scale, R_g, t_g):
    """Re-express a (ts, Twc) trajectory in a different Sim3 gauge:
    C' = s R C + t, R_wc' = R_g R_wc."""
    out = []
    for ts, T in traj:
        T2 = np.eye(4)
        T2[:3, :3] = R_g @ T[:3, :3]
        T2[:3, 3] = scale * R_g @ T[:3, 3] + t_g
        out.append((ts, T2))
    return out


def test_interpolate_tcw():
    traj = [(float(t), _pose(float(t))) for t in np.arange(0, 5, 0.5)]
    Tcw = fusion.interpolate_tcw(traj, 1.25)
    gt = np.linalg.inv(_pose(1.25))
    # chord error only: the 0.5 s sampling of a 0.8 rad/s circle bounds it
    assert np.abs(Tcw - gt).max() < 0.05
    # and far better than snapping to the nearest sample
    near = np.linalg.inv(_pose(1.0))
    assert np.abs(Tcw - gt).max() < 0.3 * np.abs(near - gt).max()
    assert fusion.interpolate_tcw(traj, -1.0) is None
    assert fusion.interpolate_tcw(traj, 99.0) is None
    # exact sample returns the exact pose
    Tcw = fusion.interpolate_tcw(traj, 2.0)
    assert np.abs(Tcw - np.linalg.inv(_pose(2.0))).max() < 1e-5


def test_fuse_two_gauged_chains():
    rng = np.random.default_rng(3)
    im = [(float(t), _pose(float(t))) for t in np.arange(0, 8, 0.25)]
    # two disconnected event chains at higher rate, each in its own gauge
    from eorb_slam_tpu.geometry import lie
    import jax.numpy as jnp

    def rot(v):
        return np.asarray(lie.so3_exp(jnp.asarray(v, jnp.float32)), np.float64)

    ch1 = [(float(t), _pose(float(t))) for t in np.arange(0.5, 3.0, 0.1)]
    ch2 = [(float(t), _pose(float(t))) for t in np.arange(5.0, 7.5, 0.1)]
    ev = _regauge(ch1, 0.4, rot([0.1, -0.2, 0.05]), np.asarray([2.0, -1.0, 0.5]))
    ev += _regauge(ch2, 2.5, rot([-0.3, 0.1, 0.2]), np.asarray([-3.0, 0.0, 1.0]))

    res = fusion.fuse_event_orb(im, ev, chain_gap_s=1.0)
    assert res["chains"] == 2
    assert res["anchored"] > 30
    # recovered per-chain gauge scales invert the injected ones
    scales = sorted(g["scale"] for g in res["gauges"])
    assert abs(scales[0] - 1 / 2.5) < 0.05
    assert abs(scales[1] - 1 / 0.4) < 0.1

    # every fused event pose should now sit on the GT trajectory
    kinds = res["kinds"]
    errs = [
        np.linalg.norm(T[:3, 3] - _pose(ts)[:3, 3])
        for (ts, T), k in zip(res["fused"], kinds)
        if k == "ev"
    ]
    assert len(errs) > 40
    assert np.median(errs) < 0.02, np.median(errs)
    # fused output is time-sorted and contains both sets
    ts_all = [ts for ts, _ in res["fused"]]
    assert ts_all == sorted(ts_all)
    assert set(kinds) == {"im", "ev"}


def test_fuse_noisy_chain_pulls_toward_image():
    """With noise on the event chain, anchor edges pull fused event poses
    closer to GT than a rigid per-chain alignment alone would leave them."""
    rng = np.random.default_rng(0)
    im = [(float(t), _pose(float(t))) for t in np.arange(0, 6, 0.2)]
    ev = []
    for t in np.arange(0.5, 5.5, 0.1):
        T = _pose(float(t))
        T = T.copy()
        T[:3, 3] = T[:3, 3] + rng.normal(0, 0.05, 3)
        ev.append((float(t), T))
    res = fusion.fuse_event_orb(im, ev, anchor_weight=3.0, odo_weight=1.0)
    errs = [
        np.linalg.norm(T[:3, 3] - _pose(ts)[:3, 3])
        for (ts, T), k in zip(res["fused"], res["kinds"])
        if k == "ev"
    ]
    raw = [np.linalg.norm(T[:3, 3] - _pose(ts)[:3, 3]) for ts, T in ev]
    assert np.mean(errs) < 0.6 * np.mean(raw), (np.mean(errs), np.mean(raw))


def test_fuse_degenerate_inputs():
    im = [(0.0, np.eye(4)), (1.0, _pose(1.0))]
    assert fusion.fuse_event_orb(im, [])["chains"] == 0
    assert fusion.fuse_event_orb([], [(0.0, np.eye(4))])["fused"]
    # chain entirely outside the image time span -> no gauge, no fuse
    ev = [(float(t), _pose(float(t))) for t in np.arange(10, 11, 0.1)]
    res = fusion.fuse_event_orb(im, ev)
    assert res["chains"] == 0
