"""Continuous event tracker (EvAsynchTrackerU analog): persistent feature
tracks carried by KLT across event images, slot-aligned triangulation,
pose-only GN per image (reference src/Event/EvAsynchTrackerU.cpp:1093-1214).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from eorb_slam_tpu.evals import ate
from eorb_slam_tpu.event import feature_tracks as ft
from eorb_slam_tpu.slam import event_continuous, system as slam_system

from tests.test_event_slam import CAM, EventWorld, make_cfg, H, W


def test_track_store_advance_and_top_up():
    """Tracks survive a pure translation between two synthetic images and
    dead slots are re-seeded without touching live ones."""
    rng = np.random.default_rng(0)
    img0 = np.zeros((H, W), np.float32)
    pts = rng.uniform(20, 140, (40, 2)).astype(np.float32)
    for x, y in pts:
        yi, xi = int(y), int(x)
        img0[yi - 1 : yi + 2, xi - 1 : xi + 2] = 1.0
        img0[yi, xi] = 2.0
    dx = 3.0
    img1 = np.roll(img0, int(dx), axis=1)

    tr = ft.empty_tracks(128)
    tr, n_new = ft.top_up(tr, jnp.asarray(img0))
    assert int(n_new) >= 10
    alive0 = np.asarray(tr.valid).copy()
    xy0 = np.asarray(tr.xy).copy()

    tr2, med = ft.advance(tr, jnp.asarray(img0), jnp.asarray(img1))
    moved = np.asarray(tr2.xy) - xy0
    ok = np.asarray(tr2.valid)
    assert ok.sum() >= 0.6 * alive0.sum()
    assert abs(float(np.median(moved[ok, 0])) - dx) < 0.5
    assert abs(float(np.median(moved[ok, 1]))) < 0.5
    assert abs(float(med) - dx) < 0.6

    # kill half the tracks, top up — survivors' positions untouched
    kill = np.zeros(128, bool)
    kill[::2] = True
    tr3 = tr2._replace(valid=tr2.valid & ~jnp.asarray(kill))
    keep = np.asarray(tr3.valid)
    tr4, n_new = ft.top_up(tr3, jnp.asarray(img1))
    assert int(n_new) > 0
    assert np.allclose(np.asarray(tr4.xy)[keep], np.asarray(tr3.xy)[keep])
    assert np.asarray(tr4.valid)[keep].all()
    # reseeded slots carry no landmark/birth until a keyframe adopts them
    fresh = np.asarray(tr4.valid) & ~keep
    assert (np.asarray(tr4.lm)[fresh] == -1).all()
    assert (np.asarray(tr4.birth_kf)[fresh] == -1).all()


def test_continuous_event_slam_tracks():
    """EVENT_ONLY continuous mode end-to-end: feature-track init + per-image
    pose + slot-aligned mapping; trajectory Sim3-aligns to ground truth."""
    world = EventWorld(n_points=260, seed=5)
    slam = event_continuous.EventSlamContinuous(
        CAM, make_cfg(), n_tracks=256,
        min_init_matches=25, min_track_inliers=8,
        min_init_disp_px=3.0, kf_disp_px=6.0,
    )
    t_end = 2.4
    ev = world.events(0.0, t_end, 160000)
    for k in range(0, len(ev), 8000):
        slam.track_events(ev[k : k + 8000])

    s = slam.stats
    assert s["l2_full"] >= 8, s
    assert s["l2_kf"] >= 3, s
    assert slam.l2.state == slam_system.OK, s
    traj = slam.trajectory_twc()
    assert len(traj) >= 5, s

    gt = [(t, np.linalg.inv(world.pose(t))) for t, _ in traj]
    rmse, n, scale, _, _ = ate.ate_rmse(traj, gt, with_scale=True, max_dt=0.05)
    assert n >= 5
    span = traj[-1][0] - traj[0][0]
    assert rmse < max(0.15, 0.25 * 0.52 * span), (rmse, span, s)
