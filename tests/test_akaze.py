"""AKAZE + mixed-mode tests: nonlinear scale space, Hessian detection,
MLDB-256 descriptors, channel-gated matching, MixedMonoSlam e2e
(reference AKAZEextractor/MixedFrame/MixedMatcher capability)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from eorb_slam_tpu.ops import akaze, frontend, matching, pyramid

from tests.test_event_slam import EventWorld, H, W
from tests.test_ev_image_slam import render_frame


@pytest.fixture(scope="module")
def textured_world():
    return EventWorld(n_points=260, seed=21)


@pytest.fixture(scope="module")
def img0(textured_world):
    return jnp.asarray(render_frame(textured_world, 0.0), jnp.float32)


def test_diffusion_preserves_edges(img0):
    """Nonlinear diffusion smooths flat noise but keeps edge contrast
    better than the Gaussian blur of comparable smoothing."""
    rng = np.random.default_rng(0)
    step = np.zeros((96, 96), np.float32)
    step[:, 48:] = 1.0
    noisy = step + rng.normal(0, 0.05, step.shape).astype(np.float32)
    x = jnp.asarray(noisy)
    k = akaze.contrast_k(x)
    diff = np.asarray(akaze.diffuse(x, k, steps=12))
    gaus = np.asarray(pyramid.gaussian_blur(x, ksize=7, sigma=2.0))
    assert np.isfinite(diff).all()
    # noise in the flat halves is reduced
    assert diff[:, :30].std() < 0.6 * noisy[:, :30].std()
    # the step edge stays sharper than under Gaussian blur
    edge_d = np.abs(np.diff(diff[48, 40:56])).max()
    edge_g = np.abs(np.diff(gaus[48, 40:56])).max()
    assert edge_d > edge_g


def test_extract_akaze_finds_blobs(img0):
    feats = akaze.extract_akaze(img0, max_kp=256)
    n = int(np.asarray(feats.valid).sum())
    assert n >= 60, n
    xy = np.asarray(feats.xy)[np.asarray(feats.valid)]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < W).all()
    assert np.asarray(feats.desc).dtype == np.uint32
    # descriptors are not degenerate: bit variance across keypoints
    pm = np.asarray(feats.desc_pm1)[np.asarray(feats.valid)]
    assert 40 < (pm > 0).sum(1).mean() < 216


def test_akaze_matching_across_views(textured_world):
    """Two nearby views match via MLDB descriptors with plausible flow."""
    f0 = akaze.extract_akaze(
        jnp.asarray(render_frame(textured_world, 0.0), jnp.float32), max_kp=256
    )
    f1 = akaze.extract_akaze(
        jnp.asarray(render_frame(textured_world, 0.12), jnp.float32), max_kp=256
    )
    pair = matching.window_mask(f0.xy, f1.xy, 25.0)
    m12, d = matching.match_nnratio(
        f0.desc_pm1, f0.valid, f1.desc_pm1, f1.valid,
        pair_mask=pair, max_dist=80, nn_ratio=0.85,
    )
    m = np.asarray(m12)
    n = (m >= 0).sum()
    assert n >= 25, n
    # matched displacement is small (the views are 0.12 s apart)
    xy0 = np.asarray(f0.xy)[m >= 0]
    xy1 = np.asarray(f1.xy)[m[m >= 0]]
    med = np.median(np.linalg.norm(xy1 - xy0, axis=1))
    assert med < 15.0, med


def test_mldb_rotation_tolerance(img0):
    """Descriptors of the same physical points survive a 90-degree image
    rotation (orientation normalization does the work)."""
    img_r = jnp.rot90(img0)
    f0 = akaze.extract_akaze(img0, max_kp=192)
    f1 = akaze.extract_akaze(img_r, max_kp=192)
    # map f0 keypoints into rotated coords: (x,y) -> (y, W-1-x)
    xy0 = np.asarray(f0.xy)
    xy0_r = np.stack([xy0[:, 1], W - 1 - xy0[:, 0]], axis=1)
    pair = matching.window_mask(jnp.asarray(xy0_r), f1.xy, 4.0)
    m12, d = matching.match_nnratio(
        f0.desc_pm1, f0.valid, f1.desc_pm1, f1.valid,
        pair_mask=pair, max_dist=90, nn_ratio=0.95, mutual=False,
    )
    n_geom = int(np.asarray(pair & (f0.valid[:, None] & f1.valid[None, :])).any(1).sum())
    n_match = int((np.asarray(m12) >= 0).sum())
    assert n_geom >= 20
    # at least half of geometrically-repeatable points match by descriptor
    assert n_match >= 0.5 * n_geom, (n_match, n_geom)


def test_extract_mixed_channels(img0):
    feats, ch = frontend.extract_mixed(img0, max_kp=256, orb_frac=0.5)
    ch = np.asarray(ch)
    assert (ch[:128] == 0).all() and (ch[128:] == 1).all()
    v = np.asarray(feats.valid)
    assert v[:128].sum() >= 40 and v[128:].sum() >= 40
    # channel mask blocks cross-channel pairs
    cm = np.asarray(matching.channel_mask(jnp.asarray(ch), jnp.asarray(ch)))
    assert cm[:128, :128].all() and not cm[:128, 128:].any()


def test_mixed_mono_slam(textured_world):
    from eorb_slam_tpu.slam.system import MixedMonoSlam, OK
    from eorb_slam_tpu.evals import ate
    from tests.test_event_slam import CAM

    slam = MixedMonoSlam(
        CAM, img_w=W, img_h=H, N=384, K=16, M=2048,
        min_init_matches=30, min_track_inliers=8,
    )
    for t in np.arange(0.0, 1.6, 1 / 12.0):
        img = jnp.asarray(render_frame(textured_world, float(t)), jnp.float32)
        slam.process_image(img, float(t))
    assert slam.stats["kf"] >= 2, slam.stats
    traj = slam.trajectory_twc()
    assert len(traj) >= 10
    gt = [(t, np.linalg.inv(textured_world.pose(t))) for t, _ in traj]
    rmse, n, _, _, _ = ate.ate_rmse(traj, gt, with_scale=True, max_dt=0.05)
    assert n >= 8 and rmse < 0.12, (rmse, slam.stats)
