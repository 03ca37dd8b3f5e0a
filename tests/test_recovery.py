"""Failure recovery: RECENTLY_LOST grace, relocalization, Atlas multi-map
(reference src/Tracking.cc:898-970, :1206-1224, :2641-2730)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from eorb_slam_tpu.slam import system as slam_system
from eorb_slam_tpu.slam.system import FrameInput
from tests import synth


def garbage_frame(ts: float, n_slots=512, seed=0) -> FrameInput:
    rng = np.random.default_rng(seed)
    return FrameInput(
        ts=ts,
        xy_ud=jnp.asarray(rng.uniform((0, 0), (synth.W, synth.H), (n_slots, 2)),
                          jnp.float32),
        octave=jnp.zeros(n_slots, jnp.int32),
        angle=jnp.zeros(n_slots, jnp.float32),
        desc_pm1=jnp.asarray(synth.random_descriptors(n_slots, seed + 7)),
        valid=jnp.ones(n_slots, bool),
    )


def run_frames(slam, world, t0, t1, dt=0.1):
    for t in np.arange(t0, t1, dt):
        f, _ = world.frame(float(t))
        slam.process_features(f)


def test_relocalization_after_blackout():
    world = synth.SynthWorld(seed=11)
    slam = slam_system.MonoSlam(synth.CAM, min_init_matches=60)
    run_frames(slam, world, 0.0, 1.6)
    assert slam.state == slam_system.OK
    T_before = np.asarray(slam.T_last)

    # blackout: a few frames of pure clutter -> tracking must fail
    out = None
    for k in range(3):
        out = slam.process_features(garbage_frame(1.6 + 0.1 * k, seed=k))
    assert slam.stats["lost"] >= 1

    # return to a seen viewpoint: global reloc should snap back without a
    # new map
    f, Tcw_gt = world.frame(1.55)
    out = slam.process_features(f)
    assert out.get("reloc", False) or out["state"] == slam_system.OK
    assert slam.atlas.n_maps() == 1
    # pose error small vs ground truth (same gauge as before the blackout)
    T_est = np.asarray(slam.T_last)
    # compare camera centers up to the map's scale gauge
    c_est = -T_est[:3, :3].T @ T_est[:3, 3]
    c_bef = -T_before[:3, :3].T @ T_before[:3, 3]
    assert np.linalg.norm(c_est - c_bef) < 1.0


def test_atlas_new_map_after_long_loss():
    world = synth.SynthWorld(seed=12)
    slam = slam_system.MonoSlam(synth.CAM, min_init_matches=60)
    slam.lost_grace = 2
    run_frames(slam, world, 0.0, 1.4)
    assert slam.state == slam_system.OK
    n_traj_before = len(slam.trajectory_twc())
    assert n_traj_before > 0

    # long blackout in an unseen area -> exhaust grace -> new map
    for k in range(12):
        slam.process_features(garbage_frame(2.0 + 0.1 * k, seed=100 + k))
    assert slam.state in (slam_system.NOT_INITIALIZED, slam_system.LOST)

    # reinitialize in a different part of the world
    world2 = synth.SynthWorld(seed=13)
    run_frames(slam, world2, 0.0, 1.4)
    assert slam.state == slam_system.OK
    # old trajectory persisted (frozen), new map active
    assert len(slam.trajectory_twc()) > n_traj_before
    assert slam.n_kf >= 2
