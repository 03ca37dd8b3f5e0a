"""Checkpoint/resume: exact state round-trip + continued tracking
(§5.4 upgrade — the reference's SaveAtlas/LoadAtlas are commented out)."""

from __future__ import annotations

import numpy as np

from eorb_slam_tpu.io import checkpoint
from eorb_slam_tpu.slam import system as slam_system
from tests import synth


def test_checkpoint_roundtrip_and_resume(tmp_path):
    world = synth.SynthWorld(seed=21)
    slam = slam_system.MonoSlam(synth.CAM, min_init_matches=60)
    for t in np.arange(0.0, 1.2, 0.1):
        f, _ = world.frame(float(t))
        slam.process_features(f)
    assert slam.state == slam_system.OK

    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_slam(path, slam)

    # restore into a FRESH system and compare state exactly
    slam2 = slam_system.MonoSlam(synth.CAM, min_init_matches=60)
    checkpoint.load_slam(path, slam2)
    assert slam2.n_kf == slam.n_kf
    assert slam2.state == slam.state
    # exact-restore extras: PRNG state and recovery counters round-trip
    np.testing.assert_array_equal(np.asarray(slam2.key), np.asarray(slam.key))
    assert slam2.lost_frames == slam.lost_frames
    np.testing.assert_array_equal(
        np.asarray(slam2.map.lm_pos), np.asarray(slam.map.lm_pos)
    )
    np.testing.assert_array_equal(
        np.asarray(slam2.map.kf_T), np.asarray(slam.map.kf_T)
    )
    assert len(slam2.trajectory_twc()) == len(slam.trajectory_twc())

    # both must track the NEXT frames identically (deterministic resume)
    for t in np.arange(1.2, 1.6, 0.1):
        f, _ = world.frame(float(t), seed=int(t * 1000))
        r1 = slam.process_features(f)
        f2, _ = world.frame(float(t), seed=int(t * 1000))
        r2 = slam2.process_features(f2)
        assert r1["state"] == r2["state"] == slam_system.OK
    np.testing.assert_allclose(
        np.asarray(slam.T_last), np.asarray(slam2.T_last), atol=1e-5
    )


def test_checkpoint_not_initialized_keeps_init_frame(tmp_path):
    """A checkpoint taken in NOT_INITIALIZED must keep the pending reference
    frame so resume initializes from the same two views."""
    world = synth.SynthWorld(seed=22)
    slam = slam_system.MonoSlam(synth.CAM, min_init_matches=60)
    f0, _ = world.frame(0.0)
    slam.process_features(f0)
    assert slam.state == slam_system.NOT_INITIALIZED
    assert slam._init_frame is not None

    path = str(tmp_path / "ckpt0.npz")
    checkpoint.save_slam(path, slam)
    slam2 = slam_system.MonoSlam(synth.CAM, min_init_matches=60)
    checkpoint.load_slam(path, slam2)
    assert slam2._init_frame is not None
    assert slam2._init_frame.ts == slam._init_frame.ts
    np.testing.assert_array_equal(
        np.asarray(slam2._init_frame.xy_ud), np.asarray(slam._init_frame.xy_ud)
    )

    # both initialize identically on the same second view
    f1, _ = world.frame(0.4)
    r1 = slam.process_features(f1)
    f1b, _ = world.frame(0.4)
    r2 = slam2.process_features(f1b)
    assert r1["state"] == r2["state"]
