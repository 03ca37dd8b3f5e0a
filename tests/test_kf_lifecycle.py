"""Keyframe lifecycle: culling, slot reuse, duplicate-landmark fusion.

Covers the reference's KeyFrameCulling (src/LocalMapping.cc:KeyFrameCulling)
and SearchInNeighbors/Fuse (src/ORBmatcher.cc:1407) equivalents: a long
exploration run at small keyframe capacity must keep inserting keyframes
indefinitely (capacity is a sliding window, not a run-length limit) while
the trajectory stays within the ATE gate.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from eorb_slam_tpu.evals import ate
from eorb_slam_tpu.geometry import camera
from eorb_slam_tpu.slam import local_mapping, map_state
from eorb_slam_tpu.slam.system import OK, MonoSlam
from tests.synth import CAM, SynthWorld


@pytest.fixture(scope="module")
def corridor_run():
    """Long corridor: the camera moves ~18 m through landmarks spread along
    the path, far beyond what K=12 keyframes could cover without culling."""
    world = SynthWorld(n_landmarks=4000, seed=3, noise_px=0.4)
    # respread the landmark cloud along the corridor the trajectory follows
    rng = np.random.default_rng(11)
    n = world.lm.shape[0]
    world.lm = np.concatenate(
        [
            rng.uniform(-6, 26, (n, 1)),
            rng.uniform(-4, 4, (n, 1)),
            rng.uniform(4, 18, (n, 1)),
        ],
        axis=1,
    ).astype(np.float32)

    slam = MonoSlam(CAM, K=12, M=4096, N=512, P=8,
                    max_frames_between_kf=6)
    gt = []
    fps = 20.0
    n_frames = 300
    for i in range(n_frames):
        t = i / fps
        f, Tcw_gt = world.frame(t)
        slam.process_features(f)
        gt.append((t, np.linalg.inv(Tcw_gt)))
    return slam, gt


def test_culling_fires_and_slots_reused(corridor_run):
    slam, _ = corridor_run
    assert slam.state == OK
    assert slam.kf_culled > 0, "KeyFrameCulling never fired on a long run"
    assert slam.n_kf <= slam.map.K
    # total keyframes ever inserted exceeds capacity -> slots were reused
    assert slam._kf_seq_next > slam.map.K


def test_keeps_inserting_keyframes(corridor_run):
    slam, gt = corridor_run
    # the newest keyframe must be recent (not stuck at the capacity point)
    ts_last_kf = float(np.asarray(slam.map.kf_ts)[slam.last_kf_slot])
    assert ts_last_kf > gt[-1][0] - 1.0, (
        f"last KF at t={ts_last_kf:.2f}, sequence ends {gt[-1][0]:.2f}"
    )


def test_corridor_ate_gate(corridor_run):
    slam, gt = corridor_run
    est = slam.trajectory_twc()
    assert len(est) > 0.9 * (len(gt) - 2)
    rmse, n, s, _, _ = ate.ate_rmse(est, gt, with_scale=True)
    # ~18 m corridor without loop closure: gate at 2% of path length
    assert n > 250
    assert rmse < 0.36, f"ATE RMSE {rmse:.4f} m over {n} poses"


def test_map_state_invariants_after_culling(corridor_run):
    slam, _ = corridor_run
    m = slam.map
    kv = np.asarray(m.kf_valid)
    active = sorted(slam._kf_order)
    assert sorted(np.flatnonzero(kv).tolist()) == active
    # no valid observation may reference an invalid keyframe
    obs_kf = np.asarray(m.obs_kf)
    obs_valid = np.asarray(m.obs_valid)
    assert kv[obs_kf[obs_valid]].all()
    # lm_nobs consistent with the observation table
    assert (np.asarray(m.lm_nobs) == obs_valid.sum(1)).all()
    # feature->landmark links only point at valid landmarks
    fl = np.asarray(m.kf_feat_lm)
    lv = np.asarray(m.lm_valid)
    assert lv[fl[fl >= 0]].all()


def test_remove_keyframe_unit():
    """Culling a keyframe drops its observations and starves landmarks
    below two observations."""
    world = SynthWorld(n_landmarks=1200, seed=5)
    slam = MonoSlam(CAM, K=16, M=2048, N=512, P=8)
    for i in range(40):
        f, _ = world.frame(i / 20.0)
        slam.process_features(f)
    assert slam.n_kf >= 4
    m = slam.map
    victim = slam._kf_order[1]
    n_lm_before = int(np.asarray(m.lm_valid).sum())
    m2 = map_state.remove_keyframe(m, jnp.asarray(victim))
    assert not bool(m2.kf_valid[victim])
    obs_valid = np.asarray(m2.obs_valid)
    assert not (np.asarray(m2.obs_kf)[obs_valid] == victim).any()
    # two-obs landmarks founded by (victim, other) must be gone
    assert int(np.asarray(m2.lm_valid).sum()) <= n_lm_before


def test_fuse_duplicates_unit():
    """Two landmarks for the same 3D point (same descriptor, projecting to
    the same pixel) are merged: loser invalidated, links redirected, the
    loser's observations rewired into the winner's row."""
    cam = camera.make_pinhole(300.0, 300.0, 160.0, 120.0)
    m = map_state.empty_map(K=4, M=16, N=8, P=4)
    X = np.asarray([0.1, -0.2, 5.0], np.float32)
    rng = np.random.default_rng(0)
    desc = (rng.integers(0, 2, 256).astype(np.int8) * 2 - 1)

    T0 = np.eye(4, dtype=np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T1[0, 3] = -0.3  # camera shifted +x

    def proj(T, X):
        pc = T[:3, :3] @ X + T[:3, 3]
        return np.asarray([300.0 * pc[0] / pc[2] + 160.0,
                           300.0 * pc[1] / pc[2] + 120.0], np.float32)

    kf_xy = np.zeros((4, 8, 2), np.float32)
    kf_xy[0, 0] = proj(T0, X)
    kf_xy[1, 0] = proj(T1, X)
    kf_feat_valid = np.zeros((4, 8), bool)
    kf_feat_valid[0, 0] = True
    kf_feat_valid[1, 0] = True
    kf_feat_lm = np.full((4, 8), -1, np.int32)
    kf_feat_lm[0, 0] = 0   # landmark B (older duplicate)
    kf_feat_lm[1, 0] = 1   # landmark A (fresh duplicate)
    kf_desc = np.zeros((4, 8, 256), np.int8)
    kf_desc[0, 0] = desc
    kf_desc[1, 0] = desc

    lm_pos = np.zeros((16, 3), np.float32)
    lm_pos[0] = X + 0.01
    lm_pos[1] = X
    lm_valid = np.zeros(16, bool)
    lm_valid[:2] = True
    lm_desc = np.zeros((16, 256), np.int8)
    lm_desc[0] = desc
    lm_desc[1] = desc
    obs_kf = np.zeros((16, 4), np.int32)
    obs_feat = np.zeros((16, 4), np.int32)
    obs_valid = np.zeros((16, 4), bool)
    # lm0 observed twice from KF0; lm1 three times from KF1 (winner)
    obs_kf[0, :2] = [0, 0]; obs_feat[0, :2] = [0, 1]; obs_valid[0, :2] = True
    obs_kf[1, :3] = [1, 1, 1]; obs_feat[1, :3] = [0, 1, 2]
    obs_valid[1, :3] = True

    m = m._replace(
        kf_T=jnp.asarray(np.stack([T0, T1, np.eye(4), np.eye(4)])),
        kf_valid=jnp.asarray([True, True, False, False]),
        kf_xy=jnp.asarray(kf_xy),
        kf_feat_valid=jnp.asarray(kf_feat_valid),
        kf_feat_lm=jnp.asarray(kf_feat_lm),
        kf_desc_pm1=jnp.asarray(kf_desc),
        lm_pos=jnp.asarray(lm_pos), lm_valid=jnp.asarray(lm_valid),
        lm_desc_pm1=jnp.asarray(lm_desc),
        lm_nobs=jnp.asarray(obs_valid.sum(1), jnp.int32),
        obs_kf=jnp.asarray(obs_kf), obs_feat=jnp.asarray(obs_feat),
        obs_valid=jnp.asarray(obs_valid),
    )

    m2, n_fused = local_mapping.fuse_duplicates(
        m, cam, jnp.asarray(1), jnp.asarray(0)
    )
    assert int(n_fused) == 1
    assert not bool(m2.lm_valid[0]), "loser landmark must be invalidated"
    assert bool(m2.lm_valid[1])
    # loser's 2 observations rewired into the winner's row: 3 + 2 = 5 > P=4
    # capped at P
    assert int(m2.lm_nobs[1]) == 4
    # every feature link now points at the winner
    assert int(m2.kf_feat_lm[0, 0]) == 1
    assert int(m2.kf_feat_lm[1, 0]) == 1
