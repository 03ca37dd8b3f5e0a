"""Optimizer tests: pose-only GN and Schur-complement BA on analytic scenes."""

import jax
import jax.numpy as jnp
import numpy as np

from eorb_slam_tpu.geometry import camera, lie
from eorb_slam_tpu.optim import pose_only, schur_ba

RNG = np.random.default_rng(7)
CAM = camera.make_pinhole(458.0, 457.0, 376.0, 240.0)


def make_scene(K=6, M=64, noise_px=0.5, seed=3):
    rng = np.random.default_rng(seed)
    lm = np.concatenate([rng.uniform(-2, 2, (M, 2)), rng.uniform(4, 8, (M, 1))], 1)
    Ts = []
    for k in range(K):
        t = np.array([0.4 * k, 0.05 * np.sin(k), 0.0])
        R = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.02 * k, 0.0], jnp.float32)))
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = -R @ t
        Ts.append(T)
    Ts = np.stack(Ts).astype(np.float32)
    pc = np.asarray(
        jax.vmap(lambda T: lie.se3_apply(T, jnp.asarray(lm, jnp.float32)))(
            jnp.asarray(Ts)
        )
    )
    uv = np.asarray(
        jax.vmap(lambda p: camera.pinhole_project_linear(CAM, p))(jnp.asarray(pc))
    )
    obs_uv = np.transpose(uv, (1, 0, 2)) + rng.normal(0, noise_px, (M, K, 2))
    return lm.astype(np.float32), Ts, obs_uv.astype(np.float32)


def test_pose_only_recovers_perturbation():
    lm, Ts, obs = make_scene()
    pert = lie.se3_exp(jnp.asarray([0.1, -0.08, 0.05, 0.02, 0.03, -0.01], jnp.float32))
    T0 = pert @ jnp.asarray(Ts[3])
    Tcw, inlier, n = pose_only.pose_optimization(
        CAM, T0, jnp.asarray(lm), jnp.asarray(obs[:, 3]),
        jnp.ones(lm.shape[0]), jnp.ones(lm.shape[0], bool),
    )
    err = lie.se3_log(jnp.linalg.inv(Tcw) @ jnp.asarray(Ts[3]))
    assert int(n) == lm.shape[0]
    assert float(jnp.linalg.norm(err[:3])) < 0.02
    assert float(jnp.linalg.norm(err[3:])) < 0.005


def test_pose_only_rejects_outliers():
    lm, Ts, obs = make_scene(noise_px=0.3)
    obs3 = obs[:, 3].copy()
    obs3[:10] += 40.0  # gross outliers
    Tcw, inlier, n = pose_only.pose_optimization(
        CAM, jnp.asarray(Ts[3]), jnp.asarray(lm), jnp.asarray(obs3),
        jnp.ones(lm.shape[0]), jnp.ones(lm.shape[0], bool),
    )
    inl = np.asarray(inlier)
    assert not inl[:10].any(), "gross outliers must be rejected"
    assert inl[10:].all(), "clean observations must stay inliers"


def test_pose_only_invalid_slots_ignored():
    lm, Ts, obs = make_scene()
    valid = np.ones(lm.shape[0], bool)
    valid[::2] = False
    # corrupt the invalid slots entirely — they must not affect the result
    obs3 = obs[:, 3].copy()
    obs3[::2] = 1e6
    Tcw, inlier, n = pose_only.pose_optimization(
        CAM, jnp.asarray(Ts[3]), jnp.asarray(lm), jnp.asarray(obs3),
        jnp.ones(lm.shape[0]), jnp.asarray(valid),
    )
    err = lie.se3_log(jnp.linalg.inv(Tcw) @ jnp.asarray(Ts[3]))
    assert float(jnp.linalg.norm(err)) < 0.02
    assert not np.asarray(inlier)[::2].any()


def _make_problem(lm, Ts, obs, kf_fixed, lm0=None, Ts0=None):
    M, K = obs.shape[:2]
    return schur_ba.BAProblem(
        cam_params=CAM,
        kf_T=jnp.asarray(Ts0 if Ts0 is not None else Ts),
        kf_fixed=jnp.asarray(kf_fixed),
        kf_valid=jnp.ones(K, bool),
        lm_pos=jnp.asarray(lm0 if lm0 is not None else lm),
        lm_valid=jnp.ones(M, bool),
        obs_kf=jnp.tile(np.arange(K, dtype=np.int32), (M, 1)),
        obs_uv=jnp.asarray(obs),
        obs_inv_sigma=jnp.ones((M, K)),
        obs_valid=jnp.ones((M, K), bool),
    )


def test_ba_converges_to_noise_floor():
    lm, Ts, obs = make_scene(K=6, M=64, noise_px=0.5)
    rng = np.random.default_rng(11)
    Ts0 = Ts.copy()
    for k in range(2, 6):
        Ts0[k] = np.asarray(
            lie.se3_exp(jnp.asarray(rng.normal(0, 0.02, 6), jnp.float32))
        ) @ Ts0[k]
    lm0 = lm + rng.normal(0, 0.05, lm.shape).astype(np.float32)
    fixed = np.array([True, True, False, False, False, False])
    prob = _make_problem(lm, Ts, obs, fixed, lm0=lm0, Ts0=Ts0)
    res = schur_ba.bundle_adjust(prob, iters=15)
    n_obs = obs.shape[0] * obs.shape[1]
    assert float(res.cost) < float(res.cost0) / 20.0
    # noise floor: E[chi2] ~ 2 sigma^2 per obs = 0.5 per obs here
    assert float(res.cost) < 1.2 * n_obs
    # gauge fixed
    np.testing.assert_allclose(np.asarray(res.kf_T[:2]), Ts[:2], atol=1e-6)
    # free poses recovered
    for k in range(2, 6):
        err = lie.se3_log(jnp.linalg.inv(res.kf_T[k]) @ jnp.asarray(Ts[k]))
        assert float(jnp.linalg.norm(err)) < 0.03


def test_ba_masks_are_respected():
    lm, Ts, obs = make_scene(K=4, M=32)
    fixed = np.array([True, False, False, False])
    prob = _make_problem(lm, Ts, obs, fixed)
    # invalidate half the landmarks with corrupted positions
    lm_bad = np.asarray(prob.lm_pos).copy()
    lm_bad[16:] = 1e3
    lm_valid = np.ones(32, bool)
    lm_valid[16:] = False
    res = schur_ba.bundle_adjust(
        prob._replace(lm_pos=jnp.asarray(lm_bad), lm_valid=jnp.asarray(lm_valid)),
        iters=5,
    )
    assert np.isfinite(np.asarray(res.kf_T)).all()
    # invalid landmarks unchanged
    np.testing.assert_allclose(np.asarray(res.lm_pos[16:]), lm_bad[16:])


def test_ba_empty_problem_is_safe():
    lm, Ts, obs = make_scene(K=4, M=32)
    prob = _make_problem(lm, Ts, obs, np.zeros(4, bool))._replace(
        obs_valid=jnp.zeros((32, 4), bool)
    )
    res = schur_ba.bundle_adjust(prob, iters=3)
    assert np.isfinite(np.asarray(res.kf_T)).all()
    assert float(res.cost) == 0.0


class TestSchurPiecesParity:
    def test_fast_path_matches_einsum_reference(self):
        import importlib.util as _il

        spec = _il.spec_from_file_location("benchmod", "bench.py")
        bench = _il.module_from_spec(spec)
        spec.loader.exec_module(bench)
        p = bench.make_problem(K=6, M=128, P=4, seed=3)
        lam = jnp.asarray(3e-4, jnp.float32)
        for huber in (True, False):
            args = (p, p.kf_T, p.lm_pos, lam, jnp.asarray(huber))
            fast = schur_ba._schur_pieces(*args)
            ref = schur_ba._schur_pieces_ref(*args)
            # f32 reduction order differs (one big matmul vs einsum), so
            # compare relative to each tensor's norm, not elementwise; b_s
            # additionally suffers b_c - Y b_l cancellation of ~1e5-scale
            # operands. A real layout/index bug shows up as O(1) relative
            # error, far above this tolerance.
            for f, r in zip(fast, ref):
                f, r = np.asarray(f), np.asarray(r)
                scale = max(float(np.abs(r).max()), 1.0)
                assert np.abs(f - r).max() <= 3e-4 * scale + 1e-3
