"""IMU stack tests: preintegration vs analytic motion, bias Jacobians,
dead-reckoning, inertial-only init (gravity/scale/bias), VI-BA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eorb_slam_tpu.geometry import camera, lie
from eorb_slam_tpu.imu import preintegration as pre_mod
from eorb_slam_tpu.optim import inertial, vi_ba, schur_ba

G_W = np.asarray([0.0, 0.0, -9.81])
OMEGA = np.asarray([0.12, -0.2, 0.35])


def traj_pos(t):
    return np.stack([np.sin(t), 0.5 * np.cos(2 * t), 0.1 * t], axis=-1)


def traj_vel(t):
    return np.stack([np.cos(t), -np.sin(2 * t), 0.1 * np.ones_like(t)], axis=-1)


def traj_acc_w(t):
    return np.stack(
        [-np.sin(t), -2 * np.cos(2 * t), np.zeros_like(t)], axis=-1
    )


def traj_R(t):
    return np.asarray(lie.so3_exp(jnp.asarray(OMEGA * t, jnp.float32)))


def imu_samples(t0, t1, hz=500.0, bg=np.zeros(3), ba=np.zeros(3)):
    """Ideal gyro/acc measurements on [t0, t1) + additive biases."""
    n = int(round((t1 - t0) * hz))
    ts = t0 + np.arange(n) / hz
    gyro = np.tile(OMEGA, (n, 1)) + bg
    acc = np.stack(
        [traj_R(t).T @ (traj_acc_w(np.asarray(t)) - G_W) for t in ts]
    ) + ba
    dts = np.full(n, 1.0 / hz)
    return (
        jnp.asarray(gyro, jnp.float32),
        jnp.asarray(acc, jnp.float32),
        jnp.asarray(dts, jnp.float32),
        jnp.ones(n, bool),
    )


def state(t):
    return traj_R(t), traj_pos(np.asarray(t)), traj_vel(np.asarray(t))


CALIB = pre_mod.make_calib()


class TestPreintegration:
    def test_predict_matches_analytic(self):
        t0, t1 = 0.3, 0.8
        gyro, acc, dts, ok = imu_samples(t0, t1)
        pre = pre_mod.integrate(gyro, acc, dts, ok,
                                jnp.zeros(3), jnp.zeros(3), CALIB)
        R0, p0, v0 = state(t0)
        R2, p2, v2 = pre_mod.predict_state(
            jnp.asarray(R0, jnp.float32), jnp.asarray(p0, jnp.float32),
            jnp.asarray(v0, jnp.float32), pre, jnp.zeros(3), jnp.zeros(3),
        )
        R1, p1, v1 = state(t1)
        assert np.allclose(np.asarray(R2), R1, atol=3e-3)
        assert np.allclose(np.asarray(p2), p1, atol=5e-3)
        assert np.allclose(np.asarray(v2), v1, atol=1e-2)

    def test_masked_samples_are_skipped(self):
        gyro, acc, dts, ok = imu_samples(0.0, 0.5)
        n = gyro.shape[0]
        # pad with garbage marked invalid
        gyro2 = jnp.concatenate([gyro, jnp.full((32, 3), 99.0)])
        acc2 = jnp.concatenate([acc, jnp.full((32, 3), -99.0)])
        dts2 = jnp.concatenate([dts, jnp.full(32, 0.01)])
        ok2 = jnp.concatenate([ok, jnp.zeros(32, bool)])
        p1 = pre_mod.integrate(gyro, acc, dts, ok,
                               jnp.zeros(3), jnp.zeros(3), CALIB)
        p2 = pre_mod.integrate(gyro2, acc2, dts2, ok2,
                               jnp.zeros(3), jnp.zeros(3), CALIB)
        assert np.allclose(p1.dP, p2.dP, atol=1e-6)
        assert np.allclose(p1.dR, p2.dR, atol=1e-6)
        assert float(p1.dt) == pytest.approx(float(p2.dt), abs=1e-6)

    def test_bias_jacobian_first_order(self):
        bg_true = np.asarray([0.02, -0.01, 0.015])
        ba_true = np.asarray([0.1, 0.05, -0.08])
        gyro, acc, dts, ok = imu_samples(0.0, 0.5, bg=bg_true, ba=ba_true)
        # integrate believing bias = 0, then correct to the true bias
        pre0 = pre_mod.integrate(gyro, acc, dts, ok,
                                 jnp.zeros(3), jnp.zeros(3), CALIB)
        dR_c, dV_c, dP_c = pre_mod.delta_corrected(
            pre0, jnp.asarray(bg_true, jnp.float32),
            jnp.asarray(ba_true, jnp.float32),
        )
        # ground truth: integrate with the true bias from the start
        pre1 = pre_mod.integrate(gyro, acc, dts, ok,
                                 jnp.asarray(bg_true, jnp.float32),
                                 jnp.asarray(ba_true, jnp.float32), CALIB)
        assert np.allclose(np.asarray(dR_c), np.asarray(pre1.dR), atol=2e-4)
        assert np.allclose(np.asarray(dV_c), np.asarray(pre1.dV), atol=2e-3)
        assert np.allclose(np.asarray(dP_c), np.asarray(pre1.dP), atol=1e-3)

    def test_merge_equals_joint_integration(self):
        g1, a1, d1, o1 = imu_samples(0.0, 0.4)
        g2, a2, d2, o2 = imu_samples(0.4, 0.9)
        pa = pre_mod.integrate(g1, a1, d1, o1, jnp.zeros(3), jnp.zeros(3), CALIB)
        pb = pre_mod.integrate(g2, a2, d2, o2, jnp.zeros(3), jnp.zeros(3), CALIB)
        pm = pre_mod.merge(pa, pb)
        pj = pre_mod.integrate(
            jnp.concatenate([g1, g2]), jnp.concatenate([a1, a2]),
            jnp.concatenate([d1, d2]), jnp.concatenate([o1, o2]),
            jnp.zeros(3), jnp.zeros(3), CALIB,
        )
        assert np.allclose(pm.dR, pj.dR, atol=1e-5)
        assert np.allclose(pm.dV, pj.dV, atol=1e-4)
        assert np.allclose(pm.dP, pj.dP, atol=1e-4)

    def test_covariance_psd_and_grows(self):
        gyro, acc, dts, ok = imu_samples(0.0, 1.0)
        pre = pre_mod.integrate(gyro, acc, dts, ok,
                                jnp.zeros(3), jnp.zeros(3), CALIB)
        C = np.asarray(pre.C)
        evals = np.linalg.eigvalsh(0.5 * (C + C.T))
        assert evals.min() > -1e-10
        assert evals.max() > 0
        info = pre_mod.information_9(pre)
        assert np.isfinite(np.asarray(info)).all()


def _kf_preintegrations(kf_times, bg=np.zeros(3), ba=np.zeros(3)):
    pres = []
    for k in range(len(kf_times)):
        if k == 0:
            pres.append(pre_mod.identity_preintegrated())
        else:
            g, a, d, o = imu_samples(kf_times[k - 1], kf_times[k],
                                     bg=bg, ba=ba)
            pres.append(
                pre_mod.integrate(g, a, d, o, jnp.zeros(3), jnp.zeros(3),
                                  CALIB)
            )
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)


class TestInertialInit:
    def test_recovers_gravity_scale_bias(self):
        # vision world = inertial world rotated by R_vw and scaled by 1/s
        s_true = 2.5
        R_vw = np.asarray(lie.so3_exp(jnp.asarray([0.25, -0.15, 0.0],
                                                  jnp.float32)))
        bg_true = np.asarray([0.01, -0.02, 0.005])
        ba_true = np.asarray([0.05, -0.03, 0.08])
        kf_times = np.arange(8) * 0.4 + 0.1
        K = len(kf_times)
        Twb = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        for k, t in enumerate(kf_times):
            R, p, _ = state(t)
            Twb[k, :3, :3] = R_vw @ R
            Twb[k, :3, 3] = (1.0 / s_true) * R_vw @ p
        pre_stack = _kf_preintegrations(kf_times, bg=bg_true, ba=ba_true)
        edge_valid = jnp.asarray([False] + [True] * (K - 1))

        res = inertial.inertial_init(
            jnp.asarray(Twb), pre_stack, edge_valid,
            prior_gyro=1e2, prior_acc=1.0, iters=60,
        )
        assert float(res.cost) < float(res.cost0)
        assert float(res.scale) == pytest.approx(s_true, rel=0.02)
        g_est = np.asarray(res.g)
        g_expected = R_vw @ G_W
        cos = g_est @ g_expected / (
            np.linalg.norm(g_est) * np.linalg.norm(g_expected)
        )
        assert cos > 0.9995
        assert np.allclose(np.asarray(res.bg), bg_true, atol=2e-3)
        # acc bias is weakly observable over short windows; direction-level
        assert np.linalg.norm(np.asarray(res.ba) - ba_true) < 0.08


def _make_vi_problem(K=6, M=96, noise_uv=0.3, perturb=True, seed=0):
    rng = np.random.default_rng(seed)
    cam = camera.make_pinhole(458.0, 457.0, 376.0, 240.0)
    kf_times = np.arange(K) * 0.35 + 0.2
    Tbc = np.eye(4, dtype=np.float32)

    Twb = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    vel = np.zeros((K, 3), np.float32)
    for k, t in enumerate(kf_times):
        R, p, v = state(t)
        Twb[k, :3, :3] = R
        Twb[k, :3, 3] = p
        vel[k] = v
    Tcw = np.stack([
        np.asarray(pre_mod.Tcw_from_Twb(jnp.asarray(Twb[k]),
                                        jnp.asarray(Tbc)))
        for k in range(K)
    ])

    # landmarks in front of all cameras (cameras look roughly +z at t~0)
    lm = np.concatenate(
        [rng.uniform(-4, 4, (M, 2)), rng.uniform(5, 12, (M, 1))], axis=1
    ).astype(np.float32)

    P = K
    obs_kf = np.tile(np.arange(K, dtype=np.int32), (M, 1))
    pc = np.einsum("kij,mj->mki", Tcw[:, :3, :3], lm) + Tcw[:, :3, 3][None]
    uv = np.stack([
        458.0 * pc[..., 0] / pc[..., 2] + 376.0,
        457.0 * pc[..., 1] / pc[..., 2] + 240.0,
    ], axis=-1)
    obs_valid = (pc[..., 2] > 0.2) & (np.abs(uv[..., 0] - 376) < 450) \
        & (np.abs(uv[..., 1] - 240) < 300)
    uv = uv + rng.normal(0, noise_uv, uv.shape)

    pre_stack = _kf_preintegrations(kf_times)

    Tcw_init = Tcw.copy()
    vel_init = vel.copy()
    lm_init = lm.copy()
    if perturb:
        for k in range(2, K):
            xi = np.concatenate([
                rng.normal(0, 0.02, 3), rng.normal(0, 0.01, 3)
            ]).astype(np.float32)
            Tcw_init[k] = np.asarray(
                lie.se3_exp(jnp.asarray(xi))
            ) @ Tcw_init[k]
            vel_init[k] += rng.normal(0, 0.05, 3)
        lm_init += rng.normal(0, 0.03, lm.shape).astype(np.float32)

    visual = schur_ba.BAProblem(
        cam_params=cam,
        kf_T=jnp.asarray(Tcw_init),
        kf_fixed=jnp.asarray([True, True] + [False] * (K - 2)),
        kf_valid=jnp.ones(K, bool),
        lm_pos=jnp.asarray(lm_init),
        lm_valid=jnp.ones(M, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_uv=jnp.asarray(uv.astype(np.float32)),
        obs_inv_sigma=jnp.ones((M, P), jnp.float32),
        obs_valid=jnp.asarray(obs_valid),
    )
    prob = vi_ba.VIBAProblem(
        visual=visual,
        Tbc=jnp.asarray(Tbc),
        kf_vel=jnp.asarray(vel_init),
        kf_bg=jnp.zeros((K, 3), jnp.float32),
        kf_ba=jnp.zeros((K, 3), jnp.float32),
        pre=pre_stack,
        edge_valid=jnp.asarray([False] + [True] * (K - 1)),
        g=jnp.asarray(G_W, jnp.float32),
    )
    return prob, Tcw, vel, lm


class TestVIBA:
    def test_cost_decreases_and_states_improve(self):
        prob, Tcw_gt, vel_gt, lm_gt = _make_vi_problem()
        res = vi_ba.vi_bundle_adjust(prob, iters=10)
        assert float(res.cost) < float(res.cost0)
        err0 = np.linalg.norm(
            np.asarray(prob.visual.kf_T)[:, :3, 3] - Tcw_gt[:, :3, 3]
        )
        err1 = np.linalg.norm(
            np.asarray(res.kf_T)[:, :3, 3] - Tcw_gt[:, :3, 3]
        )
        assert err1 < err0 * 0.5
        verr0 = np.linalg.norm(np.asarray(prob.kf_vel) - vel_gt)
        verr1 = np.linalg.norm(np.asarray(res.kf_vel) - vel_gt)
        assert verr1 < verr0
        assert np.isfinite(np.asarray(res.kf_T)).all()

    def test_noop_on_perfect_input(self):
        prob, Tcw_gt, _, _ = _make_vi_problem(noise_uv=0.0, perturb=False)
        res = vi_ba.vi_bundle_adjust(prob, iters=4)
        assert np.allclose(
            np.asarray(res.kf_T)[:, :3, 3], Tcw_gt[:, :3, 3], atol=5e-3
        )


class TestPoseInertialOptimization:
    def test_recovers_perturbed_pose(self):
        rng = np.random.default_rng(3)
        cam = camera.make_pinhole(458.0, 457.0, 376.0, 240.0)
        t_ref, t_cur = 0.5, 0.75
        Tbc = jnp.eye(4)
        R_r, p_r, v_r = state(t_ref)
        R_c, p_c, v_c = state(t_cur)
        Twb_ref = np.eye(4, dtype=np.float32)
        Twb_ref[:3, :3], Twb_ref[:3, 3] = R_r, p_r
        Twb_cur = np.eye(4, dtype=np.float32)
        Twb_cur[:3, :3], Twb_cur[:3, 3] = R_c, p_c
        Tcw_ref = pre_mod.Tcw_from_Twb(jnp.asarray(Twb_ref), Tbc)
        Tcw_cur = pre_mod.Tcw_from_Twb(jnp.asarray(Twb_cur), Tbc)

        N = 128
        lm = np.concatenate(
            [rng.uniform(-3, 3, (N, 2)), rng.uniform(5, 10, (N, 1))], axis=1
        ).astype(np.float32)
        pc = np.asarray(lie.se3_apply(Tcw_cur, jnp.asarray(lm)))
        uv = np.stack([
            458.0 * pc[:, 0] / pc[:, 2] + 376.0,
            457.0 * pc[:, 1] / pc[:, 2] + 240.0,
        ], axis=1) + rng.normal(0, 0.4, (N, 2))

        g, a, d, o = imu_samples(t_ref, t_cur)
        pre = pre_mod.integrate(g, a, d, o, jnp.zeros(3), jnp.zeros(3), CALIB)

        xi = jnp.asarray([0.02, -0.03, 0.01, 0.015, -0.02, 0.025])
        Tcw0 = lie.se3_exp(xi) @ Tcw_cur
        Tcw_f, vel_f, bg_f, ba_f, inl, n_inl = vi_ba.pose_inertial_optimization(
            cam, Tcw0, jnp.asarray(v_c + rng.normal(0, 0.1, 3), jnp.float32),
            jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(lm), jnp.asarray(uv.astype(np.float32)),
            jnp.ones(N), jnp.ones(N, bool),
            jnp.asarray(Tcw_ref), jnp.asarray(v_r, jnp.float32), pre, Tbc,
        )
        t_err = np.linalg.norm(
            np.asarray(Tcw_f)[:3, 3] - np.asarray(Tcw_cur)[:3, 3]
        )
        assert t_err < 0.01
        assert int(n_inl) > 100
