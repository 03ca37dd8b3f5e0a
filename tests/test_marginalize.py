"""Schur marginalization tools + marginalized pose-IMU prior tracking
(reference Optimizer::Marginalize/Condition/Sparsify src/Optimizer.cc:6229-6343
and PoseInertialOptimizationLastFrame src/Optimizer.cc:9006)."""

import jax.numpy as jnp
import numpy as np

from eorb_slam_tpu.geometry import camera, lie
from eorb_slam_tpu.imu import preintegration as pre_mod
from eorb_slam_tpu.optim import marginalize as marg

from tests.test_imu import CALIB, G_W, imu_samples, state


def _rand_psd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n + 3, n)).astype(np.float64)
    return jnp.asarray(A.T @ A, jnp.float32)


class TestSchurTools:
    def test_marginalize_matches_dense_schur(self):
        H = _rand_psd(9, 1)
        out = np.asarray(marg.marginalize(H, 3, 5))
        keep = [0, 1, 2, 6, 7, 8]
        mi = [3, 4, 5]
        Hn = np.asarray(H, np.float64)
        ref = Hn[np.ix_(keep, keep)] - Hn[np.ix_(keep, mi)] @ np.linalg.inv(
            Hn[np.ix_(mi, mi)]) @ Hn[np.ix_(mi, keep)]
        assert np.allclose(out[np.ix_(keep, keep)], ref, atol=1e-3)
        # marginalized rows/cols zeroed, layout preserved
        assert np.allclose(out[3:6, :], 0.0)
        assert np.allclose(out[:, 3:6], 0.0)

    def test_marginalize_singular_block_uses_pinv(self):
        H = _rand_psd(6, 2)
        H = H.at[4:6, :].set(0.0).at[:, 4:6].set(0.0)  # rank-deficient block
        out = np.asarray(marg.marginalize(H, 3, 5))
        assert np.isfinite(out).all()

    def test_condition_zeroes_block(self):
        H = _rand_psd(8, 3)
        out = np.asarray(marg.condition(H, 2, 4))
        assert np.allclose(out[2:5, :], 0.0)
        assert np.allclose(out[:, 2:5], 0.0)
        assert np.allclose(out[:2, :2], np.asarray(H)[:2, :2])

    def test_sparsify_removes_cross_information(self):
        H = _rand_psd(9, 4)
        out = marg.sparsify(H, 0, 2, 3, 5)
        # identity: Hac + Hbc - Hc
        ref = np.asarray(marg.marginalize(H, 3, 5)) + \
            np.asarray(marg.marginalize(H, 0, 2)) - \
            np.asarray(marg.marginalize(marg.marginalize(H, 3, 5), 0, 2))
        assert np.allclose(np.asarray(out), ref, atol=1e-4)


class TestPriorResidual:
    def test_zero_at_linearization_point(self):
        T = np.eye(4, dtype=np.float32)
        p = marg.identity_prior(jnp.asarray(T), jnp.zeros(3), jnp.zeros(3),
                                jnp.zeros(3))
        r = marg.prior_residual(p, jnp.asarray(T), jnp.zeros(3), jnp.zeros(3),
                                jnp.zeros(3))
        assert np.allclose(np.asarray(r), 0.0, atol=1e-6)

    def test_grows_with_deviation(self):
        T = jnp.eye(4)
        p = marg.identity_prior(T, jnp.zeros(3), jnp.zeros(3), jnp.zeros(3))
        T2 = lie.se3_exp(jnp.asarray([0.1, 0, 0, 0, 0.2, 0]))
        r = marg.prior_residual(p, T2, jnp.ones(3) * 0.1, jnp.zeros(3),
                                jnp.zeros(3))
        assert float(jnp.linalg.norm(r)) > 1.0


class TestLastFrameOptimization:
    def test_tracks_two_consecutive_frames_with_prior_chain(self):
        rng = np.random.default_rng(7)
        cam = camera.make_pinhole(458.0, 457.0, 376.0, 240.0)
        Tbc = jnp.eye(4)

        def tcw_vel(t):
            R, pos, v = state(t)
            Twb = np.eye(4, dtype=np.float32)
            Twb[:3, :3], Twb[:3, 3] = R, pos
            return pre_mod.Tcw_from_Twb(jnp.asarray(Twb), Tbc), v

        N = 128
        lm = np.concatenate(
            [rng.uniform(-3, 3, (N, 2)), rng.uniform(5, 10, (N, 1))], axis=1
        ).astype(np.float32)

        def obs(Tcw):
            pc = np.asarray(lie.se3_apply(Tcw, jnp.asarray(lm)))
            uv = np.stack([
                458.0 * pc[:, 0] / pc[:, 2] + 376.0,
                457.0 * pc[:, 1] / pc[:, 2] + 240.0,
            ], axis=1) + rng.normal(0, 0.4, (N, 2))
            return jnp.asarray(uv.astype(np.float32))

        t0, t1, t2 = 0.5, 0.75, 1.0
        Tcw0, v0 = tcw_vel(t0)
        Tcw1, v1 = tcw_vel(t1)
        Tcw2, v2 = tcw_vel(t2)

        prior = marg.identity_prior(Tcw0, jnp.asarray(v0, jnp.float32),
                                    jnp.zeros(3), jnp.zeros(3), weight=1e4)
        errs = []
        for (ta, tb, Tcw_gt, v_gt) in [(t0, t1, Tcw1, v1),
                                       (t1, t2, Tcw2, v2)]:
            g, a, d, o = imu_samples(ta, tb)
            pre = pre_mod.integrate(g, a, d, o, jnp.zeros(3), jnp.zeros(3),
                                    CALIB)
            xi = jnp.asarray([0.02, -0.03, 0.01, 0.02, -0.02, 0.03])
            out = marg.pose_inertial_optimization_last_frame(
                cam, lie.se3_exp(xi) @ Tcw_gt,
                jnp.asarray(v_gt + rng.normal(0, 0.1, 3), jnp.float32),
                jnp.zeros(3), jnp.zeros(3),
                jnp.asarray(lm), obs(Tcw_gt), jnp.ones(N), jnp.ones(N, bool),
                prior, pre, Tbc,
            )
            Tcw_f, vel_f, bg_f, ba_f, inl, n_inl, prior = out
            errs.append(np.linalg.norm(
                np.asarray(Tcw_f)[:3, 3] - np.asarray(Tcw_gt)[:3, 3]))
            assert int(n_inl) > 100
        assert max(errs) < 0.02
        # chained prior is a usable PSD information matrix on the new frame
        w = np.linalg.eigvalsh(np.asarray(prior.H))
        assert w.min() > -1e-2
        assert np.allclose(np.asarray(prior.Tcw), np.asarray(Tcw_f))
