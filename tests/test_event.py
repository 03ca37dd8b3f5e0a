"""Event tensorization + contrast maximization tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from eorb_slam_tpu.event import contrast_max, tensorize
from eorb_slam_tpu.geometry import camera, lie

H, W = 180, 240


def gen_rt2d_events(omega, vx, vy, n_dots=60, ev_per_dot=40, T=0.05, seed=0):
    """Events from dots moving under the exact RT2D model the warp inverts:
    p(t) = R(-omega t)(p0 - c + v t) + c."""
    rng = np.random.default_rng(seed)
    c = np.asarray([W / 2.0, H / 2.0])
    p0 = rng.uniform([20, 20], [W - 20, H - 20], (n_dots, 2))
    ts = rng.uniform(0, T, (n_dots, ev_per_dot))
    xy = np.zeros((n_dots, ev_per_dot, 2))
    for i in range(n_dots):
        for j in range(ev_per_dot):
            t = ts[i, j]
            a = -omega * t
            Rm = np.asarray([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
            xy[i, j] = Rm @ (p0[i] - c + np.asarray([vx, vy]) * t) + c
    xy = xy.reshape(-1, 2) + rng.normal(0, 0.15, (n_dots * ev_per_dot, 2))
    t_rel = ts.reshape(-1)
    return (
        jnp.asarray(xy, jnp.float32),
        jnp.asarray(t_rel, jnp.float32),
        jnp.ones(n_dots * ev_per_dot, bool),
    )


class TestSplat:
    def test_mass_and_peak(self):
        xy = jnp.asarray([[50.0, 40.0], [120.5, 90.5]])
        valid = jnp.ones(2, bool)
        pol = jnp.ones(2)
        img = tensorize.splat_gauss(xy, valid, pol, H, W, sigma=1.0)
        img = np.asarray(img)
        # peak at the integer event location
        assert img[40, 50] > 0.3
        py, px = np.unravel_index(np.argmax(img), img.shape)
        assert abs(px - 50) <= 1 and abs(py - 40) <= 1 or \
            abs(px - 120) <= 1 and abs(py - 90) <= 1
        # per-event mass ~ 2 pi sigma^2 (truncated)
        assert np.sum(img) == pytest.approx(2 * 2 * np.pi, rel=0.1)

    def test_masked_events_ignored(self):
        xy = jnp.asarray([[50.0, 40.0], [120.0, 90.0]])
        valid = jnp.asarray([True, False])
        img = tensorize.splat_gauss(xy, valid, jnp.ones(2), H, W)
        assert np.asarray(img)[90, 120] == 0.0
        assert np.asarray(img)[40, 50] > 0.0

    def test_out_of_bounds_dropped(self):
        xy = jnp.asarray([[-5.0, 10.0], [W + 3.0, H + 3.0], [1.0, 1.0]])
        img = tensorize.splat_gauss(xy, jnp.ones(3, bool), jnp.ones(3), H, W)
        assert np.isfinite(np.asarray(img)).all()
        # only the in-bounds event contributes meaningfully
        assert np.asarray(img)[1, 1] > 0.3

    def test_polarity_signed(self):
        xy = jnp.asarray([[50.0, 40.0], [50.0, 40.0]])
        pol = jnp.asarray([1.0, -1.0])
        img = tensorize.splat_gauss(xy, jnp.ones(2, bool), pol, H, W,
                                    use_polarity=True)
        assert abs(float(jnp.sum(img))) < 1e-4


class TestFocus:
    def test_sharp_beats_blurred(self):
        xy, t_rel, valid = gen_rt2d_events(3.0, 80.0, -50.0)
        pol = jnp.ones(xy.shape[0])
        img_motion = tensorize.splat_gauss(xy, valid, pol, H, W)
        xy_w = tensorize.warp_se2(
            xy, t_rel, jnp.asarray([3.0, 80.0, -50.0]),
            jnp.asarray([W / 2, H / 2], jnp.float32),
        )
        img_sharp = tensorize.splat_gauss(xy_w, valid, pol, H, W)
        assert float(tensorize.patch_std_mean(img_sharp)) > \
            float(tensorize.patch_std_mean(img_motion))
        assert float(tensorize.image_std(img_sharp)) > \
            float(tensorize.image_std(img_motion))


class TestContrastMax:
    def test_recovers_rt2d_motion(self):
        w_true, vx_true, vy_true = 4.0, 120.0, -80.0
        xy, t_rel, valid = gen_rt2d_events(w_true, vx_true, vy_true)
        p, c, c0 = contrast_max.maximize_rt2d(xy, t_rel, valid, H, W,
                                              iters=120)
        assert float(c) > float(c0) * 1.5
        p = np.asarray(p)
        # displacement-level accuracy: params * window must match within ~a
        # pixel (T=0.05s window)
        assert abs(p[1] - vx_true) * 0.05 < 1.5
        assert abs(p[2] - vy_true) * 0.05 < 1.5
        assert abs(p[0] - w_true) * 0.05 * (W / 2) < 2.5

    def test_zero_motion_stays_zero(self):
        xy, t_rel, valid = gen_rt2d_events(0.0, 0.0, 0.0)
        p, c, c0 = contrast_max.maximize_rt2d(xy, t_rel, valid, H, W,
                                              iters=40)
        p = np.asarray(p)
        assert abs(p[1]) * 0.05 < 1.0
        assert abs(p[2]) * 0.05 < 1.0


class TestWarpSE3:
    def test_identity_pose_is_identity(self):
        cam = camera.make_pinhole(200.0, 200.0, W / 2, H / 2)
        xy = jnp.asarray([[30.0, 40.0], [200.0, 150.0]], jnp.float32)
        t_rel = jnp.asarray([0.3, 0.8], jnp.float32)
        T = jnp.eye(4)
        xy_w, z = tensorize.warp_se3_depth(xy, t_rel, T, T, cam, 5.0)
        assert np.allclose(np.asarray(xy_w), np.asarray(xy), atol=1e-3)
        assert np.allclose(np.asarray(z), 5.0, atol=1e-4)

    def test_translation_compensation(self):
        """Events observed by a translating camera warp forward to the
        window-END projection (the MCI's timestamp)."""
        cam = camera.make_pinhole(200.0, 200.0, W / 2, H / 2)
        depth = 5.0
        pt_w = jnp.asarray([0.5, -0.3, depth])
        T0 = jnp.eye(4)
        T1 = lie.se3_exp(jnp.asarray([0.2, 0.1, 0.0, 0.0, 0.0, 0.0]))
        # event at t_rel: the moving camera sees the point at its projection
        t_rel = jnp.asarray([0.0, 0.5, 1.0], jnp.float32)
        from eorb_slam_tpu.geometry import camera as cm
        uv_obs = []
        for a in np.asarray(t_rel):
            T_t = lie.interpolate_se3(T0, T1, float(a))
            uv_obs.append(np.asarray(
                cm.pinhole_project_linear(cam, lie.se3_apply(T_t, pt_w))
            ))
        uv_obs = jnp.asarray(np.stack(uv_obs), jnp.float32)
        xy_w, _ = tensorize.warp_se3_depth(uv_obs, t_rel, T0, T1, cam, depth)
        uv1 = np.asarray(
            cm.pinhole_project_linear(cam, lie.se3_apply(T1, pt_w))
        )
        assert np.allclose(np.asarray(xy_w), uv1[None, :], atol=0.15)


class TestFitRT2DPoints:
    def test_recovers_flow_from_matches(self):
        rng = np.random.default_rng(2)
        w_true, vx_true, vy_true = 3.0, 50.0, -30.0
        dt = 0.02
        center = jnp.asarray([W / 2.0, H / 2.0], jnp.float32)
        prev = rng.uniform(20, 200, (64, 2)).astype(np.float32)
        rx = prev[:, 0] - W / 2.0
        ry = prev[:, 1] - H / 2.0
        cur = prev + dt * np.stack(
            [-w_true * ry + vx_true, w_true * rx + vy_true], -1
        ).astype(np.float32)
        cur += rng.normal(0, 0.1, cur.shape).astype(np.float32)
        params, n = contrast_max.fit_rt2d_points(
            jnp.asarray(prev), jnp.asarray(cur), jnp.ones(64, bool),
            jnp.asarray(dt, jnp.float32), center,
        )
        p = np.asarray(params)
        assert int(n) == 64
        assert abs(p[0] - w_true) < 0.3
        assert abs(p[1] - vx_true) < 2.0
        assert abs(p[2] - vy_true) < 2.0

    def test_degenerate_is_safe(self):
        center = jnp.asarray([W / 2.0, H / 2.0], jnp.float32)
        params, n = contrast_max.fit_rt2d_points(
            jnp.zeros((16, 2)), jnp.zeros((16, 2)), jnp.zeros(16, bool),
            jnp.asarray(1e-3, jnp.float32), center,
        )
        assert int(n) == 0
        assert np.isfinite(np.asarray(params)).all()


class TestWarpSE3DepthMap:
    def test_matches_constant_depth_on_flat_map(self):
        cam = camera.make_pinhole(200.0, 200.0, W / 2, H / 2)
        xy = jnp.asarray([[30.0, 40.0], [200.0, 150.0]], jnp.float32)
        t_rel = jnp.asarray([0.3, 0.8], jnp.float32)
        T0 = jnp.eye(4)
        T1 = lie.se3_exp(jnp.asarray([0.1, -0.05, 0.02, 0.01, 0.0, 0.0]))
        dmap = jnp.full((H, W), 5.0, jnp.float32)
        a, za = tensorize.warp_se3_depth(xy, t_rel, T0, T1, cam, 5.0)
        b, zb = tensorize.warp_se3_depthmap(xy, t_rel, T0, T1, cam, dmap, 9.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
        np.testing.assert_allclose(np.asarray(za), np.asarray(zb), atol=1e-5)

    def test_holes_fall_back_to_default(self):
        cam = camera.make_pinhole(200.0, 200.0, W / 2, H / 2)
        xy = jnp.asarray([[30.0, 40.0]], jnp.float32)
        t_rel = jnp.asarray([0.5], jnp.float32)
        T1 = lie.se3_exp(jnp.asarray([0.3, 0.0, 0.0, 0.0, 0.0, 0.0]))
        dmap = jnp.zeros((H, W), jnp.float32)  # all holes
        a, _ = tensorize.warp_se3_depthmap(
            xy, t_rel, jnp.eye(4), T1, cam, dmap, 4.0
        )
        b, _ = tensorize.warp_se3_depth(xy, t_rel, jnp.eye(4), T1, cam, 4.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
