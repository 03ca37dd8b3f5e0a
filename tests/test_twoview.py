"""Two-view initialization tests: general-motion (E path) and planar (H path)
synthetic scenes, plus triangulation golden checks."""

import jax
import jax.numpy as jnp
import numpy as np

from eorb_slam_tpu.geometry import camera, lie, triangulation, twoview

CAM = camera.make_pinhole(458.0, 457.0, 376.0, 240.0)


def project(T, pts):
    pc = lie.se3_apply(T, jnp.asarray(pts, jnp.float32))
    return np.asarray(camera.pinhole_project_linear(CAM, pc))


def make_pair(pts_w, T2, noise=0.3, seed=0):
    rng = np.random.default_rng(seed)
    T1 = np.eye(4, dtype=np.float32)
    uv1 = project(jnp.asarray(T1), pts_w) + rng.normal(0, noise, (len(pts_w), 2))
    uv2 = project(jnp.asarray(T2), pts_w) + rng.normal(0, noise, (len(pts_w), 2))
    return uv1.astype(np.float32), uv2.astype(np.float32)


def rel_pose_error(Tcw2_est, Tcw2_gt):
    """Rotation error (rad) and translation direction error (rad)."""
    R_est, R_gt = np.asarray(Tcw2_est)[:3, :3], Tcw2_gt[:3, :3]
    dR = R_est.T @ R_gt
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    t_est = np.asarray(Tcw2_est)[:3, 3]
    t_gt = Tcw2_gt[:3, 3]
    t_est = t_est / (np.linalg.norm(t_est) + 1e-12)
    t_gt = t_gt / (np.linalg.norm(t_gt) + 1e-12)
    dt = np.arccos(np.clip(abs(t_est @ t_gt), -1, 1))
    return ang, dt


def test_triangulate_exact():
    rng = np.random.default_rng(1)
    pts = np.concatenate(
        [rng.uniform(-2, 2, (64, 2)), rng.uniform(4, 8, (64, 1))], axis=1
    ).astype(np.float32)
    T1 = jnp.eye(4)
    T2 = lie.se3_exp(jnp.asarray([0.5, 0.02, 0.01, 0.01, -0.02, 0.005], jnp.float32))
    r1 = lie.se3_apply(T1, jnp.asarray(pts))
    r2 = lie.se3_apply(T2, jnp.asarray(pts))
    ray1 = r1 / r1[:, 2:3]
    ray2 = r2 / r2[:, 2:3]
    out = triangulation.triangulate_dlt(T1[None], T2[None], ray1, ray2)
    np.testing.assert_allclose(np.asarray(out), pts, atol=1e-2)
    ok, _ = triangulation.triangulation_checks(
        T1[None], T2[None], ray1, ray2, out, inv_sigma1=458.0, inv_sigma2=458.0
    )
    assert np.asarray(ok).mean() > 0.95


def test_reconstruct_general_scene_uses_E():
    rng = np.random.default_rng(2)
    pts = np.concatenate(
        [rng.uniform(-3, 3, (200, 2)), rng.uniform(3, 12, (200, 1))], axis=1
    ).astype(np.float32)
    T2_gt = np.asarray(
        lie.se3_exp(jnp.asarray([0.4, 0.05, 0.1, 0.02, -0.1, 0.03], jnp.float32))
    )
    uv1, uv2 = make_pair(pts, jnp.asarray(T2_gt), noise=0.3)
    res = twoview.reconstruct_two_views(
        CAM, jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(len(pts), bool), jax.random.PRNGKey(0),
    )
    assert bool(res.success)
    assert not bool(res.used_homography)
    ang, dt = rel_pose_error(res.Tcw2, T2_gt)
    assert ang < 0.01, f"rotation err {np.degrees(ang):.2f} deg"
    assert dt < 0.03, f"translation dir err {np.degrees(dt):.2f} deg"
    assert int(res.n_good) > 150
    # triangulated points should agree up to global scale
    good = np.asarray(res.is_triangulated)
    scale = np.median(np.asarray(res.pts3d)[good, 2] / pts[good, 2])
    err = np.linalg.norm(np.asarray(res.pts3d)[good] / scale - pts[good], axis=1)
    # depth noise floor ~ z^2/(f*b) * sigma ~ 0.25 m at these depths/baseline
    assert np.median(err) < 0.5


def test_reconstruct_planar_scene_uses_H():
    rng = np.random.default_rng(3)
    # points on the z=6 plane (fronto-parallel planar scene)
    pts = np.concatenate(
        [rng.uniform(-3, 3, (200, 2)), np.full((200, 1), 6.0)], axis=1
    ).astype(np.float32)
    T2_gt = np.asarray(
        lie.se3_exp(jnp.asarray([0.5, 0.1, 0.05, 0.03, -0.08, 0.02], jnp.float32))
    )
    uv1, uv2 = make_pair(pts, jnp.asarray(T2_gt), noise=0.3, seed=4)
    res = twoview.reconstruct_two_views(
        CAM, jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(len(pts), bool), jax.random.PRNGKey(1),
    )
    assert bool(res.used_homography)
    assert bool(res.success)
    ang, dt = rel_pose_error(res.Tcw2, T2_gt)
    assert ang < 0.02, f"rotation err {np.degrees(ang):.2f} deg"
    assert dt < 0.05, f"translation dir err {np.degrees(dt):.2f} deg"


def test_reconstruct_with_outliers():
    rng = np.random.default_rng(5)
    pts = np.concatenate(
        [rng.uniform(-3, 3, (200, 2)), rng.uniform(3, 12, (200, 1))], axis=1
    ).astype(np.float32)
    T2_gt = np.asarray(
        lie.se3_exp(jnp.asarray([0.4, 0.0, 0.05, 0.01, -0.06, 0.02], jnp.float32))
    )
    uv1, uv2 = make_pair(pts, jnp.asarray(T2_gt), noise=0.3, seed=6)
    # 25% gross outliers
    n_out = 50
    uv2[:n_out] = rng.uniform(0, 480, (n_out, 2)).astype(np.float32)
    res = twoview.reconstruct_two_views(
        CAM, jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(len(pts), bool), jax.random.PRNGKey(2),
    )
    assert bool(res.success)
    ang, dt = rel_pose_error(res.Tcw2, T2_gt)
    assert ang < 0.02
    assert dt < 0.05
    # outlier rows must not be triangulated
    assert np.asarray(res.is_triangulated)[:n_out].mean() < 0.2


def test_degenerate_pure_rotation_fails():
    """Pure rotation has no parallax — init must refuse (success=False)."""
    rng = np.random.default_rng(7)
    pts = np.concatenate(
        [rng.uniform(-3, 3, (150, 2)), rng.uniform(3, 12, (150, 1))], axis=1
    ).astype(np.float32)
    T2_gt = np.asarray(
        lie.se3_exp(jnp.asarray([0.0, 0.0, 0.0, 0.02, -0.05, 0.01], jnp.float32))
    )
    uv1, uv2 = make_pair(pts, jnp.asarray(T2_gt), noise=0.3, seed=8)
    res = twoview.reconstruct_two_views(
        CAM, jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(len(pts), bool), jax.random.PRNGKey(3),
    )
    assert not bool(res.success)
