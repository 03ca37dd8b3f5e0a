"""Camera model tests: project/unproject round trips, Jacobians vs autodiff,
distortion vs OpenCV oracle."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from eorb_slam_tpu.geometry import camera

RNG = np.random.default_rng(1)

PIN = camera.make_pinhole(458.654, 457.296, 367.215, 248.375,
                          k1=-0.28340811, k2=0.07395907, p1=0.00019359, p2=1.76187114e-05)
KB8 = camera.make_kb8(190.978, 190.973, 254.932, 256.897,
                      k1=0.00348238, k2=0.000715035, k3=-0.0020532361, k4=0.000202937)


def rand_points(n, z_range=(0.5, 10.0)):
    xy = RNG.normal(size=(n, 2)) * 0.4
    z = RNG.uniform(*z_range, size=(n, 1))
    return jnp.asarray(np.concatenate([xy * z, z], axis=1), dtype=jnp.float32)


def test_pinhole_project_unproject_roundtrip():
    pts = rand_points(256)
    uv = camera.pinhole_project(PIN, pts)
    rays = camera.pinhole_unproject(PIN, uv)
    # rays should be parallel to pts
    dirs = pts / pts[:, 2:3]
    np.testing.assert_allclose(rays, dirs, atol=1e-3)


def test_pinhole_project_matches_opencv():
    pts = np.asarray(rand_points(128), dtype=np.float64)
    K = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375], [0, 0, 1]])
    dist = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0])
    uv_cv, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3), K, dist)
    uv = camera.pinhole_project(PIN, jnp.asarray(pts, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(uv), uv_cv[:, 0, :], atol=0.05)


def test_undistort_matches_opencv():
    uv_d = np.stack(
        [RNG.uniform(20, 730, size=64), RNG.uniform(20, 460, size=64)], axis=1
    )
    K = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375], [0, 0, 1]])
    dist = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0])
    crit = (cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 200, 1e-12)
    und_cv = cv2.undistortPoints(uv_d[:, None, :], K, dist, R=None, P=K, criteria=crit)[:, 0, :]
    und = camera.undistort_points(PIN, jnp.asarray(uv_d, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(und), und_cv, atol=0.01)
    # true-inversion round trip: project(unproject(uv)) == uv
    rays = camera.pinhole_unproject(PIN, jnp.asarray(uv_d, dtype=jnp.float32))
    uv_back = camera.pinhole_project(PIN, rays)
    np.testing.assert_allclose(np.asarray(uv_back), uv_d, atol=0.01)


def test_pinhole_jacobian_vs_autodiff():
    pts = rand_points(32)
    J = camera.pinhole_project_jac_point(PIN, pts)
    J_ad = jax.vmap(jax.jacfwd(lambda p: camera.pinhole_project_linear(PIN, p)))(pts)
    np.testing.assert_allclose(J, J_ad, atol=1e-4)


def test_kb8_project_unproject_roundtrip():
    pts = rand_points(256)
    uv = camera.kb8_project(KB8, pts)
    rays = camera.kb8_unproject(KB8, uv)
    dirs = pts / pts[:, 2:3]
    np.testing.assert_allclose(np.asarray(rays), np.asarray(dirs), atol=1e-3)


def test_kb8_matches_opencv_fisheye():
    pts = np.asarray(rand_points(64), dtype=np.float64).reshape(-1, 1, 3)
    K = np.array([[190.978, 0, 254.932], [0, 190.973, 256.897], [0, 0, 1]])
    D = np.array([0.00348238, 0.000715035, -0.0020532361, 0.000202937])
    uv_cv, _ = cv2.fisheye.projectPoints(pts, np.zeros(3), np.zeros(3), K, D)
    uv = camera.kb8_project(KB8, jnp.asarray(pts[:, 0, :], dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(uv), uv_cv[:, 0, :], atol=0.05)


def test_project_jit_batch():
    f = jax.jit(lambda p: camera.pinhole_project(PIN, p))
    pts = rand_points(1024)
    out = f(pts)
    assert out.shape == (1024, 2)
    assert np.all(np.isfinite(np.asarray(out)))


class TestRectifyMap:
    def test_identity_when_undistorted(self):
        cam = camera.make_pinhole(200.0, 200.0, 120.0, 90.0)
        m = camera.build_rectify_map(cam, w=40, h=30)
        ys, xs = np.mgrid[0:30, 0:40]
        assert np.abs(m[..., 0] - xs).max() < 1e-3
        assert np.abs(m[..., 1] - ys).max() < 1e-3

    def test_radial_distortion_moves_corners(self):
        # k1=-0.15: barrel distortion that stays invertible out to the
        # corners (k1=-0.3 has no undistortion solution at r_d=0.75)
        cam = camera.make_pinhole(200.0, 200.0, 120.0, 90.0, k1=-0.15)
        m = camera.build_rectify_map(cam, w=240, h=180)
        # center pixel barely moves, corners move a lot
        assert np.linalg.norm(m[90, 120] - [120, 90]) < 0.5
        assert np.linalg.norm(m[0, 0] - [0, 0]) > 5.0
        # event rectification path consumes the map
        from eorb_slam_tpu.io.datasets import EventStream
        ev = np.asarray([[0.0, 0.0, 0.0, 1.0], [0.1, 120.0, 90.0, 0.0]])
        s = EventStream(ev.copy(), rectify_map=m)
        assert np.allclose(s.events[1, 1:3], [120, 90], atol=0.5)
        assert not np.allclose(s.events[0, 1:3], [0, 0], atol=1.0)

    def test_kb8_map(self):
        cam = camera.make_kb8(150.0, 150.0, 30.0, 22.5, k1=0.02, k2=-0.003)
        m = camera.build_rectify_map(cam, w=60, h=45, model=camera.FISHEYE_KB8)
        assert np.isfinite(m).all()
        # principal point is a fixed point of the rectification
        assert np.linalg.norm(m[22, 30] - [30, 22]) < 1.5


def test_kb8_triangulate_matches():
    """Stereo-fisheye triangulation (reference KannalaBrandt8::
    TriangulateMatches): points projected into two KB8 cameras with a known
    baseline must triangulate back to their true positions."""
    import numpy as np
    import jax.numpy as jnp
    from eorb_slam_tpu.geometry import camera

    p1 = camera.make_kb8(285.0, 286.0, 160.0, 120.0,
                         k1=0.01, k2=-0.002, k3=0.001, k4=-0.0005)
    p2 = camera.make_kb8(284.0, 285.0, 161.0, 119.0,
                         k1=0.012, k2=-0.001, k3=0.0, k4=0.0)
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform(-1.5, 1.5, (64, 2)), rng.uniform(1.5, 6.0, (64, 1))
    ], axis=1).astype(np.float32)
    Trl = np.eye(4, dtype=np.float32)
    Trl[:3, 3] = [-0.11, 0.0, 0.0]   # 11 cm stereo baseline
    uv1 = np.asarray(camera.kb8_project(p1, jnp.asarray(pts)))
    pc2 = pts @ Trl[:3, :3].T + Trl[:3, 3]
    uv2 = np.asarray(camera.kb8_project(p2, jnp.asarray(pc2)))
    uv1n = uv1 + rng.normal(0, 0.2, uv1.shape).astype(np.float32)
    uv2n = uv2 + rng.normal(0, 0.2, uv2.shape).astype(np.float32)

    out, z, ok = camera.kb8_triangulate_matches(
        p1, p2, jnp.asarray(Trl), jnp.asarray(uv1n), jnp.asarray(uv2n),
        jnp.ones(64, bool),
    )
    ok = np.asarray(ok)
    assert ok.sum() > 48, ok.sum()
    err = np.linalg.norm(np.asarray(out)[ok] - pts[ok], axis=1)
    # depth noise grows as z^2/(f b): gate overall loosely, near points tight
    assert np.median(err) < 0.2, np.median(err)
    near = pts[ok][:, 2] < 2.5
    assert near.sum() > 5 and np.median(err[near]) < 0.05, np.median(err[near])
    # behind-camera / bogus matches are rejected
    uv_bad = uv2n[::-1]
    _, _, ok_bad = camera.kb8_triangulate_matches(
        p1, p2, jnp.asarray(Trl), jnp.asarray(uv1n), jnp.asarray(uv_bad),
        jnp.ones(64, bool),
    )
    assert np.asarray(ok_bad).sum() < 8
