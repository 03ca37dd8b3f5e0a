"""Unit tests for Lie-group ops: round-trips, group laws, Jacobian identities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eorb_slam_tpu.geometry import lie

RNG = np.random.default_rng(0)


def rand_phi(n, scale=2.0):
    return jnp.asarray(RNG.normal(size=(n, 3)) * scale, dtype=jnp.float32)


def test_so3_exp_log_roundtrip():
    phi = rand_phi(64, scale=1.0)
    R = lie.so3_exp(phi)
    phi2 = lie.so3_log(R)
    np.testing.assert_allclose(phi, phi2, atol=1e-4)


def test_so3_exp_orthonormal():
    R = lie.so3_exp(rand_phi(32))
    eye = jnp.eye(3)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), np.tile(eye, (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_so3_small_angle():
    phi = jnp.asarray([[1e-9, 0, 0], [0.0, 0.0, 0.0]], dtype=jnp.float32)
    R = lie.so3_exp(phi)
    np.testing.assert_allclose(R[1], jnp.eye(3), atol=1e-7)
    assert np.all(np.isfinite(np.asarray(lie.so3_log(R))))


def test_so3_log_near_pi():
    axis = np.array([1.0, 2.0, -0.5])
    axis = axis / np.linalg.norm(axis)
    phi = jnp.asarray((np.pi - 1e-4) * axis, dtype=jnp.float32)[None]
    R = lie.so3_exp(phi)
    phi2 = lie.so3_log(R)
    np.testing.assert_allclose(phi, phi2, atol=1e-3)


def test_quat_mat_roundtrip():
    phi = rand_phi(64)
    R = lie.so3_exp(phi)
    q = lie.quat_from_mat(R)
    R2 = lie.quat_to_mat(q)
    np.testing.assert_allclose(R, R2, atol=1e-5)


def test_quat_mul_matches_mat_mul():
    a, b = rand_phi(8), rand_phi(8)
    Ra, Rb = lie.so3_exp(a), lie.so3_exp(b)
    q = lie.quat_mul(lie.quat_from_mat(Ra), lie.quat_from_mat(Rb))
    np.testing.assert_allclose(lie.quat_to_mat(q), Ra @ Rb, atol=1e-5)


def test_right_jacobian_identity():
    """exp(phi + d) ≈ exp(phi) exp(Jr(phi) d) for small d."""
    phi = rand_phi(16, scale=1.5)
    d = rand_phi(16, scale=1e-4)
    lhs = lie.so3_exp(phi + d)
    Jr = lie.so3_right_jacobian(phi)
    rhs = lie.so3_exp(phi) @ lie.so3_exp((Jr @ d[..., None])[..., 0])
    np.testing.assert_allclose(lhs, rhs, atol=1e-6)


def test_right_jacobian_inverse():
    phi = rand_phi(16, scale=1.5)
    J = lie.so3_right_jacobian(phi)
    Jinv = lie.so3_right_jacobian_inv(phi)
    np.testing.assert_allclose(J @ Jinv, np.tile(np.eye(3), (16, 1, 1)), atol=1e-4)


def test_se3_exp_log_roundtrip():
    xi = jnp.asarray(RNG.normal(size=(32, 6)), dtype=jnp.float32)
    T = lie.se3_exp(xi)
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_se3_inverse():
    xi = jnp.asarray(RNG.normal(size=(8, 6)), dtype=jnp.float32)
    T = lie.se3_exp(xi)
    TT = T @ lie.se3_inv(T)
    np.testing.assert_allclose(TT, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_se3_apply():
    xi = jnp.asarray(RNG.normal(size=(6,)), dtype=jnp.float32)
    T = lie.se3_exp(xi)
    p = jnp.asarray(RNG.normal(size=(10, 3)), dtype=jnp.float32)
    ph = jnp.concatenate([p, jnp.ones((10, 1))], axis=-1)
    expected = (T @ ph.T).T[:, :3]
    np.testing.assert_allclose(lie.se3_apply(T, p), expected, atol=1e-5)


def test_sim3_exp_reduces_to_se3():
    xi6 = jnp.asarray(RNG.normal(size=(16, 6)), dtype=jnp.float32)
    xi7 = jnp.concatenate([xi6, jnp.zeros((16, 1))], axis=-1)
    R, t, s = lie.sim3_exp(xi7)
    T = lie.se3_exp(xi6)
    np.testing.assert_allclose(s, np.ones(16), atol=1e-5)
    np.testing.assert_allclose(R, lie.se3_rot(T), atol=1e-5)
    np.testing.assert_allclose(t, lie.se3_trans(T), atol=1e-4)


def test_sim3_group_ops():
    xi = jnp.asarray(RNG.normal(size=(4, 7)) * 0.5, dtype=jnp.float32)
    R, t, s = lie.sim3_exp(xi)
    Ri, ti, si = lie.sim3_inv(R, t, s)
    Rc, tc, sc = lie.sim3_mul(R, t, s, Ri, ti, si)
    np.testing.assert_allclose(Rc, np.tile(np.eye(3), (4, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(tc, np.zeros((4, 3)), atol=1e-5)
    np.testing.assert_allclose(sc, np.ones(4), atol=1e-5)


def test_sim3_exp_numerical():
    """Check sim3_exp against brute-force matrix exponential."""
    from scipy.linalg import expm

    xi = np.asarray(RNG.normal(size=(7,)) * 0.7, dtype=np.float64)
    A = np.zeros((4, 4))
    A[:3, :3] = np.array(
        [[0, -xi[5], xi[4]], [xi[5], 0, -xi[3]], [-xi[4], xi[3], 0]]
    ) + xi[6] * np.eye(3)
    A[:3, 3] = xi[:3]
    M = expm(A)
    R, t, s = lie.sim3_exp(jnp.asarray(xi, dtype=jnp.float32))
    sR = float(s) * np.asarray(R)
    np.testing.assert_allclose(sR, M[:3, :3], atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), M[:3, 3], atol=1e-4)


def test_quat_slerp_endpoints_and_mid():
    a, b = rand_phi(1), rand_phi(1)
    q0, q1 = lie.quat_from_mat(lie.so3_exp(a)), lie.quat_from_mat(lie.so3_exp(b))
    np.testing.assert_allclose(lie.quat_slerp(q0, q1, 0.0), q0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.sum(np.asarray(lie.quat_slerp(q0, q1, 1.0)) * np.asarray(q1))), 1.0, atol=1e-5)
    qm = lie.quat_slerp(q0, q1, 0.5)
    # midpoint is equidistant in angle
    d0 = np.abs(np.sum(np.asarray(qm) * np.asarray(q0)))
    d1 = np.abs(np.sum(np.asarray(qm) * np.asarray(q1)))
    np.testing.assert_allclose(d0, d1, atol=1e-5)


def test_interpolate_se3():
    xi0 = jnp.zeros((6,))
    xi1 = jnp.asarray([1.0, 2.0, 3.0, 0.3, -0.2, 0.1], dtype=jnp.float32)
    T0, T1 = lie.se3_exp(xi0), lie.se3_exp(xi1)
    Tm = lie.interpolate_se3(T0, T1, 0.0)
    np.testing.assert_allclose(Tm, T0, atol=1e-5)
    Tm = lie.interpolate_se3(T0, T1, 1.0)
    np.testing.assert_allclose(Tm, T1, atol=1e-5)


def test_jit_and_vmap_compose():
    f = jax.jit(jax.vmap(lambda x: lie.se3_log(lie.se3_exp(x))))
    xi = np.asarray(RNG.normal(size=(16, 6)), dtype=np.float32)
    # keep |phi| < pi: log returns the principal value, so larger rotations
    # round-trip to the equivalent short vector, not the original
    nrm = np.linalg.norm(xi[:, 3:], axis=1, keepdims=True)
    xi[:, 3:] *= np.minimum(1.0, 2.8 / np.maximum(nrm, 1e-9))
    xi = jnp.asarray(xi)
    np.testing.assert_allclose(f(xi), xi, atol=1e-4)
