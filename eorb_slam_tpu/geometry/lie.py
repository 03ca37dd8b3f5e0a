"""Lie-group operations: SO(3), SE(3), Sim(3), quaternions.

Pure-jnp, broadcast-friendly: every op accepts leading batch dimensions and
is safe under ``jax.vmap`` / ``jax.jit``. Angles near zero use Taylor
expansions guarded with ``jnp.where`` so gradients stay finite.

Replaces the reference's Eigen/Sophus-style pose algebra used throughout
(reference: src/Converter.cc, Thirdparty/g2o se3quat/sim3 types); the
IMU right-Jacobian matches reference include/IMU/ImuTypes.h:142-152.

Conventions:
- rotations stored as 3x3 matrices ``R`` (row-major math: x_cam = R @ x_w + t),
- quaternions stored ``[w, x, y, z]`` (Hamilton),
- se3 tangent ordered ``[rho(3), phi(3)]`` = (translation, rotation),
- sim3 tangent ordered ``[rho(3), phi(3), sigma(1)]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: v (...,3) -> skew matrix (...,3,3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (...,3,3) skew -> (...,3)."""
    return jnp.stack([M[..., 2, 1], M[..., 0, 2], M[..., 1, 0]], axis=-1)


_SMALL2 = 1e-10  # squared-angle Taylor-guard threshold (theta < 1e-5)


def _safe_theta(t2):
    """sqrt(t2) whose tangent is finite at t2=0 (clamp BEFORE sqrt — the
    `where` after a singular op does not stop NaN tangents)."""
    small = t2 < _SMALL2
    return small, jnp.sqrt(jnp.where(small, 1.0, t2))


def _sinc_sq(t2):
    """sin(theta)/theta as a function of theta^2, AD-safe at 0."""
    small, th = _safe_theta(t2)
    return jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(th) / th)


def _cosc_sq(t2):
    """(1-cos(theta))/theta^2 as a function of theta^2, AD-safe at 0."""
    small, th = _safe_theta(t2)
    return jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(th)) / jnp.where(small, 1.0, t2))


def _sinc(x):
    """sin(x)/x with Taylor guard."""
    return _sinc_sq(x * x)


def _cosc(x):
    """(1-cos(x))/x^2 with Taylor guard."""
    return _cosc_sq(x * x)


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: rotation vector (...,3) -> rotation matrix (...,3,3)."""
    t2 = jnp.sum(phi * phi, axis=-1)
    K = hat(phi)
    K2 = K @ K
    a = _sinc_sq(t2)[..., None, None]
    b = _cosc_sq(t2)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (...,3,3) -> rotation vector (...,3).

    Handles theta near 0 and near pi (via quaternion route for stability).
    """
    q = quat_from_mat(R)
    return quat_log(q)


def so3_right_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian Jr of SO(3): exp(phi + dphi) ~ exp(phi) exp(Jr dphi).

    Matches the reference's IntegratedRotation.rightJ
    (reference include/IMU/ImuTypes.h:142-152).
    """
    t2 = jnp.sum(phi * phi, axis=-1)
    K = hat(phi)
    K2 = K @ K
    small, ts = _safe_theta(t2)
    a = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (ts - jnp.sin(ts)) / jnp.where(small, 1.0, ts * t2))
    b = _cosc_sq(t2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - b[..., None, None] * K + a[..., None, None] * K2


def so3_right_jacobian_inv(phi: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian of SO(3)."""
    t2 = jnp.sum(phi * phi, axis=-1)
    K = hat(phi)
    K2 = K @ K
    small, ts = _safe_theta(t2)
    # coefficient c = 1/theta^2 - (1+cos)/(2 theta sin)
    c = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        1.0 / jnp.where(small, 1.0, t2)
        - (1.0 + jnp.cos(ts)) / (2.0 * ts * jnp.sin(ts) + 1e-38),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + 0.5 * K + c[..., None, None] * K2


# ----------------------------------------------------------------- quaternions


def quat_from_mat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (...,3,3) -> unit quaternion (...,4) [w,x,y,z].

    Shepperd's branchless method: compute all four candidate quaternions and
    select the numerically best by the largest diagonal combination.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates (unnormalized), one per "pivot".
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    scores = jnp.stack(
        [tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1
    )
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (...,4cand,4comp)
    q = jnp.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-38)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (...,4) [w,x,y,z] -> rotation matrix (...,3,3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz], axis=-1),
        ],
        axis=-2,
    )


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation vector (...,3)."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vn2 = jnp.sum(v * v, axis=-1)
    small = vn2 < 1e-18
    vn = jnp.sqrt(jnp.where(small, 1.0, vn2))   # clamp BEFORE sqrt (AD-safe)
    theta = 2.0 * jnp.arctan2(vn, w)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 1e-9), theta / vn)
    return v * scale[..., None]


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical interpolation between unit quaternions; t broadcastable."""
    t = jnp.asarray(t)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    # margin must be representable in f32 (1 - 1e-9 rounds to exactly 1.0)
    small = dot > 1.0 - 1e-6
    # clamp BEFORE arccos: its derivative blows up at dot=1 (AD-safe guard)
    theta = jnp.arccos(jnp.where(small, 0.5, dot))
    sin_theta = jnp.sin(theta)
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / sin_theta)
    w1 = jnp.where(small, t, jnp.sin(t * theta) / sin_theta)
    q = w0 * q0 + w1 * q1
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-38)


# ------------------------------------------------------------------------ SE3
# An SE3 is a (...,4,4) homogeneous matrix; helpers build/split them.


def se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble (...,4,4) from R (...,3,3), t (...,3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def se3_rot(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def se3_trans(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def se3_identity(batch: tuple = (), dtype=jnp.float32) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), batch + (4, 4))


def se3_inv(T: jnp.ndarray) -> jnp.ndarray:
    R = se3_rot(T)
    t = se3_trans(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return se3(Rt, -(Rt @ t[..., None])[..., 0])


def se3_mul(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def se3_apply(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Transform points p (...,3) by T (...,4,4)."""
    return (se3_rot(T) @ p[..., None])[..., 0] + se3_trans(T)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se3 tangent (...,6) [rho, phi] -> (...,4,4)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t2 = jnp.sum(phi * phi, axis=-1)
    K = hat(phi)
    K2 = K @ K
    small, ts = _safe_theta(t2)
    b = _cosc_sq(t2)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (ts - jnp.sin(ts)) / jnp.where(small, 1.0, ts * t2))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + b[..., None, None] * K + c[..., None, None] * K2
    t = (V @ rho[..., None])[..., 0]
    return se3(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(...,4,4) -> tangent (...,6) [rho, phi]."""
    phi = so3_log(se3_rot(T))
    t2 = jnp.sum(phi * phi, axis=-1)
    K = hat(phi)
    K2 = K @ K
    small, ts = _safe_theta(t2)
    # V^{-1} = I - K/2 + c K^2
    c = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        (1.0 - ts * jnp.cos(ts / 2.0) / (2.0 * jnp.sin(ts / 2.0) + 1e-38))
        / jnp.where(small, 1.0, t2),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    Vinv = eye - 0.5 * K + c[..., None, None] * K2
    rho = (Vinv @ se3_trans(T)[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


# ----------------------------------------------------------------------- Sim3
# Sim3 represented as (R (...,3,3), t (...,3), s (...)): x -> s R x + t.
# Used by loop closing / essential-graph optimization
# (reference src/Sim3Solver.cc, src/Optimizer.cc OptimizeEssentialGraph).


def sim3_apply(R, t, s, p):
    return s[..., None] * (R @ p[..., None])[..., 0] + t


def sim3_inv(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return Rt, -s_inv[..., None] * (Rt @ t[..., None])[..., 0], s_inv


def sim3_mul(R1, t1, s1, R2, t2, s2):
    return (
        R1 @ R2,
        s1[..., None] * (R1 @ t2[..., None])[..., 0] + t1,
        s1 * s2,
    )


def sim3_exp(xi: jnp.ndarray):
    """sim3 tangent (...,7) [rho, phi, sigma] -> (R, t, s).

    Uses the closed-form W matrix (Ethan Eade's notes, public formulas).
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(phi)
    s = jnp.exp(sigma)
    K = hat(phi)
    K2 = K @ K

    t2 = jnp.sum(phi * phi, axis=-1)
    s2 = sigma * sigma
    small_sig = jnp.abs(sigma) < 1e-5
    small_th, th_s = _safe_theta(t2)

    sig_s = jnp.where(small_sig, 1.0, sigma)

    # W = A I + B K + C K^2 with  A = int_0^1 e^{sigma u} du,
    # B = (1/theta)   int e^{sigma u} sin(u theta) du,
    # C = (1/theta^2)(A - int e^{sigma u} cos(u theta) du).
    A = jnp.where(small_sig, 1.0 + sigma / 2.0 + s2 / 6.0, (s - 1.0) / sig_s)

    den = s2 + t2
    den_s = jnp.where(den < 1e-12, 1.0, den)
    sin_t, cos_t = jnp.sin(th_s), jnp.cos(th_s)
    t2_s = jnp.where(small_th, 1.0, t2)

    I1 = (s * (sig_s * sin_t - th_s * cos_t) + th_s) / den_s
    I2 = (s * (sig_s * cos_t + th_s * sin_t) - sig_s) / den_s
    B_gen = I1 / th_s
    C_gen = (A - I2) / t2_s

    # theta->0, general sigma limits
    B_small_th = (s * (sig_s - 1.0) + 1.0) / s2.clip(1e-12)
    C_small_th = (s * (s2 - 2.0 * sig_s + 2.0) - 2.0) / jnp.where(
        small_sig, 1.0, 2.0 * sig_s * s2
    )
    B_small_th = jnp.where(small_sig, 0.5 + sigma / 3.0, B_small_th)
    C_small_th = jnp.where(small_sig, 1.0 / 6.0 + sigma / 12.0, C_small_th)

    # sigma->0, general theta limits
    B_small_sig = _cosc_sq(t2)
    C_small_sig = jnp.where(
        small_th, 1.0 / 6.0, (th_s - jnp.sin(th_s)) / (th_s * t2 + 1e-38)
    )

    B = jnp.where(small_th, B_small_th, jnp.where(small_sig, B_small_sig, B_gen))
    C = jnp.where(small_th, C_small_th, jnp.where(small_sig, C_small_sig, C_gen))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    W = A[..., None, None] * eye + B[..., None, None] * K + C[..., None, None] * K2
    t = (W @ rho[..., None])[..., 0]
    return R, t, s


def project_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Re-project a near-rotation onto SO(3) (via quaternion round-trip).

    Iterative pose pipelines amplify float32 orthonormality drift
    GEOMETRICALLY through velocity composition (T_new @ transpose-inverse of
    T_last): left-multiplicative exp(dx) updates never repair the
    non-orthogonal component, so every solver output must be re-projected."""
    return quat_to_mat(quat_from_mat(R))


def se3_project(T: jnp.ndarray) -> jnp.ndarray:
    """Re-project the rotation block of an SE3 onto the manifold."""
    return se3(project_so3(se3_rot(T)), se3_trans(T))


def interpolate_se3(T0: jnp.ndarray, T1: jnp.ndarray, alpha) -> jnp.ndarray:
    """Geodesic interpolation between two SE3s (slerp on rotation, lerp on t).

    Used for event warp: interpolate camera pose at each event timestamp
    (reference src/Event/EventConversion.cc:280-360 interpolates axis-angle).
    """
    alpha = jnp.asarray(alpha)
    q0, q1 = quat_from_mat(se3_rot(T0)), quat_from_mat(se3_rot(T1))
    q = quat_slerp(q0, q1, alpha[..., None])
    t = (1.0 - alpha[..., None]) * se3_trans(T0) + alpha[..., None] * se3_trans(T1)
    return se3(quat_to_mat(q), t)
