"""Monocular/stereo reprojection residuals with analytic Jacobians.

Replaces g2o's EdgeSE3ProjectXYZ(OnlyPose) / EdgeMono / EdgeStereo
(reference include/OptimizableTypes.h:36-201, include/G2oTypes.h) with
batched pure functions over masked observation arrays.

Pose convention: ``Tcw`` maps world to camera, updates are LEFT-multiplied
increments ``Tcw <- exp(dx) @ Tcw`` with tangent ``dx = [rho, phi]``.
First-order: d(pc)/d(rho) = I, d(pc)/d(phi) = -hat(pc).
Observations are stored undistorted, so the linear (K-only) projection is
used — same convention as the reference's optimizers (src/Frame.cc
UndistortKeyPoints once, then linear edges in src/Optimizer.cc).
"""

from __future__ import annotations

import jax.numpy as jnp

from eorb_slam_tpu.geometry import lie
from eorb_slam_tpu.geometry import camera as cam


def transform_points(Tcw: jnp.ndarray, pts_w: jnp.ndarray) -> jnp.ndarray:
    """World points (...,3) into camera frame given Tcw (...,4,4)."""
    return lie.se3_apply(Tcw, pts_w)


def mono_residual(cam_params, Tcw, pts_w, uv_obs, inv_sigma):
    """Residual (N,2), scaled by inv_sigma (per-obs sqrt information).

    inv_sigma mirrors the per-octave invSigma2 of the reference (keypoint
    scale pyramid): residual_scaled = inv_sigma * (uv_obs - proj(pc))."""
    pc = transform_points(Tcw, pts_w)
    uv_hat = cam.pinhole_project_linear(cam_params, pc)
    return (uv_obs - uv_hat) * inv_sigma[..., None]


def mono_residual_jac(cam_params, Tcw, pts_w, uv_obs, inv_sigma):
    """Residual (N,2) + J_pose (N,2,6) + J_point (N,2,3), analytic.

    J are Jacobians of the *residual* (note the minus sign versus the
    projection Jacobian)."""
    pc = transform_points(Tcw, pts_w)
    uv_hat = cam.pinhole_project_linear(cam_params, pc)
    r = (uv_obs - uv_hat) * inv_sigma[..., None]

    Jproj = cam.pinhole_project_jac_point(cam_params, pc)  # (N,2,3)
    # d pc / d dx = [I | -hat(pc)] for left-multiplied exp(dx) Tcw
    N = pc.shape[0]
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (N, 3, 3))
    dpc_dx = jnp.concatenate([I3, -lie.hat(pc)], axis=-1)  # (N,3,6)
    J_pose = -(Jproj @ dpc_dx) * inv_sigma[..., None, None]  # (N,2,6)
    R = lie.se3_rot(Tcw)
    J_point = -(Jproj @ R) * inv_sigma[..., None, None]  # (N,2,3)
    return r, J_pose, J_point


def depth_positive(Tcw, pts_w) -> jnp.ndarray:
    """Validity gate: point in front of the camera (cheirality)."""
    return transform_points(Tcw, pts_w)[..., 2] > 0.0
