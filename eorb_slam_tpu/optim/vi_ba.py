"""Visual-inertial bundle adjustment: 15-dof states, Schur landmarks.

One engine for the reference's inertial BA recipes — ``Optimizer::
{LocalInertialBA, FullInertialBA}`` (reference src/Optimizer.cc:5617,:438):
each keyframe state is (pose 6, velocity 3, gyro bias 3, acc bias 3);
landmarks are Schur-eliminated exactly as in the visual engine
(optim/schur_ba.py — its reduced (K,K,6,6) camera system embeds into the
pose block of the (K,K,15,15) VI system); 9-dim preintegration factors and
bias random-walk factors couple consecutive keyframes.

Jacobian strategy: the visual part is analytic (shared with schur_ba); the
few inertial edges (K-1 of them) get forward-mode autodiff over the 30
perturbation dofs of their two endpoint states — negligible next to the
(M,P) visual work, and it keeps the residual definition in one place
(optim/inertial.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eorb_slam_tpu.geometry import lie
from eorb_slam_tpu.imu import preintegration as pre_mod
from eorb_slam_tpu.optim import inertial, linalg, robust, schur_ba


class VIBAProblem(NamedTuple):
    visual: schur_ba.BAProblem           # poses in kf_T are Tcw
    Tbc: jnp.ndarray                     # (4,4)
    kf_vel: jnp.ndarray                  # (K,3) body velocity per KF
    kf_bg: jnp.ndarray                   # (K,3)
    kf_ba: jnp.ndarray                   # (K,3)
    pre: pre_mod.Preintegrated           # batched (K,...); slot k: prev[k] -> k
    edge_valid: jnp.ndarray              # (K,) bool
    g: jnp.ndarray                       # (3,) gravity in world
    # temporal predecessor slot per keyframe (-1 = none); None = arange-1
    # (slots are REUSED after keyframe culling, so slot order is not
    # temporal order — the chain must be explicit)
    prev: jnp.ndarray | None = None


class VIBAResult(NamedTuple):
    kf_T: jnp.ndarray
    kf_vel: jnp.ndarray
    kf_bg: jnp.ndarray
    kf_ba: jnp.ndarray
    lm_pos: jnp.ndarray
    obs_inlier: jnp.ndarray
    cost0: jnp.ndarray
    cost: jnp.ndarray


def _edge_residual(p: VIBAProblem, kf_T, kf_vel, kf_bg, kf_ba,
                   k, a, dx1, dx2):
    """Whitened inertial residual of edge k with perturbations applied.

    dx = (xi 6, dv 3, dbg 3, dba 3) on each endpoint; pose perturbation is
    left-multiplicative on Tcw, matching schur_ba's convention so the
    assembled blocks share one coordinate system."""
    T1 = lie.se3_exp(dx1[:6]) @ kf_T[a]
    T2 = lie.se3_exp(dx2[:6]) @ kf_T[k]
    Twb1 = pre_mod.Twb_from_Tcw(T1, p.Tbc)
    Twb2 = pre_mod.Twb_from_Tcw(T2, p.Tbc)
    v1 = kf_vel[a] + dx1[6:9]
    v2 = kf_vel[k] + dx2[6:9]
    bg = kf_bg[a] + dx1[9:12]
    ba = kf_ba[a] + dx1[12:15]
    pre_k = jax.tree_util.tree_map(lambda x: x[k], p.pre)
    return inertial.whitened_inertial_residual(
        Twb1[:3, :3], Twb1[:3, 3], v1, bg, ba,
        Twb2[:3, :3], Twb2[:3, 3], v2, pre_k, p.g,
    )


def _bias_rw_residual(p: VIBAProblem, kf_bg, kf_ba, k, a, dx1, dx2):
    """Whitened bias random-walk residuals (EdgeGyroRW/EdgeAccRW): the
    information comes from the preintegration's walk block C[9:15,9:15]."""
    dbg = (kf_bg[k] + dx2[9:12]) - (kf_bg[a] + dx1[9:12])
    dba = (kf_ba[k] + dx2[12:15]) - (kf_ba[a] + dx1[12:15])
    Cw = p.pre.C[k, 9:15, 9:15] + jnp.eye(6, dtype=dbg.dtype) * 1e-12
    L = jnp.linalg.cholesky(jnp.linalg.inv(Cw))
    return L.T @ jnp.concatenate([dbg, dba])


def _inertial_system(p: VIBAProblem, kf_T, kf_vel, kf_bg, kf_ba):
    """Assemble H contributions (K,K,15,15) and rhs (K,15) of all inertial
    + bias-RW edges, plus their total cost."""
    K = kf_T.shape[0]
    dtype = kf_T.dtype
    z = jnp.zeros(15, dtype)
    ks = jnp.arange(K)
    prev = p.prev if p.prev is not None else ks - 1
    a_idx = jnp.maximum(prev, 0)

    def per_edge(k, a):
        r_fn = lambda d1, d2: jnp.concatenate([
            _edge_residual(p, kf_T, kf_vel, kf_bg, kf_ba, k, a, d1, d2),
            _bias_rw_residual(p, kf_bg, kf_ba, k, a, d1, d2),
        ])
        r = r_fn(z, z)                                        # (15,)
        J1 = jax.jacfwd(r_fn, argnums=0)(z, z)                # (15,15)
        J2 = jax.jacfwd(r_fn, argnums=1)(z, z)
        return r, J1, J2

    r, J1, J2 = jax.vmap(per_edge)(ks, a_idx)
    w = (p.edge_valid & (prev >= 0)).astype(dtype)
    r = r * w[:, None]
    J1 = J1 * w[:, None, None]
    J2 = J2 * w[:, None, None]

    H = jnp.zeros((K, K, 15, 15), dtype)
    b = jnp.zeros((K, 15), dtype)
    H = H.at[a_idx, a_idx].add(jnp.einsum("kri,krj->kij", J1, J1))
    H = H.at[a_idx, ks].add(jnp.einsum("kri,krj->kij", J1, J2))
    H = H.at[ks, a_idx].add(jnp.einsum("kri,krj->kij", J2, J1))
    H = H.at[ks, ks].add(jnp.einsum("kri,krj->kij", J2, J2))
    b = b.at[a_idx].add(-jnp.einsum("kri,kr->ki", J1, r))
    b = b.at[ks].add(-jnp.einsum("kri,kr->ki", J2, r))
    cost = jnp.sum(r * r)
    return H, b, cost


def _vi_cost(p: VIBAProblem, kf_T, kf_vel, kf_bg, kf_ba, lm_pos):
    use_huber = jnp.asarray(True)
    _, _, chi2, _, pc = schur_ba._residuals_and_weights(
        p.visual, kf_T, lm_pos, use_huber
    )
    # cheirality violations score a large penalty under the STATIC validity
    # instead of vanishing from the sum (see schur_ba._lm_loop: a divergent
    # step that kills every observation must not read as cost 0)
    pv = p.visual
    valid_static = pv.obs_valid & pv.lm_valid[:, None] & pv.kf_valid[pv.obs_kf]
    c = robust.huber_cost(chi2, robust.CHI2_MONO)
    c = jnp.where(pc[..., 2] > 0.0, c, 1e6)
    c_vis = jnp.sum(c * valid_static)
    _, _, c_in = _inertial_system(p, kf_T, kf_vel, kf_bg, kf_ba)
    return c_vis + c_in


@functools.partial(jax.jit, static_argnames=("iters",))
def vi_bundle_adjust(p: VIBAProblem, iters: int = 8,
                     lam0: float = 1e-4) -> VIBAResult:
    dtype = p.visual.kf_T.dtype
    K = p.visual.kf_T.shape[0]
    use_huber = jnp.asarray(True)
    I15 = jnp.eye(15, dtype=dtype)

    def build_and_solve(kf_T, kf_vel, kf_bg, kf_ba, lm_pos, lam):
        S6, b6, W_blk, Vinv, b_l = schur_ba._schur_pieces(
            p.visual._replace(kf_T=kf_T, lm_pos=lm_pos),
            kf_T, lm_pos, lam, use_huber,
        )
        H_in, b_in, _ = _inertial_system(p, kf_T, kf_vel, kf_bg, kf_ba)
        H = H_in.at[:, :, :6, :6].add(S6)
        b = b_in.at[:, :6].add(b6)

        # damping + gauge masking (fixed/invalid states -> identity rows)
        diag_scale = jnp.maximum(
            jnp.trace(H[jnp.arange(K), jnp.arange(K)],
                      axis1=-2, axis2=-1)[:, None, None] / 15.0, 1e-6
        )
        H = H.at[jnp.arange(K), jnp.arange(K)].add(lam * I15[None] * diag_scale)
        free = (p.visual.kf_valid & ~p.visual.kf_fixed).astype(dtype)
        mask2 = free[:, None] * free[None, :]
        H = H * mask2[:, :, None, None]
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            I15[None] * (1.0 - free)[:, None, None]
        )
        b = b * free[:, None]

        Hd = H.transpose(0, 2, 1, 3).reshape(K * 15, K * 15)
        dx = linalg.solve_spd_jacobi(Hd, b.reshape(-1)).reshape(K, 15)
        dx = dx * free[:, None]
        dx_l = schur_ba._backsub_landmarks(
            p.visual._replace(kf_T=kf_T, lm_pos=lm_pos),
            W_blk, Vinv, b_l, dx[:, :6],
        )
        return dx, dx_l

    def body(_, state):
        kf_T, kf_vel, kf_bg, kf_ba, lm_pos, lam, cost = state
        dx, dx_l = build_and_solve(kf_T, kf_vel, kf_bg, kf_ba, lm_pos, lam)
        kf_T_n = jax.vmap(lambda d, T: lie.se3_project(lie.se3_exp(d) @ T))(
            dx[:, :6], kf_T
        )
        vel_n = kf_vel + dx[:, 6:9]
        bg_n = kf_bg + dx[:, 9:12]
        ba_n = kf_ba + dx[:, 12:15]
        lm_n = lm_pos + dx_l
        c_n = _vi_cost(p, kf_T_n, vel_n, bg_n, ba_n, lm_n)
        acc = c_n < cost
        st = (
            jnp.where(acc, kf_T_n, kf_T),
            jnp.where(acc, vel_n, kf_vel),
            jnp.where(acc, bg_n, kf_bg),
            jnp.where(acc, ba_n, kf_ba),
            jnp.where(acc, lm_n, lm_pos),
            jnp.where(acc, jnp.maximum(lam * 0.5, 1e-9),
                      jnp.minimum(lam * 10.0, 1e4)),
            jnp.where(acc, c_n, cost),
        )
        return st

    cost0 = _vi_cost(p, p.visual.kf_T, p.kf_vel, p.kf_bg, p.kf_ba,
                     p.visual.lm_pos)
    kf_T, kf_vel, kf_bg, kf_ba, lm_pos, _, cost = jax.lax.fori_loop(
        0, iters, body,
        (p.visual.kf_T, p.kf_vel, p.kf_bg, p.kf_ba, p.visual.lm_pos,
         jnp.asarray(lam0, dtype), cost0),
    )
    _, _, chi2f, validf, _ = schur_ba._residuals_and_weights(
        p.visual, kf_T, lm_pos, use_huber
    )
    inlier = validf & (chi2f <= robust.CHI2_MONO)
    return VIBAResult(kf_T, kf_vel, kf_bg, kf_ba, lm_pos, inlier, cost0, cost)


@functools.partial(jax.jit, static_argnames=("iters", "return_H"))
def pose_inertial_optimization(
    cam_params: jnp.ndarray,
    Tcw0: jnp.ndarray,          # (4,4) current-frame pose init
    vel0: jnp.ndarray, bg0: jnp.ndarray, ba0: jnp.ndarray,
    pts_w: jnp.ndarray,         # (N,3) matched landmarks (fixed)
    uv_obs: jnp.ndarray,        # (N,2)
    inv_sigma: jnp.ndarray,     # (N,)
    obs_valid: jnp.ndarray,     # (N,)
    Tcw_ref: jnp.ndarray,       # (4,4) last KF pose (fixed)
    vel_ref: jnp.ndarray,
    pre: pre_mod.Preintegrated,
    Tbc: jnp.ndarray,
    g: jnp.ndarray = pre_mod.GRAVITY_W,
    iters: int = 10,
    return_H: bool = False,
):
    """Motion-only VI optimization of the current frame's 15-dof state
    against fixed map points + one inertial factor to the reference frame
    (reference Optimizer::PoseInertialOptimizationLastKeyFrame,
    src/Optimizer.cc:8606). Returns (Tcw, vel, bg, ba, inlier, n_inliers)
    — plus the final 15x15 information matrix when ``return_H`` (seeds the
    marginal PoseImuPrior carried into the LastFrame variant, reference
    ConstraintPoseImu construction at src/Optimizer.cc:8900-8950)."""
    from eorb_slam_tpu.geometry import camera as cam_mod

    dtype = Tcw0.dtype
    Twb_ref = pre_mod.Twb_from_Tcw(Tcw_ref, Tbc)

    def residuals(theta, Tcw, vel, bg, ba, w_obs):
        T = lie.se3_exp(theta[:6]) @ Tcw
        v = vel + theta[6:9]
        bgc = bg + theta[9:12]
        bac = ba + theta[12:15]
        pc = lie.se3_apply(T, pts_w)
        uv_hat = cam_mod.pinhole_project_linear(cam_params, pc)
        r_vis = (uv_obs - uv_hat) * inv_sigma[..., None] * w_obs[..., None]
        Twb = pre_mod.Twb_from_Tcw(T, Tbc)
        r_in = inertial.whitened_inertial_residual(
            Twb_ref[:3, :3], Twb_ref[:3, 3], vel_ref, bgc, bac,
            Twb[:3, :3], Twb[:3, 3], v, pre, g,
        )
        # soft prior keeping biases near their propagated values
        r_b = jnp.concatenate([(bgc - bg0) * 1e2, (bac - ba0) * 1e1])
        return jnp.concatenate([r_vis.reshape(-1), r_in, r_b])

    def gn_round(carry, chi2_th):
        Tcw, vel, bg, ba = carry
        pc = lie.se3_apply(Tcw, pts_w)
        uv_hat = cam_mod.pinhole_project_linear(cam_params, pc)
        r = (uv_obs - uv_hat) * inv_sigma[..., None]
        chi2 = jnp.sum(r * r, axis=-1)
        w_rob = jnp.sqrt(robust.huber_weight(chi2, chi2_th))
        w_obs = w_rob * (obs_valid & (pc[..., 2] > 0)).astype(dtype)

        def body(_, st):
            Tcw, vel, bg, ba = st
            z = jnp.zeros(15, dtype)
            r0 = residuals(z, Tcw, vel, bg, ba, w_obs)
            J = jax.jacfwd(residuals)(z, Tcw, vel, bg, ba, w_obs)
            H = J.T @ J + jnp.eye(15, dtype=dtype) * 1e-6
            dx = jnp.linalg.solve(H, -J.T @ r0)
            Tcw = lie.se3_project(lie.se3_exp(dx[:6]) @ Tcw)
            return Tcw, vel + dx[6:9], bg + dx[9:12], ba + dx[12:15]

        st = jax.lax.fori_loop(0, iters // 4 + 1, body, (Tcw, vel, bg, ba))
        return st, None

    # 4 re-weighting rounds with a shrinking chi2 gate (reference uses 4
    # rounds of 10 iterations with chi2Mono gates)
    gates = jnp.asarray([robust.CHI2_MONO * 4, robust.CHI2_MONO * 2,
                         robust.CHI2_MONO, robust.CHI2_MONO], dtype)
    (Tcw, vel, bg, ba), _ = jax.lax.scan(
        gn_round, (Tcw0, vel0, bg0, ba0), gates
    )
    pc = lie.se3_apply(Tcw, pts_w)
    uv_hat = cam_mod.pinhole_project_linear(cam_params, pc)
    chi2 = jnp.sum(((uv_obs - uv_hat) * inv_sigma[..., None]) ** 2, axis=-1)
    inlier = obs_valid & (pc[..., 2] > 0) & (chi2 <= robust.CHI2_MONO)
    out = (Tcw, vel, bg, ba, inlier, jnp.sum(inlier.astype(jnp.int32)))
    if not return_H:
        return out
    z = jnp.zeros(15, dtype)
    w_obs = jnp.sqrt(robust.huber_weight(chi2, robust.CHI2_MONO)) * \
        inlier.astype(dtype)
    J = jax.jacfwd(residuals)(z, Tcw, vel, bg, ba, w_obs)
    return out + (J.T @ J,)
