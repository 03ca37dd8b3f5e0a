"""Local mapping: new-landmark triangulation, local BA, culling.

Replaces the LocalMapping thread's per-KF work (reference
src/LocalMapping.cc: ProcessNewKeyFrame → MapPointCulling →
CreateNewMapPoints → local BA → KeyFrameCulling) with jitted batch steps
invoked by the host orchestrator after each keyframe insertion. There is no
thread: the mapping step is an async-dispatchable jit call that the host can
overlap with the next tracking step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eorb_slam_tpu.geometry import camera as cam_mod, lie, triangulation
from eorb_slam_tpu.ops import frontend, matching
from eorb_slam_tpu.optim import schur_ba
from eorb_slam_tpu.slam import map_state as ms


@jax.jit
def create_new_landmarks(
    m: ms.MapState,
    cam_params: jnp.ndarray,
    kf_a: jnp.ndarray,   # () int32 — new keyframe slot
    kf_b: jnp.ndarray,   # () int32 — reference keyframe slot
    max_epipolar_px: float = 2.0,
    min_parallax_cos: float = 0.9998,
):
    """Triangulate new landmarks between two keyframes.

    Equivalent of LocalMapping::CreateNewMapPoints (reference
    src/LocalMapping.cc): match features not yet bound to a landmark under
    an epipolar gate, DLT-triangulate, apply cheirality/parallax/reproj
    checks, then prefix-sum allocate into free landmark slots."""
    Ta = m.kf_T[kf_a]
    Tb = m.kf_T[kf_b]

    free_a = m.kf_feat_valid[kf_a] & (m.kf_feat_lm[kf_a] < 0)
    free_b = m.kf_feat_valid[kf_b] & (m.kf_feat_lm[kf_b] < 0)

    xy_a = m.kf_xy[kf_a]
    xy_b = m.kf_xy[kf_b]
    ray_a = cam_mod.pinhole_unproject_linear(cam_params, xy_a)   # (N,3)
    ray_b = cam_mod.pinhole_unproject_linear(cam_params, xy_b)

    # epipolar gate from the known relative pose: x_b^T E x_a = 0
    Tba = Tb @ lie.se3_inv(Ta)
    R, t = lie.se3_rot(Tba), lie.se3_trans(Tba)
    E = lie.hat(t) @ R
    l_b = jnp.einsum("ij,aj->ai", E, ray_a)                      # (Na,3) lines in b
    num = jnp.einsum("ai,bi->ab", l_b, ray_b)                    # (Na,Nb)
    f2 = cam_params[0] * cam_params[1]
    d2 = num**2 / (l_b[:, 0] ** 2 + l_b[:, 1] ** 2 + 1e-12)[:, None] * f2
    pair = d2 <= max_epipolar_px**2                              # (Na,Nb)

    match_ab, dist = matching.match_nnratio(
        m.kf_desc_pm1[kf_a], free_a,
        m.kf_desc_pm1[kf_b], free_b,
        pair_mask=pair, max_dist=matching.TH_LOW, nn_ratio=0.8, mutual=True,
    )
    okm = match_ab >= 0
    idx_b = jnp.where(okm, match_ab, 0)

    pts = triangulation.triangulate_dlt(
        Ta[None], Tb[None], ray_a, ray_b[idx_b]
    )
    inv_s_a = cam_params[0] * frontend.inv_sigma(m.kf_octave[kf_a])
    inv_s_b = cam_params[0] * frontend.inv_sigma(m.kf_octave[kf_b][idx_b])
    ok_tri, _ = triangulation.triangulation_checks(
        Ta[None], Tb[None], ray_a, ray_b[idx_b], pts,
        min_parallax_cos=min_parallax_cos,
        inv_sigma1=inv_s_a, inv_sigma2=inv_s_b,
    )
    ok = okm & ok_tri

    m, lm_ids = ms.alloc_landmarks(
        m, pts, m.kf_desc_pm1[kf_a], ok,
        kf_a, jnp.arange(m.N, dtype=jnp.int32), kf_b, idx_b,
    )
    return m, jnp.sum((lm_ids >= 0).astype(jnp.int32))


@jax.jit
def create_new_landmarks_aligned(
    m: ms.MapState,
    cam_params: jnp.ndarray,
    kf_a: jnp.ndarray,        # () int32 — new keyframe slot
    kf_b: jnp.ndarray,        # () int32 — older keyframe slot
    slot_ok: jnp.ndarray,     # (N,) bool — feature row is the SAME track
    min_parallax_cos: float = 0.9998,
):
    """Triangulate landmarks between two keyframes whose feature arrays are
    slot-ALIGNED (continuous-tracker layout: one FeatureTrack = one row, see
    event/feature_tracks.py). No descriptor matching — correspondence is the
    row index, as in the reference's track-driven CreateNewMapPoints overload
    (EvLocalMapping, include/Event/EvLocalMapping.h:55-84)."""
    Ta = m.kf_T[kf_a]
    Tb = m.kf_T[kf_b]
    ray_a = cam_mod.pinhole_unproject_linear(cam_params, m.kf_xy[kf_a])
    ray_b = cam_mod.pinhole_unproject_linear(cam_params, m.kf_xy[kf_b])
    ok_in = (
        slot_ok
        & m.kf_feat_valid[kf_a] & m.kf_feat_valid[kf_b]
        & (m.kf_feat_lm[kf_a] < 0)
    )
    pts = triangulation.triangulate_dlt(Ta[None], Tb[None], ray_a, ray_b)
    inv_s_a = cam_params[0] * frontend.inv_sigma(m.kf_octave[kf_a])
    inv_s_b = cam_params[0] * frontend.inv_sigma(m.kf_octave[kf_b])
    ok_tri, _ = triangulation.triangulation_checks(
        Ta[None], Tb[None], ray_a, ray_b, pts,
        min_parallax_cos=min_parallax_cos,
        inv_sigma1=inv_s_a, inv_sigma2=inv_s_b,
    )
    ok = ok_in & ok_tri & jnp.isfinite(pts).all(axis=-1)
    feat_ids = jnp.arange(m.N, dtype=jnp.int32)
    m, lm_ids = ms.alloc_landmarks(
        m, pts, m.kf_desc_pm1[kf_a], ok, kf_a, feat_ids, kf_b, feat_ids
    )
    return m, lm_ids


@jax.jit
def create_depth_landmarks(
    m: ms.MapState,
    cam_params: jnp.ndarray,
    slot: jnp.ndarray,     # () int32 keyframe slot
    depth: jnp.ndarray,    # (N,) metric depth per feature (<=0 = unknown)
):
    """Create landmarks directly from per-feature depth (stereo / RGB-D).

    Equivalent of the stereo branch of Tracking::CreateNewKeyFrame /
    StereoInitialization (reference src/Tracking.cc): features with a valid
    depth and no landmark are unprojected at that depth and inserted. The
    two founding observation rows both point at (slot, feat) — a depth-
    founded landmark is fully constrained by one view, and the duplicated
    row (a 2x-weighted reprojection residual in BA) keeps it clear of the
    min-two-observations culling rule without a schema change."""
    T = m.kf_T[slot]
    xy = m.kf_xy[slot]
    rays = cam_mod.pinhole_unproject_linear(cam_params, xy)       # (N,3)
    pts_c = rays * depth[:, None]
    pts_w = lie.se3_apply(lie.se3_inv(T), pts_c)
    ok = (
        m.kf_feat_valid[slot]
        & (m.kf_feat_lm[slot] < 0)
        & (depth > 0)
        & jnp.isfinite(depth)
        & jnp.isfinite(pts_w).all(axis=-1)
    )
    feat_ids = jnp.arange(m.N, dtype=jnp.int32)
    m, lm_ids = ms.alloc_landmarks(
        m, pts_w, m.kf_desc_pm1[slot], ok, slot, feat_ids, slot, feat_ids
    )
    return m, jnp.sum((lm_ids >= 0).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("iters",))
def local_ba(
    m: ms.MapState,
    cam_params: jnp.ndarray,
    kf_free: jnp.ndarray,   # (K,) bool — poses to optimize (rest fixed)
    iters: int = 8,
):
    """Local bundle adjustment directly over the map arrays.

    The landmark-major obs table IS the BAProblem — no graph construction
    step (the reference spends significant time building g2o graphs per BA,
    src/Optimizer.cc:2353-2700)."""
    obs_uv = m.kf_xy[m.obs_kf, m.obs_feat]                    # (M,P,2)
    obs_oct = m.kf_octave[m.obs_kf, m.obs_feat]
    inv_sigma = frontend.inv_sigma(obs_oct)
    prob = schur_ba.BAProblem(
        cam_params=cam_params,
        kf_T=m.kf_T,
        kf_fixed=~kf_free,
        kf_valid=m.kf_valid,
        lm_pos=m.lm_pos,
        lm_valid=m.lm_valid,
        obs_kf=m.obs_kf,
        obs_uv=obs_uv,
        obs_inv_sigma=inv_sigma,
        obs_valid=m.obs_valid & m.kf_valid[m.obs_kf],
        )
    res = schur_ba.bundle_adjust(prob, iters=iters)

    # write back + prune outlier observations (reference erases outlier
    # edges after LBA); keep the founding pair even if flagged, to avoid
    # instant starvation of fresh landmarks
    new_obs_valid = m.obs_valid & (res.obs_inlier | (m.lm_nobs[:, None] <= 2))
    m = m._replace(kf_T=res.kf_T, lm_pos=res.lm_pos, obs_valid=new_obs_valid)

    # landmark culling: fewer than 2 surviving observations -> invalid
    nobs = jnp.sum(m.obs_valid, axis=1)
    m = m._replace(lm_valid=m.lm_valid & (nobs >= 2))
    return m, res.cost0, res.cost
