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


@jax.jit
def fuse_duplicates(
    m: ms.MapState,
    cam_params: jnp.ndarray,
    kf_a: jnp.ndarray,      # () int32 — new keyframe slot
    kf_b: jnp.ndarray,      # () int32 — covisible neighbor slot
    search_px: float = 3.0,
):
    """Merge duplicate landmarks between two keyframes.

    Equivalent of LocalMapping::SearchInNeighbors + ORBmatcher::Fuse
    (reference src/LocalMapping.cc, src/ORBmatcher.cc:1407): project the
    neighbor's landmarks into the new keyframe; where a landmark-bearing
    feature of A descriptor-matches a projected landmark of B that is a
    DIFFERENT landmark, the two are duplicates of the same 3D point — the
    one with more observations wins (MapPoint::Replace), the loser's
    observations are rewired into the winner's row and every feature link
    is redirected.

    Returns (MapState, n_fused)."""
    P = m.P
    M = m.M
    Ta = m.kf_T[kf_a]
    la = m.kf_feat_lm[kf_a]
    lb = m.kf_feat_lm[kf_b]
    la_c = jnp.clip(la, 0)
    lb_c = jnp.clip(lb, 0)
    va = m.kf_feat_valid[kf_a] & (la >= 0) & m.lm_valid[la_c]
    vb = m.kf_feat_valid[kf_b] & (lb >= 0) & m.lm_valid[lb_c]

    # project B's landmarks into A's image; gate candidate pairs by pixel
    # distance to A's features
    pos_b = m.lm_pos[lb_c]
    pc = lie.se3_apply(Ta, pos_b)
    uv = cam_mod.pinhole_project_linear(cam_params, pc)
    vb = vb & (pc[:, 2] > 0.05) & jnp.isfinite(uv).all(axis=-1)
    d2 = jnp.sum((m.kf_xy[kf_a][:, None, :] - uv[None, :, :]) ** 2, axis=-1)
    pair = d2 <= search_px**2

    j, dist = matching.match_nnratio(
        m.kf_desc_pm1[kf_a], va, m.kf_desc_pm1[kf_b], vb,
        pair_mask=pair, max_dist=matching.TH_LOW, nn_ratio=0.8, mutual=True,
    )
    lb_j = lb[jnp.clip(j, 0)]
    dup = (j >= 0) & va & (la != lb_j)
    # 3D consistency: real duplicates of one physical point sit close in
    # space; without this gate, coarse features (event MCIs) merge distinct
    # nearby landmarks and the map degrades (reference Fuse checks the
    # reprojection chi2 of the candidate point in the target view)
    pos_a = m.lm_pos[la_c]
    pos_bj = m.lm_pos[jnp.clip(lb_j, 0)]
    z_a = lie.se3_apply(Ta, pos_a)[:, 2]
    d3 = jnp.linalg.norm(pos_a - pos_bj, axis=-1)
    dup = dup & (d3 <= 0.03 * jnp.maximum(z_a, 1e-3))

    # winner = more observations (MapPoint::Replace keeps higher nObs)
    na = m.lm_nobs[la_c]
    nb = m.lm_nobs[jnp.clip(lb_j, 0)]
    w = jnp.where(na >= nb, la, lb_j)
    l = jnp.where(na >= nb, lb_j, la)
    w_c = jnp.clip(w, 0)
    l_c = jnp.clip(l, 0)

    # keep one merge per loser and per winner (best descriptor distance),
    # and never merge a landmark that is simultaneously a winner elsewhere
    INF = jnp.asarray(matching.BIG, dist.dtype)
    d_eff = jnp.where(dup, dist, INF)
    best_l = jnp.full((M,), INF).at[l_c].min(d_eff)
    best_w = jnp.full((M,), INF).at[w_c].min(d_eff)
    keep = dup & (d_eff <= best_l[l_c]) & (d_eff <= best_w[w_c])
    win_mask = jnp.zeros(M, bool).at[jnp.where(keep, w_c, M)].set(
        True, mode="drop")
    keep = keep & ~win_mask[l_c]
    # (exact distance ties could keep two pairs sharing a loser; the later
    # scatter then wins arbitrarily — duplicates are rare enough that the
    # occasional dropped merge is harmless)

    # move the loser's valid observations into the winner's free columns
    occ_w = jnp.sum(m.obs_valid[w_c], axis=1).astype(jnp.int32)   # (N,)
    lrow_valid = m.obs_valid[l_c] & keep[:, None]                 # (N,P)
    rank = jnp.cumsum(lrow_valid, axis=1) - 1                     # (N,P)
    tgt = occ_w[:, None] + rank
    ok_move = lrow_valid & (tgt >= 0) & (tgt < P)
    row_idx = jnp.where(ok_move, w_c[:, None], M)                 # drop OOB
    col_idx = jnp.clip(tgt, 0, P - 1)
    obs_kf = m.obs_kf.at[row_idx, col_idx].set(m.obs_kf[l_c], mode="drop")
    obs_feat = m.obs_feat.at[row_idx, col_idx].set(
        m.obs_feat[l_c], mode="drop")
    obs_valid = m.obs_valid.at[row_idx, col_idx].set(True, mode="drop")

    # kill the losers: invalidate their rows + redirect every feature link
    dead = jnp.where(keep, l_c, M)
    obs_valid = obs_valid.at[dead].set(jnp.zeros(P, bool), mode="drop")
    lm_valid = m.lm_valid.at[dead].set(False, mode="drop")
    remap = jnp.arange(M, dtype=jnp.int32).at[dead].set(w_c, mode="drop")
    kf_feat_lm = jnp.where(m.kf_feat_lm >= 0,
                           remap[jnp.clip(m.kf_feat_lm, 0)], -1)

    m = m._replace(
        obs_kf=obs_kf, obs_feat=obs_feat, obs_valid=obs_valid,
        lm_valid=lm_valid, kf_feat_lm=kf_feat_lm,
        lm_nobs=jnp.sum(obs_valid, axis=1, dtype=jnp.int32),
    )
    return m, jnp.sum(keep.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("iters", "do_fuse", "refresh_desc"))
def keyframe_mapping_step(
    m: ms.MapState,
    cam_params: jnp.ndarray,
    slot: jnp.ndarray,          # () int32 new keyframe slot
    Tcw: jnp.ndarray,
    ts,
    xy: jnp.ndarray,
    octave: jnp.ndarray,
    angle: jnp.ndarray,
    desc_pm1: jnp.ndarray,
    feat_valid: jnp.ndarray,
    feat_lm: jnp.ndarray,
    tri_partners: jnp.ndarray,  # (T,) int32 older KF slots (pad = repeats)
    fuse_partners: jnp.ndarray, # (F,) int32 covisible neighbors
    kf_free: jnp.ndarray,       # (K,) bool local-BA window
    iters: int = 8,
    do_fuse: bool = True,
    refresh_desc: bool = True,
):
    """The ENTIRE per-keyframe mapping pass as ONE dispatch: KF insertion,
    multi-partner triangulation, duplicate fusion, local BA + culling +
    descriptor refresh — the reference's LocalMapping::Run body
    (src/LocalMapping.cc:72-284) minus KeyFrameCulling (host policy).

    Returns (MapState, Tcw_optimized, stats[n_lm, n_fused, cost0, cost]).
    Padded partner slots equal to `slot` are safe no-ops (zero-baseline
    pairs fail the parallax gate; self-fusion only merges genuine in-frame
    duplicates)."""
    m = ms.insert_keyframe(
        m, slot, Tcw, ts, xy, octave, angle, desc_pm1, feat_valid, feat_lm
    )

    def tri_body(m, ref_slot):
        m, _ = create_new_landmarks(m, cam_params, slot, ref_slot)
        return m, None

    m, _ = jax.lax.scan(tri_body, m, tri_partners)

    n_fused = jnp.asarray(0, jnp.int32)
    if do_fuse:
        def fuse_body(m, nb):
            m, nf = fuse_duplicates(m, cam_params, slot, nb)
            return m, nf

        m, nfs = jax.lax.scan(fuse_body, m, fuse_partners)
        n_fused = jnp.sum(nfs)

    m, c0, c1 = local_ba(m, cam_params, kf_free, iters=iters,
                         refresh_desc=refresh_desc)
    # BA telemetry (the reference's Local*BA out-params: fixed/opt KFs,
    # MPs, edges — include/Optimizer.h:64-65): packed into the one stats
    # pull so observability costs no extra round trip
    n_edges = jnp.sum(m.obs_valid & m.lm_valid[:, None]
                      & m.kf_valid[m.obs_kf])
    stats = jnp.stack([
        jnp.sum(m.lm_valid).astype(jnp.float32),
        n_fused.astype(jnp.float32), c0, c1,
        jnp.sum(kf_free & m.kf_valid).astype(jnp.float32),
        jnp.sum(~kf_free & m.kf_valid).astype(jnp.float32),
        n_edges.astype(jnp.float32),
    ])
    return m, m.kf_T[slot], stats


@jax.jit
def update_landmark_descriptors(m: ms.MapState) -> ms.MapState:
    """Recompute each landmark's representative descriptor as the MEDOID of
    its observed descriptors (min mean distance to the others — the
    reference's MapPoint::ComputeDistinctiveDescriptors uses min-median,
    src/MapPoint.cc). Without this the founding descriptor goes stale as
    the viewpoint changes and projection matching starves."""
    d = m.kf_desc_pm1[m.obs_kf, m.obs_feat]                    # (M,P,256)
    valid = m.obs_valid                                        # (M,P)
    df = d.astype(jnp.float32)
    dots = jnp.einsum("mpc,mqc->mpq", df, df)
    dist = (256.0 - dots) * 0.5
    pair_ok = valid[:, :, None] & valid[:, None, :]
    sums = jnp.where(pair_ok, dist, 0.0).sum(-1)
    cnt = pair_ok.sum(-1)
    score = jnp.where(valid & (cnt > 0), sums / jnp.maximum(cnt, 1), 1e9)
    best = jnp.argmin(score, axis=1)                           # (M,)
    new_desc = jnp.take_along_axis(d, best[:, None, None], axis=1)[:, 0]
    has = valid.any(axis=1)
    return m._replace(
        lm_desc_pm1=jnp.where(has[:, None], new_desc, m.lm_desc_pm1)
    )


@functools.partial(jax.jit, static_argnames=("iters", "refresh_desc"))
def local_ba(
    m: ms.MapState,
    cam_params: jnp.ndarray,
    kf_free: jnp.ndarray,   # (K,) bool — poses to optimize (rest fixed)
    iters: int = 8,
    refresh_desc: bool = True,
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

    # landmark culling: fewer than 2 surviving observations -> invalid;
    # clear feature links to the culled landmarks so every consumer of
    # kf_feat_lm sees a consistent table
    nobs = jnp.sum(m.obs_valid, axis=1, dtype=jnp.int32)
    lm_valid = m.lm_valid & (nobs >= 2)
    link_ok = (m.kf_feat_lm >= 0) & lm_valid[jnp.clip(m.kf_feat_lm, 0)]
    m = m._replace(lm_valid=lm_valid, lm_nobs=nobs,
                   kf_feat_lm=jnp.where(link_ok, m.kf_feat_lm, -1))
    if refresh_desc:
        # keep representative descriptors fresh as viewpoints accumulate
        # (MapPoint::ComputeDistinctiveDescriptors). Gated OFF for small
        # sensors: on blurry MCI features the medoid hops between unstable
        # observations and tracking accuracy degrades (measured)
        m = update_landmark_descriptors(m)
    return m, res.cost0, res.cost
