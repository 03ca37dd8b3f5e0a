"""Loop closing stack: BoW retrieval, Sim3 RANSAC, pose graph, reloc, atlas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eorb_slam_tpu.geometry import camera, lie, sim3_solver
from eorb_slam_tpu.optim import pose_graph
from eorb_slam_tpu.retrieval import bow
from eorb_slam_tpu.slam import atlas as atlas_mod
from eorb_slam_tpu.slam import covisibility, loop_closing, map_state as ms
from eorb_slam_tpu.slam import relocalization

CAM = camera.make_pinhole(458.0, 457.0, 376.0, 240.0)


def rand_desc(rng, n):
    return (rng.integers(0, 2, (n, 256)).astype(np.int8) * 2 - 1)


# --------------------------------------------------------------------- sim3
def test_umeyama_recovers_sim3():
    rng = np.random.default_rng(0)
    P = rng.normal(size=(50, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.2, -0.1, 0.3], jnp.float32)))
    s, t = 1.7, np.array([0.5, -1.0, 2.0], np.float32)
    Q = s * P @ R.T + t
    R2, t2, s2 = sim3_solver.umeyama(jnp.asarray(P), jnp.asarray(Q))
    assert np.allclose(np.asarray(R2), R, atol=1e-4)
    assert np.allclose(np.asarray(t2), t, atol=1e-3)
    assert abs(float(s2) - s) < 1e-3


def test_sim3_ransac_with_outliers():
    rng = np.random.default_rng(1)
    N = 128
    P = np.concatenate(
        [rng.uniform(-2, 2, (N, 2)), rng.uniform(3, 8, (N, 1))], 1
    ).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.05, 0.1, -0.05], jnp.float32)))
    s, t = 1.3, np.array([0.2, 0.1, -0.3], np.float32)
    Q = s * P @ R.T + t
    out = rng.random(N) < 0.3
    Q[out] += rng.normal(0, 1.0, (out.sum(), 3))
    res = sim3_solver.sim3_ransac(
        jnp.asarray(P), jnp.asarray(Q), jnp.ones(N, bool),
        jax.random.PRNGKey(0), jnp.full(N, 9.21, jnp.float32), CAM, CAM,
    )
    assert int(res.n_inliers) >= 0.9 * (~out).sum()
    assert abs(float(res.s) - s) < 0.02
    assert np.allclose(np.asarray(res.R), R, atol=5e-3)


# --------------------------------------------------------------------- bow
def test_bow_retrieval_finds_revisit():
    rng = np.random.default_rng(2)
    words = jnp.asarray(rand_desc(rng, 64))
    # 6 "places", each with distinct descriptors; KF 5 revisits place 0
    base = [rand_desc(rng, 100) for _ in range(5)]
    frames = base + [base[0] ^ 0]  # revisit
    db = bow.empty_database(8, 64)
    bows = []
    for i, d in enumerate(frames):
        _, b = bow.quantize(jnp.asarray(d), jnp.ones(100, bool), words)
        bows.append(b)
        if i < 5:
            db = bow.add_keyframe(db, i, b)
    exclude = jnp.zeros(8, bool).at[4].set(True)  # "covisible" previous KF
    scores, idx = bow.detect_candidates(db, bows[5], exclude, top_k=3)
    assert int(idx[0]) == 0


def test_vocab_training_quantizes_consistently():
    rng = np.random.default_rng(3)
    descs = jnp.asarray(rand_desc(rng, 256))
    words = bow.train_vocab(descs, 16, iters=4)
    wid, b = bow.quantize(descs, jnp.ones(256, bool), words)
    assert wid.shape == (256,)
    assert abs(float(b.sum()) - 1.0) < 1e-5


# --------------------------------------------------------------- pose graph
def _circle_poses(K, radius=3.0):
    """World->cam poses on a circle looking inward."""
    Ts = []
    for k in range(K):
        a = 2 * np.pi * k / K
        c = np.array([radius * np.cos(a), radius * np.sin(a), 0.0])
        # camera z looks toward origin
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 0, 1.0], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        Rwc = np.stack([x, y, z], 1)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rwc.T
        T[:3, 3] = -Rwc.T @ c
        Ts.append(T)
    return np.stack(Ts)


def test_pose_graph_removes_drift():
    K = 12
    T_gt = _circle_poses(K)
    # accumulate drift: rotate each successive pose a bit + scale creep
    T_drift = T_gt.copy()
    err = np.eye(4, dtype=np.float32)
    for k in range(1, K):
        step = np.asarray(lie.se3_exp(jnp.asarray(
            [0.01, -0.005, 0.01, 0.002, 0.003, -0.002], jnp.float32)))
        err = err @ step
        T_drift[k] = T_gt[k] @ err

    R0 = jnp.asarray(T_drift[:, :3, :3])
    t0 = jnp.asarray(T_drift[:, :3, 3])
    s0 = jnp.ones(K, jnp.float32)
    E = 32
    edge_i = np.zeros(E, np.int32); edge_j = np.zeros(E, np.int32)
    edge_w = np.zeros(E, np.float32)
    eR = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
    et = np.zeros((E, 3), np.float32); es = np.ones(E, np.float32)
    # sequential edges measured from GROUND TRUTH relative poses (odometry
    # is right locally) + the loop edge K-1 -> 0
    pairs = [(k, k + 1) for k in range(K - 1)] + [(K - 1, 0)]
    for n, (i, j) in enumerate(pairs):
        rel = T_gt[j] @ np.linalg.inv(T_gt[i])
        edge_i[n] = i; edge_j[n] = j; edge_w[n] = 1.0
        eR[n] = rel[:3, :3]; et[n] = rel[:3, 3]
    fixed = np.zeros(K, bool); fixed[0] = True
    g = pose_graph.PoseGraph(
        R=R0, t=t0, s=s0,
        kf_valid=jnp.ones(K, bool), fixed=jnp.asarray(fixed),
        edge_i=jnp.asarray(edge_i), edge_j=jnp.asarray(edge_j),
        edge_R=jnp.asarray(eR), edge_t=jnp.asarray(et),
        edge_s=jnp.asarray(es), edge_w=jnp.asarray(edge_w),
    )
    g2 = pose_graph.optimize_pose_graph(g, iters=25)
    t_err0 = np.abs(np.asarray(t0) - T_gt[:, :3, 3]).max()
    t_err = np.abs(np.asarray(g2.t) / np.asarray(g2.s)[:, None]
                   - T_gt[:, :3, 3]).max()
    assert t_err < 0.3 * t_err0
    assert t_err < 0.05


def test_pose_graph_4dof_chart_runs():
    K = 6
    T_gt = _circle_poses(K)
    g = pose_graph.PoseGraph(
        R=jnp.asarray(T_gt[:, :3, :3]), t=jnp.asarray(T_gt[:, :3, 3]),
        s=jnp.ones(K, jnp.float32), kf_valid=jnp.ones(K, bool),
        fixed=jnp.zeros(K, bool).at[0].set(True),
        edge_i=jnp.asarray(np.arange(K - 1, dtype=np.int32)),
        edge_j=jnp.asarray(np.arange(1, K, dtype=np.int32)),
        edge_R=jnp.asarray(np.stack(
            [(T_gt[j] @ np.linalg.inv(T_gt[j - 1]))[:3, :3] for j in range(1, K)])),
        edge_t=jnp.asarray(np.stack(
            [(T_gt[j] @ np.linalg.inv(T_gt[j - 1]))[:3, 3] for j in range(1, K)])),
        edge_s=jnp.ones(K - 1, jnp.float32),
        edge_w=jnp.ones(K - 1, jnp.float32),
    )
    g2 = pose_graph.optimize_pose_graph(g, iters=3, chart="4dof")
    # consistent input -> output unchanged (residuals already zero)
    assert np.allclose(np.asarray(g2.t), T_gt[:, :3, 3], atol=1e-3)


# --------------------------------------------------------------------- reloc
def test_pnp_ransac_relocalizes():
    rng = np.random.default_rng(4)
    N = 200
    pts = np.concatenate(
        [rng.uniform(-2, 2, (N, 2)), rng.uniform(3, 9, (N, 1))], 1
    ).astype(np.float32)
    T = np.asarray(lie.se3_exp(jnp.asarray(
        [0.1, -0.2, 0.15, 0.05, -0.03, 0.08], jnp.float32)))
    pc = pts @ T[:3, :3].T + T[:3, 3]
    uv = np.array(camera.pinhole_project_linear(CAM, jnp.asarray(pc)))
    out = rng.random(N) < 0.3
    uv[out] += rng.uniform(20, 80, (out.sum(), 2))
    res = relocalization.pnp_ransac(
        CAM, jnp.asarray(pts), jnp.asarray(uv), jnp.ones(N, bool),
        jax.random.PRNGKey(1),
    )
    assert bool(res.ok)
    assert np.abs(np.asarray(res.Tcw) - T).max() < 1e-2


# ----------------------------------------------------------- covis + atlas
def _tiny_map(rng, K_kf=4, n_feat=32):
    m = ms.empty_map(K=8, M=128, N=n_feat, P=8)
    lm = jnp.asarray(np.concatenate(
        [rng.uniform(-2, 2, (64, 2)), rng.uniform(3, 8, (64, 1))], 1
    ).astype(np.float32))
    m = m._replace(
        lm_pos=m.lm_pos.at[:64].set(lm),
        lm_valid=m.lm_valid.at[:64].set(True),
        lm_first_kf=m.lm_first_kf.at[:64].set(0),
    )
    for k in range(K_kf):
        feat_lm = np.full(n_feat, -1, np.int32)
        feat_lm[:24] = np.arange(24) + (k % 2) * 8  # overlap between KFs
        m = ms.insert_keyframe(
            m, jnp.asarray(k), jnp.eye(4, dtype=jnp.float32), float(k),
            jnp.zeros((n_feat, 2)), jnp.zeros(n_feat, jnp.int32),
            jnp.zeros(n_feat), jnp.asarray(rand_desc(rng, n_feat)),
            jnp.ones(n_feat, bool), jnp.asarray(feat_lm),
        )
    return m


def test_covisibility_counts():
    rng = np.random.default_rng(5)
    m = _tiny_map(rng)
    C = np.asarray(covisibility.shared_counts(m))
    assert C[0, 2] >= 15  # same landmark subset
    assert C[0, 1] >= 15  # 16 landmarks overlap
    mask = np.asarray(covisibility.covisibility_mask(m, jnp.asarray(0)))
    assert mask[0] and mask[2]


def test_atlas_create_and_merge():
    rng = np.random.default_rng(6)
    at = atlas_mod.Atlas(K=8, M=128, N=32, P=8)
    at.current = _tiny_map(rng, K_kf=2)
    at.create_new_map()
    assert at.n_maps() == 2 and at.active == 1
    at.current = _tiny_map(rng, K_kf=2)
    m = at.merge(0, jnp.eye(3), jnp.zeros(3), jnp.asarray(1.0))
    assert at.n_maps() == 1
    assert int(np.asarray(m.kf_valid).sum()) == 4
    assert int(np.asarray(m.lm_valid).sum()) == 128  # 64 + 64 welded


def _proj_verify_fixture(rng, aliased: bool):
    """Candidate KF with landmark-bearing features + a query KF. If
    `aliased`, the query shows a DIFFERENT stretch of scene whose
    descriptors happen to retrieve the candidate (repetitive texture):
    geometry is inconsistent, so projections through the Sim3 must not
    yield descriptor-consistent matches."""
    N, M = 96, 128
    m = ms.empty_map(K=8, M=256, N=N, P=8)
    pts = np.concatenate(
        [rng.uniform(-1.5, 1.5, (M, 2)), rng.uniform(4, 8, (M, 1))], 1
    ).astype(np.float32)
    descs = rand_desc(rng, M)
    m = m._replace(
        lm_pos=m.lm_pos.at[:M].set(jnp.asarray(pts)),
        lm_valid=m.lm_valid.at[:M].set(True),
    )
    T_c = np.eye(4, dtype=np.float32)
    vis = np.arange(N)
    pc = pts[vis]
    uv_c = np.asarray(camera.pinhole_project_linear(CAM, jnp.asarray(pc)))
    m = ms.insert_keyframe(
        m, jnp.asarray(0), jnp.asarray(T_c), 0.0,
        jnp.asarray(uv_c), jnp.zeros(N, jnp.int32), jnp.zeros(N),
        jnp.asarray(descs[vis]), jnp.ones(N, bool),
        jnp.asarray(vis.astype(np.int32)),
    )
    # query: same viewpoint; true loop sees the same points + descriptors,
    # aliased query sees a different (shifted) scene with similar-looking
    # but geometrically unrelated features
    if aliased:
        q_pts = pts[vis] + rng.uniform(-1.0, 1.0, (N, 3)).astype(np.float32)
        q_desc = descs[(vis + 37) % M]     # repeated-texture descriptors
    else:
        q_pts = pts[vis]
        q_desc = descs[vis]
    uv_q = np.asarray(camera.pinhole_project_linear(CAM, jnp.asarray(q_pts)))
    m = ms.insert_keyframe(
        m, jnp.asarray(1), jnp.asarray(T_c), 1.0,
        jnp.asarray(uv_q), jnp.zeros(N, jnp.int32), jnp.zeros(N),
        jnp.asarray(q_desc), jnp.ones(N, bool),
        jnp.full(N, -1, jnp.int32),
    )
    return m


def test_projection_verify_accepts_true_loop():
    """A genuine loop (identical viewpoint + descriptors, identity Sim3)
    must clear the reference's >=40 projected-match bar even when the
    landmark descriptors are still unset (falls back to the candidate KF's
    feature descriptors; reference ORBmatcher::SearchByProjection with Scw,
    src/ORBmatcher.cc:480; bar src/LoopClosing.cc:933)."""
    rng = np.random.default_rng(11)
    m = _proj_verify_fixture(rng, aliased=False)
    n = int(loop_closing._projection_verify(
        CAM, m.kf_T[0], m.kf_T[1],
        m.kf_feat_lm[0], m.kf_feat_valid[0], m.kf_desc_pm1[0],
        m.lm_pos, m.lm_desc_pm1,
        m.kf_xy[1], m.kf_desc_pm1[1], m.kf_feat_valid[1],
        jnp.eye(3), jnp.zeros(3), jnp.asarray(1.0),
        jnp.asarray(752.0), jnp.asarray(480.0),
    ))
    assert n >= 40, n


def test_projection_verify_rejects_aliased_candidate():
    """A perceptually-aliased candidate (similar descriptors retrieved by
    BoW, inconsistent geometry — the corridor false-weld scenario measured
    in round 4) must stay under the 40-match bar."""
    rng = np.random.default_rng(12)
    m = _proj_verify_fixture(rng, aliased=True)
    n = int(loop_closing._projection_verify(
        CAM, m.kf_T[0], m.kf_T[1],
        m.kf_feat_lm[0], m.kf_feat_valid[0], m.kf_desc_pm1[0],
        m.lm_pos, m.lm_desc_pm1,
        m.kf_xy[1], m.kf_desc_pm1[1], m.kf_feat_valid[1],
        jnp.eye(3), jnp.zeros(3), jnp.asarray(1.0),
        jnp.asarray(752.0), jnp.asarray(480.0),
    ))
    assert n < 40, n


def test_loop_closer_end_to_end_detects_and_corrects():
    """Closed circle of KFs; the final KF revisits the first's viewpoint but
    (as after real drift) observes its own duplicate landmarks, triangulated
    in the drifted frame, with the same descriptors. The loop closer must
    retrieve KF0, verify the Sim3, and shrink trajectory error."""
    rng = np.random.default_rng(7)
    K, N, M = 10, 96, 300
    # angles 0..2pi inclusive: KF K-1 coincides with KF0's viewpoint
    T_full = _circle_poses(K - 1, radius=4.0)
    T_gt = np.concatenate([T_full, T_full[:1]], axis=0)
    pts = np.concatenate(
        [rng.uniform(-1.5, 1.5, (M, 2)), rng.uniform(-1.5, 1.5, (M, 1))], 1
    ).astype(np.float32)
    descs = rand_desc(rng, M)

    m = ms.empty_map(K=16, M=512, N=N, P=12)
    m = m._replace(
        lm_pos=m.lm_pos.at[:M].set(jnp.asarray(pts)),
        lm_valid=m.lm_valid.at[:M].set(True),
    )
    # drifted poses accumulating along the loop
    T_est = T_gt.copy()
    err = np.eye(4, dtype=np.float32)
    for k in range(1, K):
        err = err @ np.asarray(lie.se3_exp(jnp.asarray(
            [0.02, 0.0, 0.01, 0.004, 0.0, -0.004], jnp.float32)))
        T_est[k] = T_gt[k] @ err

    def obs_window(k):
        # each KF sees a contiguous index window -> local covisibility only
        c = (k * M) // (K - 1)
        idx = (np.arange(N) + c - N // 2) % M
        return idx

    for k in range(K - 1):
        vis = obs_window(k)
        pc = pts[vis] @ T_gt[k][:3, :3].T + T_gt[k][:3, 3]
        uv = np.asarray(camera.pinhole_project_linear(CAM, jnp.asarray(pc)))
        m = ms.insert_keyframe(
            m, jnp.asarray(k), jnp.asarray(T_est[k]), float(k),
            jnp.asarray(uv), jnp.zeros(N, jnp.int32), jnp.zeros(N),
            jnp.asarray(descs[vis]),
            jnp.ones(N, bool), jnp.asarray(vis.astype(np.int32)),
        )

    # query KF: same viewpoint as KF0 but with DUPLICATE landmarks
    # triangulated through the drifted pose
    vis = obs_window(0)
    pc_true = pts[vis] @ T_gt[K - 1][:3, :3].T + T_gt[K - 1][:3, 3]
    Twc_est = np.linalg.inv(T_est[K - 1])
    dup_world = pc_true @ Twc_est[:3, :3].T + Twc_est[:3, 3]
    dup_ids = M + np.arange(N)
    m = m._replace(
        lm_pos=m.lm_pos.at[jnp.asarray(dup_ids)].set(jnp.asarray(
            dup_world.astype(np.float32))),
        lm_valid=m.lm_valid.at[jnp.asarray(dup_ids)].set(True),
        lm_first_kf=m.lm_first_kf.at[jnp.asarray(dup_ids)].set(K - 1),
    )
    uv = np.asarray(camera.pinhole_project_linear(
        CAM, jnp.asarray(pc_true)))
    m = ms.insert_keyframe(
        m, jnp.asarray(K - 1), jnp.asarray(T_est[K - 1]), float(K - 1),
        jnp.asarray(uv), jnp.zeros(N, jnp.int32), jnp.zeros(N),
        jnp.asarray(descs[vis]),
        jnp.ones(N, bool), jnp.asarray(dup_ids.astype(np.int32)),
    )

    words = bow.train_vocab(jnp.asarray(descs), 32, iters=3)
    lc = loop_closing.LoopCloser(CAM, words, Kmax=16, min_inliers=15,
                                 consistency_required=1)
    # 10-KF fixture circle: the default 15-KF temporal-separation gate
    # (tuned for app keyframe rates) would mask the whole map
    lc.min_candidate_gap = 5
    for k in range(K - 1):
        lc.add_keyframe(m, k)
    m2, info = lc.detect_and_correct(m, K - 1, run_gba=False)
    assert info.detected

    # with the reference's default temporal-consistency gate, a SINGLE
    # retrieval hit must NOT fire a correction; the chain has to build up
    # over consecutive queries (reference NewDetectCommonRegions,
    # src/LoopClosing.cc:267)
    lc3 = loop_closing.LoopCloser(CAM, words, Kmax=16, min_inliers=15,
                                  consistency_required=3)
    lc3.min_candidate_gap = 5
    for k in range(K - 1):
        lc3.add_keyframe(m, k)
    _, i1 = lc3.detect_and_correct(m, K - 1, run_gba=False)
    assert not i1.detected
    _, i2 = lc3.detect_and_correct(m, K - 1, run_gba=False)
    assert not i2.detected
    _, i3 = lc3.detect_and_correct(m, K - 1, run_gba=False)
    assert i3.detected
    assert info.matched == 0
    err_before = np.abs(T_est[:K, :3, 3] - T_gt[:, :3, 3]).max()
    err_after = np.abs(
        np.asarray(m2.kf_T)[:K, :3, 3] - T_gt[:, :3, 3]).max()
    assert err_after < err_before


def test_mono_slam_inline_loop_closing():
    """MonoSlam with loop_words set runs place recognition at every KF
    insertion (the reference's LoopClosing thread, inline here). On a
    drift-free synthetic out-and-back run the revisited keyframes stay
    covisible with the originals, so NO loop may fire (false-positive
    gate); correction-on-drift is covered by the synthetic-map test
    above."""
    from eorb_slam_tpu.event import tensorize
    from eorb_slam_tpu.slam.system import MonoSlam
    from eorb_slam_tpu.ops import frontend

    W, H = 240, 180
    FX = FY = 200.0
    CX, CY = W / 2, H / 2
    cam = camera.make_pinhole(FX, FY, CX, CY)
    rng = np.random.default_rng(5)
    # frontal point wall; camera goes out along +x and returns (out-and-back
    # revisit: translation-only, monocular-friendly parallax throughout)
    pts = np.stack([rng.uniform(-4, 4, 400), rng.uniform(-3, 3, 400),
                    rng.uniform(6, 12, 400)], 1)
    amp = rng.uniform(0.3, 1.0, 400)

    def pose(t):
        # t in [0,1]: x ramps 0 -> 1.5 -> 0 (triangle), slight y bow
        x = 1.5 * (2 * t if t < 0.5 else 2 * (1 - t))
        Tcw = np.eye(4, dtype=np.float32)
        C = np.asarray([x, 0.15 * np.sin(2 * np.pi * t), 0.0])
        Tcw[:3, 3] = -C
        return Tcw

    def render(Tcw):
        pc = (Tcw[:3, :3] @ pts.T).T + Tcw[:3, 3]
        uv = np.stack([FX * pc[:, 0] / pc[:, 2] + CX,
                       FY * pc[:, 1] / pc[:, 2] + CY], 1).astype(np.float32)
        ok = (pc[:, 2] > 0.5) & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
            & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        img = tensorize.splat_gauss(
            jnp.asarray(uv), jnp.asarray(ok), jnp.asarray(amp, jnp.float32),
            H, W, sigma=1.2)
        return np.asarray(tensorize.normalize_to_image(img)) * 255.0

    # vocabulary from the scene's own descriptors (stand-in for ORBvoc)
    f0 = frontend.extract(jnp.asarray(render(pose(0.0)), jnp.float32),
                          max_kp=256)
    words = bow.train_vocab(f0.desc_pm1, 32, iters=3)

    slam = MonoSlam(cam, img_w=W, img_h=H, N=256, K=48, M=4096,
                    min_init_matches=30, min_track_inliers=8,
                    max_frames_between_kf=3, loop_words=words,
                    loop_min_gap=10)
    n_frames = 48
    for i in range(n_frames + 6):   # a bit past full circle
        t = i / n_frames
        slam.process_image(jnp.asarray(render(pose(t)), jnp.float32),
                           float(i) * 0.1)
    assert slam.stats["kf"] >= 12, slam.stats
    assert slam.stats["lost"] == 0, slam.stats
    # detection ran on every KF past the gap; the consistent map must not
    # trigger a (false) loop, and the BoW database tracked all keyframes
    assert slam.loops_closed == 0, slam.stats
    assert int(np.asarray(slam.loop_closer.db.valid).sum()) == slam.stats["kf"]


def test_cross_map_merge_after_loss():
    """Track scene -> force loss (blank frames) -> new map on the same
    scene -> the stored map's BoW index is hit and the Sim3 weld merges the
    two maps (reference LoopClosing::MergeLocal via Atlas)."""
    from eorb_slam_tpu.event import tensorize
    from eorb_slam_tpu.slam.system import MonoSlam
    from eorb_slam_tpu.ops import frontend

    W, H = 240, 180
    FX = FY = 200.0
    cam = camera.make_pinhole(FX, FY, W / 2, H / 2)
    rng = np.random.default_rng(8)
    pts = np.stack([rng.uniform(-4, 4, 300), rng.uniform(-3, 3, 300),
                    rng.uniform(6, 12, 300)], 1)
    amp = rng.uniform(0.3, 1.0, 300)

    def render(x, y=0.0):
        Tcw = np.eye(4)
        Tcw[:3, 3] = [-x, -y, 0.0]
        pc = (Tcw[:3, :3] @ pts.T).T + Tcw[:3, 3]
        uv = np.stack([FX * pc[:, 0] / pc[:, 2] + W / 2,
                       FY * pc[:, 1] / pc[:, 2] + H / 2], 1).astype(np.float32)
        ok = (pc[:, 2] > 0.5) & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
            & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        img = tensorize.splat_gauss(
            jnp.asarray(uv), jnp.asarray(ok), jnp.asarray(amp, jnp.float32),
            H, W, sigma=1.2)
        return np.asarray(tensorize.normalize_to_image(img)) * 255.0

    f0 = frontend.extract(jnp.asarray(render(0.0), jnp.float32), max_kp=256)
    words = bow.train_vocab(f0.desc_pm1, 32, iters=3)
    slam = MonoSlam(cam, img_w=W, img_h=H, N=256, K=32, M=4096,
                    min_init_matches=30, min_track_inliers=8,
                    max_frames_between_kf=2, loop_words=words,
                    loop_min_gap=99)   # loop detection off; merge only
    slam.lost_grace = 2

    # phase 1: map the scene
    for i, x in enumerate(np.arange(0.0, 1.4, 0.04)):
        slam.process_image(jnp.asarray(render(float(x)), jnp.float32),
                           0.1 * i)
    kf_a = slam.stats["kf"]
    # the atlas only STORES maps with >= 10 KFs (reference resets tiny maps)
    assert kf_a >= 10, slam.stats

    # phase 2: blackout until the atlas stores the map
    blank = np.zeros((H, W), np.float32)
    for k in range(6):
        slam.process_image(jnp.asarray(blank), 10.0 + 0.1 * k)
    assert slam.atlas.n_maps() == 2
    assert len(slam._stored_dbs) == 1

    # phase 3: re-map the same scene from a different spot; the new map
    # initializes and the first KFs should trigger the cross-map merge
    for i, x in enumerate(np.arange(0.3, 1.2, 0.06)):
        slam.process_image(jnp.asarray(render(float(x), 0.05), jnp.float32),
                           20.0 + 0.1 * i)

    assert slam.map_merges >= 1, slam.stats
    assert slam.atlas.n_maps() == 1          # stored map consumed
    assert slam.stats["kf"] > kf_a           # old KFs welded in
    # welded map stays usable: keep tracking without loss
    lost_before = slam.stats["lost"]
    for i, x in enumerate(np.arange(1.2, 1.5, 0.06)):
        slam.process_image(jnp.asarray(render(float(x), 0.05), jnp.float32),
                           30.0 + 0.1 * i)
    assert slam.stats["lost"] == lost_before
