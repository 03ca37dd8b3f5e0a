"""EVENT_MONO synchronized mode: image clock + synch MCIs + twin maps +
joint pose optimization (reference §3.4 call stack, System::TrackEvMono)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from eorb_slam_tpu.evals import ate
from eorb_slam_tpu.event import tensorize
from eorb_slam_tpu.slam import ev_image_system
from tests.test_event_slam import CAM, EventWorld, H, W, FX, FY, CX, CY, make_cfg


def render_frame(world: EventWorld, t: float) -> np.ndarray:
    """Intensity frame from the same scene: Gaussian blobs at the current
    point projections (a DAVIS' APS view of the event world)."""
    Tcw = world.pose(t)
    pc = (Tcw[:3, :3] @ world.pts.T).T + Tcw[:3, 3]
    uv = np.stack(
        [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], axis=1
    ).astype(np.float32)
    ok = (pc[:, 2] > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
        & (uv[:, 1] >= 0) & (uv[:, 1] < H)
    img = tensorize.splat_gauss(
        jnp.asarray(uv), jnp.asarray(ok), jnp.ones(len(uv)), H, W, sigma=1.2
    )
    return np.asarray(tensorize.normalize_to_image(img)) * 255.0


def test_ev_mono_joint_tracking():
    world = EventWorld(n_points=260, seed=5)
    slam = ev_image_system.EvImageSlam(
        CAM, make_cfg(), img_w=W, img_h=H,
        max_kp=384, ev_max_kp=256, synch_window_s=0.2,
        K=24, M=2048, min_init_matches=30, min_track_inliers=8,
    )
    fps, t_end = 12.0, 2.4
    frame_ts = np.arange(0.0, t_end, 1.0 / fps)
    ev = world.events(0.0, t_end, 70000)

    last = 0.0
    for t in frame_ts:
        chunk = ev[(ev[:, 0] > last) & (ev[:, 0] <= t)]
        img = render_frame(world, float(t))
        slam.track_ev_mono(chunk, img, float(t))
        last = t

    s = slam.stats
    assert s["im"]["kf"] >= 2, s          # image map initialized
    assert s["ev"]["kf"] >= 2, s          # event twin map initialized
    assert s["joint_frames"] >= 3, s      # joint pose opts actually ran

    traj = slam.trajectory_twc()
    gt = [(t, np.linalg.inv(world.pose(t))) for t, _ in traj]
    rmse, n, scale, _, _ = ate.ate_rmse(traj, gt, with_scale=True, max_dt=0.05)
    assert n >= 5
    span = traj[-1][0] - traj[0][0]
    assert rmse < max(0.12, 0.2 * 0.52 * span), (rmse, span, s)

    # FuseEventORB: event KF chain welds into the image gauge; fused event
    # poses score against GT under the IMAGE trajectory's single alignment
    fused = slam.fused_trajectory()
    if fused["chains"] >= 1:
        traj_f = fused["fused"]
        gt_f = [(t, np.linalg.inv(world.pose(t))) for t, _ in traj_f]
        rmse_f, n_f, _, _, _ = ate.ate_rmse(
            traj_f, gt_f, with_scale=True, max_dt=0.05
        )
        assert n_f >= len(traj)  # fused includes image + event poses
        assert rmse_f < max(0.15, 0.25 * 0.52 * span), (rmse_f, fused["chains"])


def test_joint_ba_improves_or_matches_ate():
    """The joint event+image local BA (reference EvOptimizer::LocalBundle-
    Adjustment pulling event map points into every BA) must not degrade —
    and typically improves — trajectory accuracy vs two independent BAs."""

    def run(joint_ba: bool):
        world = EventWorld(n_points=260, seed=11)
        slam = ev_image_system.EvImageSlam(
            CAM, make_cfg(), img_w=W, img_h=H,
            max_kp=384, ev_max_kp=256, synch_window_s=0.2,
            K=24, M=2048, min_init_matches=30, min_track_inliers=8,
        )
        slam.joint_ba_enabled = joint_ba
        fps, t_end = 12.0, 2.6
        ev = world.events(0.0, t_end, 80000)
        last = 0.0
        for t in np.arange(0.0, t_end, 1.0 / fps):
            chunk = ev[(ev[:, 0] > last) & (ev[:, 0] <= float(t))]
            img = render_frame(world, float(t))
            slam.track_ev_mono(chunk, img, float(t))
            last = float(t)
        traj = slam.trajectory_twc()
        gt = [(t, np.linalg.inv(world.pose(t))) for t, _ in traj]
        rmse, n, _, _, _ = ate.ate_rmse(traj, gt, with_scale=True,
                                        max_dt=0.05)
        return rmse, n, slam

    rmse_j, n_j, slam_j = run(True)
    rmse_i, n_i, _ = run(False)
    assert slam_j.joint_bas >= 1, slam_j.stats  # the joint backend ran
    assert n_j >= 5 and n_i >= 5
    # joint BA must be at least neutral (10% slack for solver noise)
    assert rmse_j <= rmse_i * 1.10 + 1e-3, (rmse_j, rmse_i)


def test_loop_correction_propagates_to_event_map():
    """An image-map loop correction must carry the synch event map with it
    (reference event-aware LoopClosing/GBA dispatch, src/LoopClosing.cc:
    2535-2549): every event keyframe/landmark follows its nearest-in-time
    image keyframe's correction rigidly, preserving camera-frame geometry
    across the weld (identity-gauge exactness check)."""
    import jax.numpy as jnp

    from eorb_slam_tpu.geometry import lie
    from eorb_slam_tpu.slam import map_state as ms

    rng = np.random.default_rng(0)
    K_im, K_ev, Nf = 8, 6, 16
    im = ms.empty_map(K=K_im, M=64, N=Nf, P=4)
    ev = ms.empty_map(K=K_ev, M=64, N=Nf, P=4)

    def rand_T(i):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray(
            0.1 * rng.standard_normal(3), jnp.float32)))
        T[:3, 3] = rng.standard_normal(3)
        return T

    zeros = (jnp.zeros((Nf, 2)), jnp.zeros(Nf, jnp.int32),
             jnp.zeros(Nf), jnp.zeros((Nf, 256), jnp.int8),
             jnp.ones(Nf, bool), jnp.full(Nf, -1, jnp.int32))
    for i in range(K_im):
        im = ms.insert_keyframe(im, jnp.asarray(i),
                                jnp.asarray(rand_T(i)), 0.1 * i, *zeros)
    for j in range(K_ev):
        ev = ms.insert_keyframe(ev, jnp.asarray(j),
                                jnp.asarray(rand_T(10 + j)),
                                0.1 * j + 0.04, *zeros)
    pts = rng.standard_normal((64, 3)).astype(np.float32)
    ev = ev._replace(
        lm_pos=jnp.asarray(pts), lm_valid=jnp.ones(64, bool),
        lm_first_kf=jnp.asarray(rng.integers(0, K_ev, 64), jnp.int32),
    )

    # apply a per-KF correction to the image map (a rigid world-frame warp
    # G differing per anchor would be the general case; use one global G so
    # the expected event state is exact)
    G = np.eye(4, dtype=np.float32)
    G[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.3, 0.0])))
    G[:3, 3] = [0.5, -0.2, 0.1]
    T_before = im.kf_T
    T_after = jnp.asarray(np.asarray(im.kf_T) @ G)

    ev2 = ev_image_system._propagate_loop_to_event(
        ev, im.kf_ts, im.kf_valid, T_before, T_after,
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.asarray(1.0, jnp.float32),
    )
    # poses follow: Te' = Te @ G; landmarks: x' = G^-1 x
    np.testing.assert_allclose(
        np.asarray(ev2.kf_T), np.asarray(ev.kf_T) @ G, atol=1e-4)
    Ginv = np.linalg.inv(G)
    np.testing.assert_allclose(
        np.asarray(ev2.lm_pos),
        pts @ Ginv[:3, :3].T + Ginv[:3, 3], atol=1e-4)
    # camera-frame coordinates of each landmark are preserved through the
    # weld for every (event KF, landmark) pair
    pc_old = np.einsum("kij,mj->kmi", np.asarray(ev.kf_T)[:, :3, :3], pts) \
        + np.asarray(ev.kf_T)[:, None, :3, 3]
    x_new = np.asarray(ev2.lm_pos)
    pc_new = np.einsum("kij,mj->kmi", np.asarray(ev2.kf_T)[:, :3, :3], x_new) \
        + np.asarray(ev2.kf_T)[:, None, :3, 3]
    np.testing.assert_allclose(pc_new, pc_old, atol=1e-3)
