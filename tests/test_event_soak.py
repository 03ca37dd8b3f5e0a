"""Long-run event-image soak (VERDICT r4 item 9): a 60 s orbit with
repeated revisits through the EVENT_MONO joint pipeline — both trackers
live, loop corrections firing, the joint coupling engaged throughout, and
no post-weld gauge tear (windowed APE cliff check, like the mono soak).

The mono 5,000-frame soak covers culling/fuse/loop/checkpoint for the image
pipeline; this one exercises the twin-map machinery under the same revisit
pressure: image loop corrections must propagate into the event map
(_on_image_loop) without tearing the fused trajectory apart."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from eorb_slam_tpu.evals import ate
from eorb_slam_tpu.retrieval import bow
from eorb_slam_tpu.slam import ev_image_system
from tests.test_event_slam import CAM, EventWorld, H, W, FX, FY, CX, CY, make_cfg
from tests.test_ev_image_slam import render_frame

pytestmark = pytest.mark.slow

ORBIT_R = 1.5
WALL_R = 7.0
PERIOD = 20.0        # seconds per lap; 60 s = 3 laps = 2 revisits


class OrbitEventWorld(EventWorld):
    """Camera orbits inside a landmark cylinder looking outward — every lap
    re-observes the same wall (the revisit machine of test_soak, emitting
    an event stream instead of clean features)."""

    def __init__(self, n_points=900, seed=0):
        super().__init__(n_points=n_points, seed=seed)
        rng = np.random.default_rng(seed + 5)
        th = rng.uniform(0, 2 * np.pi, n_points)
        z = rng.uniform(-2.5, 2.5, n_points)
        r = WALL_R + rng.uniform(-0.4, 0.4, n_points)
        self.pts = np.stack(
            [r * np.cos(th), r * np.sin(th), z], axis=1
        ).astype(np.float32)

    def pose(self, t: float) -> np.ndarray:
        th = 2 * np.pi * t / PERIOD
        C = np.asarray([
            ORBIT_R * np.cos(th), ORBIT_R * np.sin(th),
            0.2 * np.sin(2 * np.pi * t / 7.3),
        ])
        out = np.asarray([np.cos(th), np.sin(th), 0.0])
        up = np.asarray([0.0, 0.0, -1.0])
        x = np.cross(up, out); x /= np.linalg.norm(x)
        y = np.cross(out, x)
        Rwc = np.stack([x, y, out], axis=1)
        Tcw = np.eye(4, dtype=np.float32)
        Tcw[:3, :3] = Rwc.T
        Tcw[:3, 3] = -Rwc.T @ C
        return Tcw


def test_event_image_soak_60s_orbit():
    t_end, fps = 60.0, 10.0
    world = OrbitEventWorld(n_points=900, seed=2)
    f0 = None
    # vocabulary from the scene's own frame descriptors (ORBvoc stand-in)
    from eorb_slam_tpu.ops import frontend
    f0 = frontend.extract(
        jnp.asarray(render_frame(world, 0.0), jnp.float32), max_kp=256)
    words = bow.train_vocab(f0.desc_pm1, 32, iters=3)

    slam = ev_image_system.EvImageSlam(
        CAM, make_cfg(), img_w=W, img_h=H,
        max_kp=384, ev_max_kp=256, synch_window_s=0.25,
        K=32, M=4096, min_init_matches=30, min_track_inliers=8,
        loop_words=words, loop_min_gap=10,
        max_frames_between_kf=5,
    )

    frame_ts = np.arange(0.0, t_end, 1.0 / fps)
    rng = np.random.default_rng(9)
    last = 0.0
    for t in frame_ts:
        t = float(t)
        ev = world.events(last, t, 9000)
        img = render_frame(world, t)
        slam.track_ev_mono(ev, img, t)
        last = t

    s = slam.stats
    frames = s["im"]["frames"]
    assert s["im"]["kf"] >= 2, s
    assert s["ev"]["kf"] >= 2, s
    # NOTE on loop counts: the orbit world tracks nearly drift-free, and
    # the correction-necessity gate (loop_closing.detect_and_correct)
    # SKIPS loops whose measured Sim3 agrees with the current estimate —
    # so zero accepted corrections here is the designed outcome, not a
    # miss. What must hold: detection kept running (keyframes indexed)
    # and the joint machinery engaged.
    assert s["joint_bas"] >= 1, s
    if s["im"].get("loops", 0):
        assert s["joint_loop_gbas"] >= 1, s

    # trajectory: full-run alignment + windowed cliff check (a torn weld
    # shows up as one slice blowing up while RPE stays small)
    # a hard loss mid-run may reset the active map (atlas switch); the
    # trajectory keeps its frozen segments, and each WINDOW below aligns
    # independently — so coverage + windowed APE are the robust long-run
    # gates (full-run single-alignment ATE is only meaningful map-per-map)
    traj = slam.trajectory_twc()
    assert len(traj) >= 0.8 * frames, (len(traj), frames)
    gt = [(ts, np.linalg.inv(world.pose(ts))) for ts, _ in traj]

    win = 60  # 6 s slices at 10 fps
    worst = 0.0
    for k in range(0, len(traj) - win, win):
        sl = traj[k:k + win]
        gts = gt[k:k + win]
        r_w, n_w, _, _, _ = ate.ate_rmse(sl, gts, with_scale=True)
        if n_w >= 30:
            worst = max(worst, r_w)
    assert worst < 0.8, (worst, s)
