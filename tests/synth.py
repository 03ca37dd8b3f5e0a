"""Synthetic SLAM world: 3D landmark cloud + smooth camera trajectory +
per-frame feature rendering (stable per-landmark descriptors, pixel noise,
clutter). The standard backend-testing fixture the reference lacks
(SURVEY.md §4: the only mock is a trajectory generator)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from eorb_slam_tpu.geometry import camera, lie
from eorb_slam_tpu.slam.system import FrameInput

CAM = camera.make_pinhole(458.0, 457.0, 376.0, 240.0)
W, H = 752, 480


def random_descriptors(n, seed):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, (n, 256)).astype(np.int8)
    return bits * 2 - 1


GRAVITY_W = np.asarray([0.0, 0.0, -9.81])


def imu_between(world: "SynthWorld", t0: float, t1: float, hz: float = 200.0,
                bg=np.zeros(3), ba=np.zeros(3), noise=0.0, rng=None):
    """Ideal IMU samples consistent with SynthWorld's camera trajectory
    (body frame == camera frame, Tbc = I). Gyro via finite-difference
    rotation log; accel = R^T (a_w - g_w) with the analytic translational
    acceleration of SynthWorld.pose."""
    from eorb_slam_tpu.slam.vi_system import ImuChunk

    n = max(int(round((t1 - t0) * hz)), 0)
    ts = t0 + np.arange(n) / hz
    h = 1e-4
    gyro = np.zeros((n, 3))
    acc = np.zeros((n, 3))
    for i, t in enumerate(ts):
        Ra = np.asarray(world.pose(t - h))[:3, :3].T   # Rwc(t-h)
        Rb = np.asarray(world.pose(t + h))[:3, :3].T
        w = np.asarray(lie.so3_log(jnp.asarray(Ra.T @ Rb, jnp.float32))) / (2 * h)
        R = np.asarray(world.pose(t))[:3, :3].T
        a_w = np.asarray([
            -0.25 * 1.69 * np.sin(1.3 * t),
            -0.35 * 4.0 * np.sin(2.0 * t),
            0.2 * 2.89 * np.cos(1.7 * t),
        ])
        gyro[i] = w + bg
        acc[i] = R.T @ (a_w - GRAVITY_W) + ba
    if noise > 0 and rng is not None:
        gyro += rng.normal(0, noise * 0.01, gyro.shape)
        acc += rng.normal(0, noise, acc.shape)
    return ImuChunk(
        gyro=gyro.astype(np.float32), acc=acc.astype(np.float32),
        dts=np.full(n, 1.0 / hz, np.float32),
    )


def imu_from_pose(pose_fn, t0: float, t1: float, hz: float = 200.0,
                  bg=np.zeros(3), ba=np.zeros(3), noise=0.0, rng=None):
    """Ideal IMU samples for ANY Tcw(t) trajectory (body == camera frame):
    gyro from the finite-difference rotation log, accel from the second
    finite difference of the camera center (no analytic derivative needed)."""
    from eorb_slam_tpu.slam.vi_system import ImuChunk

    n = max(int(round((t1 - t0) * hz)), 0)
    ts = t0 + np.arange(n) / hz
    h = 1e-3
    gyro = np.zeros((n, 3))
    acc = np.zeros((n, 3))
    for i, t in enumerate(ts):
        Ta = np.asarray(pose_fn(t - h), np.float64)
        T0 = np.asarray(pose_fn(t), np.float64)
        Tb = np.asarray(pose_fn(t + h), np.float64)
        Ra, R0, Rb = Ta[:3, :3].T, T0[:3, :3].T, Tb[:3, :3].T   # Rwc
        Ca = -Ra @ Ta[:3, 3]
        C0 = -R0 @ T0[:3, 3]
        Cb = -Rb @ Tb[:3, 3]
        w = np.asarray(lie.so3_log(jnp.asarray(Ra.T @ Rb, jnp.float32))) / (2 * h)
        a_w = (Cb - 2 * C0 + Ca) / (h * h)
        gyro[i] = w + bg
        acc[i] = R0.T @ (a_w - GRAVITY_W) + ba
    if noise > 0 and rng is not None:
        gyro += rng.normal(0, noise * 0.01, gyro.shape)
        acc += rng.normal(0, noise, acc.shape)
    return ImuChunk(
        gyro=gyro.astype(np.float32), acc=acc.astype(np.float32),
        dts=np.full(n, 1.0 / hz, np.float32),
    ), ts


def imu_slice(imu: "ImuChunk", imu_ts: np.ndarray, t0: float, t1: float):
    """Slice a globally-generated IMU stream to the (t0, t1] window with
    boundary-bridging dts (how the dataset loaders serve chunks) — avoids
    the per-window round() time deficit of generating IMU per frame."""
    from eorb_slam_tpu.slam.vi_system import ImuChunk

    sel = (imu_ts > t0) & (imu_ts <= t1)
    ts = imu_ts[sel]
    dts = np.diff(ts, prepend=t0).astype(np.float32)
    return ImuChunk(
        gyro=imu.gyro[sel], acc=imu.acc[sel],
        dts=np.clip(dts, 1e-5, 0.1),
    )


class SynthWorld:
    def __init__(self, n_landmarks=2000, seed=0, noise_px=0.4):
        rng = np.random.default_rng(seed)
        # landmarks in a box in front of the trajectory
        self.lm = np.concatenate(
            [
                rng.uniform(-6, 6, (n_landmarks, 1)),
                rng.uniform(-4, 4, (n_landmarks, 1)),
                rng.uniform(4, 14, (n_landmarks, 1)),
            ],
            axis=1,
        ).astype(np.float32)
        self.desc = random_descriptors(n_landmarks, seed + 1)
        self.noise_px = noise_px
        self.rng = rng

    def pose(self, t: float) -> np.ndarray:
        """Smooth forward+lateral trajectory with gentle yaw. Returns Tcw.

        Has real acceleration excitation (~1.5 m/s^2) — without it the
        visual-inertial scale is unobservable (s*dp and v*t collinear)."""
        pos = np.asarray([
            1.2 * t + 0.25 * np.sin(1.3 * t),
            0.35 * np.sin(2.0 * t),
            0.3 * t + 0.2 * (1.0 - np.cos(1.7 * t)),
        ])
        yaw = 0.12 * np.sin(0.5 * t)
        pitch = 0.05 * np.sin(0.3 * t)
        R = np.asarray(
            lie.so3_exp(jnp.asarray([pitch, yaw, 0.0], jnp.float32))
        )
        Tcw = np.eye(4, dtype=np.float32)
        Tcw[:3, :3] = R.T
        Tcw[:3, 3] = -R.T @ pos
        return Tcw

    def frame(self, t: float, n_slots=512, n_clutter=40, seed=None,
              with_depth=False, depth_noise=0.01,
              depth_fraction=0.7) -> FrameInput:
        rng = self.rng if seed is None else np.random.default_rng(seed)
        Tcw = self.pose(t)
        pc = (Tcw[:3, :3] @ self.lm.T).T + Tcw[:3, 3]
        uv = np.stack(
            [
                458.0 * pc[:, 0] / pc[:, 2] + 376.0,
                457.0 * pc[:, 1] / pc[:, 2] + 240.0,
            ],
            axis=1,
        )
        vis = (pc[:, 2] > 0.3) & (uv[:, 0] >= 5) & (uv[:, 0] < W - 5) \
            & (uv[:, 1] >= 5) & (uv[:, 1] < H - 5)
        idx = np.flatnonzero(vis)
        rng.shuffle(idx)
        idx = idx[: n_slots - n_clutter]

        xy = np.zeros((n_slots, 2), np.float32)
        desc = np.zeros((n_slots, 256), np.int8)
        valid = np.zeros(n_slots, bool)
        k = len(idx)
        xy[:k] = uv[idx] + rng.normal(0, self.noise_px, (k, 2))
        # descriptor bit noise: flip ~8 bits
        d = self.desc[idx].copy()
        flips = rng.integers(0, 256, (k, 8))
        for r in range(k):
            d[r, flips[r]] *= -1
        desc[:k] = d
        valid[:k] = True
        # clutter features (random positions, random descriptors)
        xy[k : k + n_clutter] = rng.uniform((0, 0), (W, H), (n_clutter, 2))
        desc[k : k + n_clutter] = random_descriptors(n_clutter, int(t * 1000) % 99991)
        valid[k : k + n_clutter] = True

        depth = None
        if with_depth:
            # stereo/RGB-D fixture: metric depth on a random subset of the
            # true-landmark features (multiplicative noise like disparity)
            dep = np.full(n_slots, -1.0, np.float32)
            has = rng.random(k) < depth_fraction
            dep[:k][has] = pc[idx, 2][has] * (
                1.0 + rng.normal(0, depth_noise, int(has.sum()))
            )
            depth = jnp.asarray(dep)

        return FrameInput(
            ts=t,
            xy_ud=jnp.asarray(xy),
            octave=jnp.zeros(n_slots, jnp.int32),
            angle=jnp.zeros(n_slots, jnp.float32),
            desc_pm1=jnp.asarray(desc),
            valid=jnp.asarray(valid),
            depth=depth,
        ), Tcw
