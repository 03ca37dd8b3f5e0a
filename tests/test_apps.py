"""App-layer tests: YAML-driven runner over a synthetic on-disk dataset in
the EV-ETHZ layout (the reference's fmt_ev_ethz protocol: settings file ->
loader -> sensor dispatch -> TUM trajectory with timing header -> eval)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from eorb_slam_tpu.io import datasets
from eorb_slam_tpu.io.config import SensorConfig, load_settings
from eorb_slam_tpu.apps import run_slam

from tests.test_event_slam import EventWorld, H, W, FX, FY, CX, CY
from tests.test_ev_image_slam import render_frame


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    """Write a 1.6 s synthetic sequence in EV-ETHZ txt layout."""
    from PIL import Image
    from eorb_slam_tpu.geometry import lie
    import jax.numpy as jnp

    root = tmp_path_factory.mktemp("evethz")
    seq = root / "shapes_synth"
    img_dir = seq / "images"
    img_dir.mkdir(parents=True)

    world = EventWorld(n_points=220, seed=11)
    t_end = 1.6
    ev = world.events(0.0, t_end, 60000)
    np.savetxt(seq / "events.txt", ev, fmt="%.9f %d %d %d")

    fps = 15.0
    lines = []
    for i, t in enumerate(np.arange(0.0, t_end, 1.0 / fps)):
        img = render_frame(world, float(t)).astype(np.uint8)
        name = f"images/frame_{i:05d}.png"
        Image.fromarray(img, "L").save(seq / name)
        lines.append(f"{t:.9f} {name}")
    (seq / "images.txt").write_text("\n".join(lines) + "\n")

    # imu.txt: accel-first EV-ETHZ ordering (ts ax ay az gx gy gz)
    ts_imu = np.arange(0.0, t_end, 1.0 / 200.0)
    acc = np.tile([0.0, 0.0, 9.81], (len(ts_imu), 1))
    gyr = np.zeros((len(ts_imu), 3))
    np.savetxt(seq / "imu.txt",
               np.concatenate([ts_imu[:, None], acc, gyr], axis=1),
               fmt="%.9f")

    gt = []
    for t in np.arange(0.0, t_end, 0.01):
        Twc = np.linalg.inv(world.pose(float(t)))
        q = np.asarray(lie.quat_from_mat(jnp.asarray(Twc[:3, :3],
                                                     jnp.float32)))
        gt.append([t, *Twc[:3, 3], q[1], q[2], q[3], q[0]])
    np.savetxt(seq / "groundtruth.txt", np.asarray(gt), fmt="%.9f")

    yaml_text = f"""
DS:
  Sensor:
    config: mono_im
  name: synth
  format: ev_ethz
  paths:
    root: {root}
  sequence:
    names: [shapes_synth]
    target: 0
Camera:
  type: pinhole
  fx: {FX}
  fy: {FY}
  cx: {CX}
  cy: {CY}
  width: {W}
  height: {H}
  fps: {fps}
Features:
  nFeatures: 384
Event:
  data:
    l1ChunkSize: 1500
    l1NumLoop: 3
    minEvGenRate: 0.05
"""
    cfg_path = root / "settings.yaml"
    cfg_path.write_text(yaml_text)
    return root, cfg_path


def test_loader_roundtrip(synth_dataset):
    root, _ = synth_dataset
    seq = datasets.load_sequence("ev_ethz", str(root), "shapes_synth")
    assert seq.n_frames >= 20
    assert seq.events is not None and len(seq.events) > 10000
    assert seq.events.events.dtype == np.float64  # ts precision (ADVICE #3)
    assert seq.imu is not None
    # EV-ETHZ accel-first normalized to (gyro, acc)
    assert np.allclose(seq.imu.acc[0], [0, 0, 9.81], atol=1e-6)
    assert np.allclose(seq.imu.gyro[0], 0, atol=1e-9)
    assert seq.gt_ts is not None and len(seq.gt_ts) > 100


def test_run_monocular_and_eval(synth_dataset, tmp_path):
    root, cfg_path = synth_dataset
    st = load_settings(str(cfg_path))
    assert st.sensor is SensorConfig.MONOCULAR
    assert st.cam.width == W

    seq = datasets.load_sequence("ev_ethz", str(root), "shapes_synth")
    slam, out = run_slam.run_sequence(
        st, seq, out_dir=str(tmp_path), verbose=False
    )
    assert out["tracked_poses"] >= 10, out
    assert "trajectory_file" in out
    # timing header written (reference fmt main writes the timer stats)
    head = open(out["trajectory_file"]).readline()
    assert head.startswith("# tracking:")

    ev = run_slam.evaluate(seq, out["trajectory_file"], monocular=True)
    assert ev["ate_n"] >= 10
    assert ev["ate_rmse"] < 0.15, ev


def test_run_event_only(synth_dataset, tmp_path):
    root, cfg_path = synth_dataset
    st = load_settings(str(cfg_path))
    st.sensor = SensorConfig.EVENT_ONLY
    st.event.continuous = False

    seq = datasets.load_sequence("ev_ethz", str(root), "shapes_synth")
    slam, out = run_slam.run_sequence(
        st, seq, out_dir=str(tmp_path), verbose=False
    )
    assert out["iterations"] >= 5
    assert out["tracked_poses"] >= 4, out
    assert os.path.exists(out["trajectory_file"])


def test_run_ev_mono(synth_dataset, tmp_path):
    root, cfg_path = synth_dataset
    st = load_settings(str(cfg_path))
    st.sensor = SensorConfig.EVENT_MONO

    seq = datasets.load_sequence("ev_ethz", str(root), "shapes_synth")
    slam, out = run_slam.run_sequence(
        st, seq, out_dir=str(tmp_path), verbose=False
    )
    assert out["tracked_poses"] >= 8, out
    assert out["stats"]["im"]["kf"] >= 2


@pytest.fixture(scope="module")
def tum_rgbd_dataset(tmp_path_factory):
    """Synthetic TUM-RGBD layout: rgb.txt/depth.txt indexes + 16-bit depth
    pngs (factor 5000) rendered from the same blob world."""
    from PIL import Image
    import jax.numpy as jnp
    from eorb_slam_tpu.event import tensorize
    from tests.test_event_slam import FX, FY, CX, CY

    root = tmp_path_factory.mktemp("tum")
    seq = root / "fr_synth"
    (seq / "rgb").mkdir(parents=True)
    (seq / "depth").mkdir()

    world = EventWorld(n_points=220, seed=13)
    fps, t_end = 12.0, 1.6
    rgb_lines, dep_lines, gt = [], [], []
    from eorb_slam_tpu.geometry import lie

    for i, t in enumerate(np.arange(0.0, t_end, 1.0 / fps)):
        t = float(t)
        img = render_frame(world, t).astype(np.uint8)
        Image.fromarray(img, "L").save(seq / f"rgb/{i:05d}.png")
        rgb_lines.append(f"{t:.6f} rgb/{i:05d}.png")
        # depth: weighted splat of point z over the same blobs
        Tcw = world.pose(t)
        pc = (Tcw[:3, :3] @ world.pts.T).T + Tcw[:3, 3]
        uv = np.stack([FX * pc[:, 0] / pc[:, 2] + CX,
                       FY * pc[:, 1] / pc[:, 2] + CY], 1).astype(np.float32)
        ok = (pc[:, 2] > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
            & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        wsum = np.asarray(tensorize.splat_gauss(
            jnp.asarray(uv), jnp.asarray(ok), jnp.ones(len(uv)), H, W,
            sigma=1.2))
        zsum = np.asarray(tensorize.splat_gauss(
            jnp.asarray(uv), jnp.asarray(ok),
            jnp.asarray(pc[:, 2], jnp.float32), H, W, sigma=1.2))
        depth = np.where(wsum > 0.05, zsum / np.maximum(wsum, 1e-6), 0.0)
        d16 = np.clip(depth * 5000.0, 0, 65535).astype(np.uint16)
        Image.fromarray(d16, "I;16").save(seq / f"depth/{i:05d}.png")
        # depth index ts slightly offset (association must bridge it)
        dep_lines.append(f"{t + 0.004:.6f} depth/{i:05d}.png")
        Twc = np.linalg.inv(Tcw)
        q = np.asarray(lie.quat_from_mat(jnp.asarray(Twc[:3, :3],
                                                     jnp.float32)))
        gt.append([t, *Twc[:3, 3], q[1], q[2], q[3], q[0]])

    (seq / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (seq / "depth.txt").write_text("\n".join(dep_lines) + "\n")
    np.savetxt(seq / "groundtruth.txt", np.asarray(gt), fmt="%.9f")
    return root


def test_tum_rgbd_loader_and_run(tum_rgbd_dataset, tmp_path):
    from eorb_slam_tpu.io.config import CameraConfig, Settings
    from tests.test_event_slam import FX, FY, CX, CY

    seq = datasets.load_sequence("tum_rgbd", str(tum_rgbd_dataset),
                                 "fr_synth")
    assert seq.n_frames >= 15
    assert seq.depth_paths is not None
    d = seq.depth(0)
    assert d.shape == (H, W)
    assert 0.5 < np.median(d[d > 0]) < 20.0  # metric depths at blobs

    st = Settings()
    st.sensor = SensorConfig.RGBD
    st.cam = CameraConfig(fx=FX, fy=FY, cx=CX, cy=CY, width=W, height=H,
                          fps=12.0)
    st.features.n_features = 384
    slam, out = run_slam.run_sequence(st, seq, out_dir=str(tmp_path),
                                      verbose=False)
    assert out["tracked_poses"] >= 10, out
    # RGB-D is metric: evaluate with scale FIXED. The splat-blended depth
    # fixture mixes z across overlapping blobs (~5-10% depth bias at blob
    # edges), so the bound is looser than the clean-depth unit tests
    # (tests/test_stereo_rgbd.py)
    ev = run_slam.evaluate(seq, out["trajectory_file"], monocular=False)
    assert ev["ate_n"] >= 8
    assert ev["ate_rmse"] < 0.3, ev
    assert ev["ate_scale"] == 1.0


def test_kitti_loader(tmp_path):
    from PIL import Image

    root = tmp_path / "kitti"
    sd = root / "sequences" / "00"
    (sd / "image_0").mkdir(parents=True)
    (sd / "image_1").mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (40, 120), np.uint8)
        Image.fromarray(img, "L").save(sd / f"image_0/{i:06d}.png")
        Image.fromarray(img, "L").save(sd / f"image_1/{i:06d}.png")
    np.savetxt(sd / "times.txt", np.arange(4) * 0.1, fmt="%.6f")
    (root / "poses").mkdir()
    poses = np.tile(np.eye(3, 4).reshape(-1), (4, 1))
    poses[:, 3] = np.arange(4) * 0.5  # forward translation
    np.savetxt(root / "poses" / "00.txt", poses, fmt="%.6f")

    seq = datasets.load_sequence("kitti", str(root), "00")
    assert seq.n_frames == 4
    assert seq.right_paths is not None
    assert seq.gt_pose is not None and abs(seq.gt_pose[3, 0] - 1.5) < 1e-6
    assert seq.image(0).shape == (40, 120)
