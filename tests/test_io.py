"""I/O layer tests: config parsing, dataset loaders, trajectory round-trip,
native fast parser vs numpy. Fixture files are tiny synthetic slices
mirroring the real formats (EuRoC csv, EV-ETHZ txt)."""

import os

import numpy as np
import pytest

from eorb_slam_tpu.io import config, datasets, native, trajectory


def _write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


# ------------------------------------------------------------------ config

YAML = """
DS.name: "ev_ethz"
DS.format: "ev_ethz"
DS.Paths.root: "/data/ev_ethz"
DS.Seq.names: ["shapes_6dof", "poster_6dof"]
DS.Seq.target: 0
DS.tsFactor: 1.0
DS.Sensor.config: "mono_ev_imu"
Camera.type: "PinHole"
Camera.fx: 199.09
Camera.fy: 198.99
Camera.cx: 132.19
Camera.cy: 110.71
Camera.k1: -0.368
Camera.k2: 0.150
Camera.p1: -0.000133
Camera.p2: 0.000167
Camera.width: 240
Camera.height: 180
Camera.fps: 24.0
IMU.Frequency: 1000.0
IMU.NoiseGyro: 0.00018
IMU.NoiseAcc: 0.0015
ORBextractor.nFeatures: 800
Event.data.l1ChunkSize: 3000
Event.data.maxPixelDisp: 4.5
Event.fts.maxNumPts: 250
"""


def test_load_settings(tmp_path):
    p = tmp_path / "settings.yaml"
    p.write_text(YAML)
    s = config.load_settings(str(p))
    assert s.sensor is config.SensorConfig.EVENT_IMU
    assert s.sensor.is_event() and s.sensor.is_inertial()
    assert not s.sensor.is_image()
    assert s.sensor.is_monocular()
    assert s.cam.model == "pinhole"
    assert s.cam.fx == pytest.approx(199.09)
    assert s.cam.dist[0] == pytest.approx(-0.368)
    assert s.features.n_features == 800
    assert s.event.l1_chunk_size == 3000
    assert s.event.max_pixel_disp == pytest.approx(4.5)
    assert s.event.n_points == 250
    assert s.dataset.sequences == ("shapes_6dof", "poster_6dof")
    assert s.dataset.ts_factor == 1.0
    # untouched keys fall back with a missing-marker (missParams analog)
    assert any(k.startswith("Viewer") for k in s.missing)


def test_sensor_predicates():
    for s in config.SensorConfig:
        if s is config.SensorConfig.IDLE:
            continue
        assert isinstance(s.is_event(), bool)
    assert config.SensorConfig.STEREO.is_stereo()
    assert config.SensorConfig.RGBD.is_rgbd()
    assert not config.SensorConfig.EVENT_ONLY.is_image()
    assert config.sensor_from_string("Mono_EV_IM_IMU") is config.SensorConfig.EVENT_IMU_MONO


def test_kb8_config(tmp_path):
    p = tmp_path / "kb8.yaml"
    p.write_text(
        'DS.Sensor.config: "monocular"\nCamera.type: "KannalaBrandt8"\n'
        "Camera.fx: 190.0\nCamera.fy: 190.0\nCamera.cx: 160.0\nCamera.cy: 120.0\n"
        "Camera.k1: 0.003\nCamera.k2: 0.0007\nCamera.k3: -0.003\nCamera.k4: 0.0005\n"
    )
    s = config.load_settings(str(p))
    assert s.cam.model == "kb8"
    arr = s.cam.params_array()
    assert arr[4] == pytest.approx(0.003)
    assert arr.shape == (9,)


# ------------------------------------------------------------------ native parser

def test_native_parser_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    ev = np.stack(
        [
            np.sort(rng.uniform(0, 2, 500)),
            rng.integers(0, 240, 500),
            rng.integers(0, 180, 500),
            rng.integers(0, 2, 500),
        ],
        axis=1,
    )
    p = tmp_path / "events.txt"
    with open(p, "w") as f:
        for r in ev:
            f.write(f"{r[0]:.9f} {int(r[1])} {int(r[2])} {int(r[3])}\n")
    got = datasets.load_events_txt(str(p))
    assert got.shape == (500, 4)
    np.testing.assert_allclose(got, ev.astype(np.float32), rtol=0, atol=2e-6)
    if native.get_lib() is not None:  # native path must agree bit-tightly
        nat = native.parse_events(str(p))
        np.testing.assert_allclose(nat, got, atol=0)


def test_native_csv_header_skip(tmp_path):
    p = tmp_path / "data.csv"
    p.write_text(
        "#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n"
        "1403636579758555392,-0.1,0.2,0.03,9.1,0.2,-0.3\n"
        "1403636579763555584,-0.11,0.21,0.031,9.2,0.21,-0.31\n"
    )
    arr = datasets.load_csv(str(p))
    assert arr.shape == (2, 7)
    assert arr[0, 0] == pytest.approx(1403636579758555392.0, rel=1e-15)
    assert arr[1, 1] == pytest.approx(-0.11)


# ------------------------------------------------------------------ loaders

def _make_ev_ethz(root):
    seq = os.path.join(root, "shapes_6dof")
    _write(
        os.path.join(seq, "events.txt"),
        "0.01 10 20 1\n0.02 11 21 0\n0.03 12 22 1\n0.04 13 23 1\n",
    )
    _write(
        os.path.join(seq, "imu.txt"),
        "0.00 0.1 0.2 9.8 0.01 0.02 0.03\n0.02 0.1 0.2 9.8 0.01 0.02 0.03\n"
        "0.04 0.1 0.2 9.8 0.01 0.02 0.03\n",
    )
    _write(
        os.path.join(seq, "groundtruth.txt"),
        "0.0 0 0 0 0 0 0 1\n0.05 0.1 0 0 0 0 0 1\n",
    )
    _write(os.path.join(seq, "images.txt"), "")
    return seq


def test_ev_ethz_loader(tmp_path):
    _make_ev_ethz(str(tmp_path))
    seq = datasets.load_ev_ethz(str(tmp_path), "shapes_6dof")
    assert len(seq.events) == 4
    # accel-first imu.txt normalized to (gyro, acc)
    np.testing.assert_allclose(seq.imu.gyro[0], [0.01, 0.02, 0.03], atol=1e-6)
    np.testing.assert_allclose(seq.imu.acc[0], [0.1, 0.2, 9.8], atol=1e-6)
    assert seq.gt_pose.shape == (2, 7)

    # chunk service + overlap rewind (EvTrackManager consume/inject protocol)
    c1 = seq.events.next_chunk_count(3)
    assert c1.shape == (3, 4)
    seq.events.rewind(1)
    c2 = seq.events.next_chunk_count(10)
    assert c2.shape == (2, 4)
    # events carry float64 timestamps now (precision, ADVICE #3)
    assert abs(c2[0, 0] - 0.03) < 1e-9
    assert seq.events.exhausted

    # time-bounded chunks
    seq2 = datasets.load_ev_ethz(str(tmp_path), "shapes_6dof")
    c = seq2.events.next_chunk_until(0.025)
    assert c.shape == (2, 4)

    # imu chunk padding
    ts, gyr, acc, valid = seq.imu.chunk(0.0, 0.05, max_n=8)
    assert valid.sum() == 2  # (t0, t1] excludes the t=0 sample
    assert gyr.shape == (8, 3)


def test_event_rectification(tmp_path):
    _make_ev_ethz(str(tmp_path))
    rmap = np.zeros((180, 240, 2), np.float32)
    rmap[..., 0] = np.arange(240)[None, :] + 0.5  # shift x by +0.5
    rmap[..., 1] = np.arange(180)[:, None]
    seq = datasets.load_ev_ethz(str(tmp_path), "shapes_6dof", rectify_map=rmap)
    assert seq.events.events[0, 1] == np.float32(10.5)


def test_euroc_loader(tmp_path):
    seq_root = os.path.join(str(tmp_path), "MH_01", "mav0")
    _write(
        os.path.join(seq_root, "cam0", "data.csv"),
        "#timestamp [ns],filename\n1000000000,0.png\n1050000000,1.png\n",
    )
    _write(
        os.path.join(seq_root, "imu0", "data.csv"),
        "#ts,wx,wy,wz,ax,ay,az\n1000000000,0.01,0.02,0.03,9.8,0.0,0.1\n"
        "1005000000,0.01,0.02,0.03,9.8,0.0,0.1\n",
    )
    _write(
        os.path.join(seq_root, "state_groundtruth_estimate0", "data.csv"),
        "#ts,px,py,pz,qw,qx,qy,qz,...\n"
        "1000000000,1.0,2.0,3.0,1.0,0.0,0.0,0.0,0,0,0\n",
    )
    seq = datasets.load_euroc(str(tmp_path), "MH_01")
    assert seq.n_frames == 2
    assert seq.image_ts[0] == pytest.approx(1.0)
    assert seq.image_paths[0].endswith("cam0/data/0.png")
    np.testing.assert_allclose(seq.imu.gyro[0], [0.01, 0.02, 0.03], atol=1e-6)
    # GT quaternion reordered wxyz -> xyzw-last TUM convention
    np.testing.assert_allclose(seq.gt_pose[0], [1, 2, 3, 0, 0, 0, 1], atol=1e-9)


# ------------------------------------------------------------------ trajectory

def test_tum_roundtrip(tmp_path):
    from eorb_slam_tpu.geometry import lie
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    F = 12
    Twc = np.tile(np.eye(4), (F, 1, 1))
    for i in range(F):
        Twc[i, :3, :3] = np.asarray(
            lie.so3_exp(jnp.asarray(rng.normal(0, 0.3, 3), jnp.float32))
        )
        Twc[i, :3, 3] = rng.normal(0, 2, 3)
    ts = np.arange(F) * 0.05

    timer = trajectory.SmartTimer("tracking")
    for _ in range(3):
        timer.tic()
        timer.toc()

    p = tmp_path / "traj.txt"
    trajectory.save_tum(str(p), ts, Twc, timers=(timer,))
    text = p.read_text()
    assert text.startswith("# tracking:")

    rows = trajectory.load_tum(str(p))
    assert rows.shape == (F, 8)
    ts2, T2 = trajectory.tum_to_mats(rows)
    np.testing.assert_allclose(ts2, ts, atol=1e-9)
    np.testing.assert_allclose(T2, Twc, atol=1e-5)


def test_frame_log_recover():
    log = trajectory.FrameLog()
    kf_Twc = np.tile(np.eye(4), (2, 1, 1))
    kf_Twc[1, :3, 3] = [1.0, 0, 0]
    Tcr = np.eye(4)
    Tcr[:3, 3] = [0, 0.5, 0]  # frame is 0.5 behind its ref KF (in KF frame)
    log.push(0.0, 0, np.eye(4))
    log.push(0.1, 1, Tcr)
    log.push(0.2, 1, np.eye(4), lost=True)
    ts, T = log.recover(kf_Twc)
    assert len(ts) == 2
    np.testing.assert_allclose(T[1][:3, 3], [1.0, -0.5, 0.0], atol=1e-12)


class TestSmartWatchDog:
    def test_triggers_and_resets(self):
        from eorb_slam_tpu.io.trajectory import SmartWatchDog

        wd = SmartWatchDog("dispatch", limit=3)
        assert not wd.step() and not wd.step()
        assert wd.step()          # third hit escalates
        assert wd.triggered == 1
        assert wd.count == 0      # auto-reset
        wd.reset()
        assert not wd.step()


class TestNativeEventQueue:
    """native/evqueue.cpp — the C++ runtime queue behind the window builder
    (reference EventQueue::consumeBegin / EvTrackManager::injectEventsBegin,
    include/Event/EventData.h:130-139)."""

    def _events(self, n=1000, seed=0):
        rng = np.random.default_rng(seed)
        ts = np.cumsum(np.abs(rng.normal(0, 1e-4, (n, 1))), 0)
        return np.concatenate(
            [ts, rng.uniform(0, 240, (n, 2)), rng.integers(0, 2, (n, 1))], 1
        )

    def test_fifo_and_front_injection(self):
        q = native.make_queue()
        if q is None:
            pytest.skip("native library unavailable")
        ev = self._events()
        q.feed(ev[:600])
        q.feed(ev[600:])
        assert len(q) == 1000
        np.testing.assert_array_equal(q.consume(300), ev[:300])
        q.inject_front(ev[100:300])  # overlap re-injection
        assert len(q) == 900
        np.testing.assert_array_equal(q.consume(250), ev[100:350])
        q.close()

    def test_pad_rebase_matches_numpy(self):
        if native.get_lib() is None:
            pytest.skip("native library unavailable")
        ev = self._events()
        out, valid, drop = native.pad_rebase(ev, 800, ev[200, 0])
        assert drop == 200 and valid.sum() == 800
        np.testing.assert_allclose(
            out[:800, 0], (ev[200:, 0] - ev[200, 0]).astype(np.float32)
        )
        assert not valid[800:].any()

    def test_background_streamer(self, tmp_path):
        q = native.make_queue()
        if q is None:
            pytest.skip("native library unavailable")
        ev = self._events(500)
        p = tmp_path / "events.txt"
        with open(p, "w") as f:
            f.write("# ts x y p\n")
            for r in ev:
                f.write(f"{r[0]:.9f} {r[1]:.4f} {r[2]:.4f} {int(r[3])}\n")
        assert q.stream_file(str(p))
        q.stream_join()
        assert len(q) == 500
        got = q.consume(500)
        np.testing.assert_allclose(got[:, 0], ev[:, 0], atol=1e-9)
        q.close()

    def test_builder_uses_queue_backend(self):
        from eorb_slam_tpu.event import builder as B

        b = B.EventWindowBuilder(B.BuilderConfig())
        ev = self._events(300)
        b.feed(ev)
        assert b.pending_events() == 300
        np.testing.assert_array_equal(b._consume(100), ev[:100])
        b._inject_front(ev[:50])
        assert b.pending_events() == 250


# ------------------------------------------------------------------- mvsec


def test_mvsec_hdf5_loader(tmp_path):
    """Native MVSEC HDF5 pair: events with (x,y,t,p) column order (the
    release format), images, IMU, and 4x4 GT poses — the loader must detect
    the time column, normalize events to (t,x,y,p), split the imu block
    into (gyro, acc), and convert GT to TUM (tx..qw) rows."""
    h5py = pytest.importorskip("h5py")

    rng = np.random.default_rng(0)
    Ne, F, G = 2000, 6, 10
    t_ev = np.sort(rng.uniform(100.0, 101.0, Ne))
    x = rng.integers(0, 346, Ne).astype(np.float64)
    y = rng.integers(0, 260, Ne).astype(np.float64)
    p = rng.choice([-1.0, 1.0], Ne)
    events_xy_tp = np.stack([x, y, t_ev, p], axis=1)  # MVSEC column order

    imgs = rng.integers(0, 255, (F, 16, 20)).astype(np.uint8)
    img_ts = np.linspace(100.0, 101.0, F)
    imu = rng.normal(0, 1, (50, 6))
    imu_ts = np.linspace(100.0, 101.0, 50)

    with h5py.File(tmp_path / "seqA_data.hdf5", "w") as f:
        g = f.create_group("davis/left")
        g["events"] = events_xy_tp
        g["image_raw"] = imgs
        g["image_raw_ts"] = img_ts
        g["imu"] = imu
        g["imu_ts"] = imu_ts
    with h5py.File(tmp_path / "seqA_gt.hdf5", "w") as f:
        g = f.create_group("davis/left")
        Ts = np.tile(np.eye(4), (G, 1, 1))
        Ts[:, 0, 3] = np.arange(G) * 0.1
        g["pose"] = Ts
        g["pose_ts"] = np.linspace(100.0, 101.0, G)

    seq = datasets.load_mvsec(str(tmp_path), "seqA")
    # events normalized to internal (t, x, y, p), time monotone
    ev = seq.events.events
    assert (np.diff(ev[:, 0]) >= 0).all()
    np.testing.assert_allclose(ev[:, 0], t_ev)
    np.testing.assert_allclose(ev[:, 1], x)
    np.testing.assert_allclose(ev[:, 2], y)
    assert set(np.unique(ev[:, 3])) <= {-1.0, 1.0}
    # images served from memory as float [0,1]
    assert seq.n_frames == F
    im0 = seq.image(0)
    assert im0.shape == (16, 20) and 0.0 <= im0.min() and im0.max() <= 1.0
    # imu split: acc = cols 0:3, gyro = cols 3:6
    np.testing.assert_allclose(seq.imu.acc, imu[:, 0:3].astype(np.float32))
    np.testing.assert_allclose(seq.imu.gyro, imu[:, 3:6].astype(np.float32))
    # GT converted to (tx ty tz qx qy qz qw), identity rotation
    assert seq.gt_pose.shape == (G, 7)
    np.testing.assert_allclose(seq.gt_pose[:, 0], np.arange(G) * 0.1)
    np.testing.assert_allclose(np.abs(seq.gt_pose[:, 6]), 1.0, atol=1e-6)


def test_mvsec_txt_fallback(tmp_path):
    """An events.txt export routes through the EV-ETHZ loader unchanged."""
    seq_dir = tmp_path / "seqB"
    os.makedirs(seq_dir)
    with open(seq_dir / "events.txt", "w") as f:
        for i in range(64):
            f.write(f"{100.0 + i * 1e-3:.6f} {i % 16} {i % 12} {i % 2}\n")
    with open(seq_dir / "images.txt", "w") as f:
        pass
    seq = datasets.load_mvsec(str(tmp_path), "seqB")
    assert len(seq.events) == 64
