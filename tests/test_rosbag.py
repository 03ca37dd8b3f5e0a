"""ROS bag v2.0 reader round-trip (RosBagStore equivalent, reference
include/ROS/RosBagStore.h — optional ROS wrapper, here a clean-room
pure-Python reader of the documented container format)."""

import numpy as np

from eorb_slam_tpu.io import rosbag


def _make_bag(path):
    rng = np.random.default_rng(0)
    msgs = []
    for i in range(4):
        ts = 1.0 + i * 0.1
        img = rng.integers(0, 255, (12, 16), np.uint8)
        msgs.append(("/dvs/image_raw", "sensor_msgs/Image", ts,
                     rosbag.encode_image(ts, img)))
    for i in range(20):
        ts = 1.0 + i * 0.02
        msgs.append(("/dvs/imu", "sensor_msgs/Imu", ts,
                     rosbag.encode_imu(ts, [0.1, -0.2, 0.3],
                                       [0.0, 0.0, 9.81])))
    ev = np.stack([
        1.0 + np.sort(rng.uniform(0, 0.4, 50)),
        rng.integers(0, 16, 50), rng.integers(0, 12, 50),
        rng.integers(0, 2, 50),
    ], axis=1)
    msgs.append(("/dvs/events", "dvs_msgs/EventArray", 1.0,
                 rosbag.encode_event_array(ev, 12, 16)))
    msgs.sort(key=lambda m: m[2])
    rosbag.write_bag(str(path), msgs)
    return ev


def test_read_bag_messages(tmp_path):
    bag = tmp_path / "t.bag"
    _make_bag(bag)
    msgs = list(rosbag.read_bag(str(bag)))
    topics = {t for t, _, _, _ in msgs}
    assert topics == {"/dvs/image_raw", "/dvs/imu", "/dvs/events"}
    # filter works
    only_imu = list(rosbag.read_bag(str(bag), {"/dvs/imu"}))
    assert len(only_imu) == 20
    ts, g, a = rosbag.decode_imu(only_imu[0][3])
    assert np.allclose(g, [0.1, -0.2, 0.3]) and np.isclose(a[2], 9.81)


def test_load_rosbag_sequence(tmp_path):
    bag = tmp_path / "seq.bag"
    ev_true = _make_bag(bag)
    seq = rosbag.load_rosbag(
        str(bag), cache_dir=str(tmp_path / "imgs"))
    assert seq.n_frames == 4
    img = seq.image(0)
    assert img.shape == (12, 16)
    assert seq.imu is not None and len(seq.imu.ts) == 20
    assert seq.events is not None and len(seq.events) == 50
    got = seq.events.events
    assert np.allclose(np.sort(got[:, 0]), np.sort(ev_true[:, 0]), atol=2e-9)
    assert np.allclose(
        sorted(got[:, 1].tolist()), sorted(ev_true[:, 1].tolist()))
