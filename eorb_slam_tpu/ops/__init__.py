from eorb_slam_tpu.ops import pyramid, fast, orb, matching  # noqa: F401
