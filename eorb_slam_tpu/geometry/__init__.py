from eorb_slam_tpu.geometry import lie, camera  # noqa: F401
