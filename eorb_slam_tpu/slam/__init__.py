from eorb_slam_tpu.slam import map_state, tracking, local_mapping  # noqa: F401
