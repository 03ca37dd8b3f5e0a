from eorb_slam_tpu.evals import ate  # noqa: F401
