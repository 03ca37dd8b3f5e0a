from eorb_slam_tpu.parallel import dist_ba, mesh_utils  # noqa: F401
