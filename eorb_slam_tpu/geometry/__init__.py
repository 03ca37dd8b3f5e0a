from eorb_slam_tpu.geometry import lie, camera  # noqa: F401
from eorb_slam_tpu.geometry import sim3_solver  # noqa: F401
