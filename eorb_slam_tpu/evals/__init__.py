from eorb_slam_tpu.evals import ate  # noqa: F401
from eorb_slam_tpu.evals import rpe  # noqa: F401
from eorb_slam_tpu.evals import kitti_odom  # noqa: F401
