from eorb_slam_tpu.optim import robust, reprojection, pose_only, schur_ba  # noqa: F401
from eorb_slam_tpu.optim import pose_graph  # noqa: F401
from eorb_slam_tpu.optim import marginalize  # noqa: F401
