from eorb_slam_tpu.slam import map_state, tracking, local_mapping  # noqa: F401
from eorb_slam_tpu.slam import covisibility, atlas, loop_closing, relocalization  # noqa: F401
