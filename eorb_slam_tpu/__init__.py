"""eorb_slam_tpu — a TPU-native (JAX/XLA/Pallas) event-based visual-inertial SLAM engine.

Brand-new implementation with the capabilities of the reference EORB_SLAM
(ORB-SLAM3 + DAVIS event front-end, see SURVEY.md), re-designed TPU-first:

- fixed-capacity tensor map state instead of pointer graphs,
- one masked Gauss-Newton/LM optimizer with Schur landmark elimination
  instead of the g2o/Ceres recipe zoo,
- batched/vmapped front-end kernels (FAST, rBRIEF, Hamming matching,
  event splatting, motion-compensated images) instead of OpenCV loops,
- host orchestration + async dispatch instead of 9 mutex-coupled threads.
"""

import jax as _jax

# Geometry/optimizer math needs true f32 matmuls: the platform default lets
# XLA run small 3x3/6x6 contractions at bf16-class precision, which breaks
# rotation orthonormality (observed 6e-3 error in so3_exp on this stack).
# Hot large-matmul kernels opt into bf16 explicitly via dtypes instead.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
