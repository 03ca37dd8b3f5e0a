"""Robust losses and chi-square gates shared by all solvers.

The reference uses Huber kernels with fixed chi2 thresholds everywhere
(e.g. sqrt(5.991) for mono reprojection edges, sqrt(7.815) for stereo,
src/Optimizer.cc PoseOptimization / LocalBundleAdjustment). Those constants
carry accuracy — keep them verbatim.
"""

import jax.numpy as jnp

# 95% chi-square quantiles used by ORB-SLAM3-style gating.
CHI2_MONO = 5.991       # 2-DoF reprojection
CHI2_STEREO = 7.815     # 3-DoF stereo reprojection
HUBER_MONO = jnp.sqrt(CHI2_MONO)
HUBER_STEREO = jnp.sqrt(CHI2_STEREO)


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel given squared error chi2.

    w = 1 inside the inlier region, delta/|e| outside — multiplying the
    information matrix by w reproduces g2o's RobustKernelHuber behavior
    to first order."""
    chi2_safe = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / chi2_safe))


def huber_cost(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """rho(chi2): quadratic inside, linear outside."""
    delta = jnp.sqrt(delta2)
    e = jnp.sqrt(jnp.maximum(chi2, 0.0))
    return jnp.where(chi2 <= delta2, chi2, 2.0 * delta * e - delta2)
