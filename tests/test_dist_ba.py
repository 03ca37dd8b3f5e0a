"""Distributed BA over an 8-device CPU mesh must match single-device BA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eorb_slam_tpu.optim import schur_ba
from eorb_slam_tpu.parallel import dist_ba, mesh_utils
from tests.test_optim import CAM, make_scene, _make_problem

from eorb_slam_tpu.geometry import lie


@pytest.fixture(scope="module")
def problem():
    lm, Ts, obs = make_scene(K=6, M=64, noise_px=0.5)
    rng = np.random.default_rng(11)
    Ts0 = Ts.copy()
    for k in range(2, 6):
        Ts0[k] = np.asarray(
            lie.se3_exp(jnp.asarray(rng.normal(0, 0.02, 6), jnp.float32))
        ) @ Ts0[k]
    lm0 = lm + rng.normal(0, 0.05, lm.shape).astype(np.float32)
    fixed = np.array([True, True, False, False, False, False])
    return _make_problem(lm, Ts, obs, fixed, lm0=lm0, Ts0=Ts0), Ts


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_dist_matches_single(problem):
    p, Ts = problem
    mesh = mesh_utils.make_mesh()
    p_sharded = dist_ba.shard_problem(p, mesh)
    res_d = dist_ba.dist_bundle_adjust(p_sharded, mesh, iters=10)
    res_s = schur_ba.bundle_adjust(p, iters=10)
    # identical accept/reject path -> near-identical results
    np.testing.assert_allclose(
        float(res_d.cost), float(res_s.cost), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res_d.kf_T), np.asarray(res_s.kf_T), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res_d.lm_pos), np.asarray(res_s.lm_pos), atol=1e-3
    )


def test_dist_converges(problem):
    p, Ts = problem
    mesh = mesh_utils.make_mesh()
    res = dist_ba.dist_bundle_adjust(dist_ba.shard_problem(p, mesh), mesh, iters=15)
    assert float(res.cost) < float(res.cost0) / 20.0
    for k in range(2, 6):
        err = lie.se3_log(jnp.linalg.inv(res.kf_T[k]) @ jnp.asarray(Ts[k]))
        assert float(jnp.linalg.norm(err)) < 0.03
