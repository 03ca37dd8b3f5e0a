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


def test_event_sharded_splat_matches_single():
    """SURVEY §5.7 event-axis data parallelism: the event batch sharded
    over 8 devices with a psum-reduced accumulator must reproduce the
    single-device splat bit-near-exactly."""
    from eorb_slam_tpu.event import tensorize
    from eorb_slam_tpu.parallel import dist_splat

    rng = np.random.default_rng(3)
    N, H, W = 8192, 90, 120
    mesh = mesh_utils.make_mesh()
    xy = jnp.asarray(rng.uniform(-5, 125, (N, 2)).astype(np.float32))
    valid = jnp.asarray(rng.random(N) < 0.9)
    pol = jnp.asarray(rng.choice([-1.0, 1.0], N).astype(np.float32))
    for use_pol in (False, True):
        a = dist_splat.splat_gauss_sharded(
            mesh, xy, valid, pol, H, W, sigma=1.0, use_polarity=use_pol)
        b = tensorize.splat_gauss(
            xy, valid, pol, H, W, sigma=1.0, use_polarity=use_pol)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_event_sharded_window_scores():
    """Fused sharded histogram + gen-rate: rate must equal the host
    formula, accumulator must match the unsharded splat."""
    from eorb_slam_tpu.event import tensorize
    from eorb_slam_tpu.parallel import dist_splat

    rng = np.random.default_rng(4)
    N, H, W = 4096, 64, 96
    mesh = mesh_utils.make_mesh()
    ev = np.zeros((N, 4), np.float32)
    ev[:, 0] = np.sort(rng.uniform(0, 0.02, N))
    ev[:, 1] = rng.uniform(0, W, N)
    ev[:, 2] = rng.uniform(0, H, N)
    ev[:, 3] = rng.choice([-1.0, 1.0], N)
    valid = jnp.asarray(rng.random(N) < 0.8)
    acc, rate = dist_splat._window_scores_sharded(
        mesh, jnp.asarray(ev), valid, jnp.asarray(0.02, jnp.float32),
        H=H, W=W, sigma=1.0)
    ref = tensorize.splat_gauss(jnp.asarray(ev[:, 1:3]), valid,
                                jnp.asarray(ev[:, 3]), H, W, sigma=1.0)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(ref), atol=1e-4)
    n = float(np.asarray(valid).sum())
    assert abs(float(rate) - n / 0.02 / (H * W)) / (n / 0.02 / (H * W)) < 1e-5
