"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Current headline: bundle-adjustment ms per LM iteration on a local-BA-sized
window (K=16 keyframes, M=2048 landmarks, P=8 obs/landmark ≈ 16k residuals),
run on the default platform (real TPU under the driver).

vs_baseline: ratio of the same problem solved by the same engine pinned to
the CPU backend (XLA CPU stands in for the reference's single-process C++
stack until a measured g2o number exists — BASELINE.md documents that the
reference publishes no numbers and must be re-measured).
"""

from __future__ import annotations

import json
import time

import numpy as np


def make_problem(K=16, M=2048, P=8, seed=0):
    import jax
    import jax.numpy as jnp

    from eorb_slam_tpu.geometry import camera, lie
    from eorb_slam_tpu.optim import schur_ba

    rng = np.random.default_rng(seed)
    cam = camera.make_pinhole(458.0, 457.0, 376.0, 240.0)
    lm = np.concatenate(
        [rng.uniform(-3, 3, (M, 2)), rng.uniform(4, 10, (M, 1))], axis=1
    ).astype(np.float32)
    Ts = []
    for k in range(K):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(
            lie.so3_exp(jnp.asarray([0.0, 0.01 * k, 0.0], jnp.float32))
        )
        T[:3, 3] = [-0.2 * k, 0.0, 0.0]
        Ts.append(T)
    Ts = np.stack(Ts)
    obs_kf = rng.integers(0, K, (M, P)).astype(np.int32)
    T_obs = Ts[obs_kf]  # (M,P,4,4)
    pc = np.einsum("mpij,mj->mpi", T_obs[..., :3, :3], lm) + T_obs[..., :3, 3]
    uv = np.stack(
        [
            458.0 * pc[..., 0] / pc[..., 2] + 376.0,
            457.0 * pc[..., 1] / pc[..., 2] + 240.0,
        ],
        axis=-1,
    ).astype(np.float32)
    uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)

    return schur_ba.BAProblem(
        cam_params=cam,
        kf_T=jnp.asarray(Ts + 0),
        kf_fixed=jnp.asarray([True, True] + [False] * (K - 2)),
        kf_valid=jnp.ones(K, bool),
        lm_pos=jnp.asarray(lm + rng.normal(0, 0.03, lm.shape).astype(np.float32)),
        lm_valid=jnp.ones(M, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_uv=jnp.asarray(uv),
        obs_inv_sigma=jnp.ones((M, P), jnp.float32),
        obs_valid=jnp.asarray(pc[..., 2] > 0.1),
    )


def _time_call(fn, arg, reps):
    import jax

    res = fn(arg)
    jax.block_until_ready(res.kf_T)  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        res = fn(arg)
        jax.block_until_ready(res.kf_T)
    return (time.perf_counter() - t0) / reps, res


def time_ba(device, prob, iters_lo=10, iters_hi=40, reps=5):
    """Marginal ms per LM iteration: (t(iters_hi) - t(iters_lo)) / diff.

    Differential timing removes the fixed per-call cost (dispatch, and on a
    tunneled remote device the ~25 ms RTT of the blocking result pull) that
    would otherwise be misattributed to the solver; applied identically to
    the TPU and the CPU baseline."""
    import jax

    from eorb_slam_tpu.optim import schur_ba

    prob_d = jax.device_put(prob, device)
    fn_lo = jax.jit(
        lambda p: schur_ba.bundle_adjust(p, iters=iters_lo), device=device
    )
    fn_hi = jax.jit(
        lambda p: schur_ba.bundle_adjust(p, iters=iters_hi), device=device
    )
    t_lo, res = _time_call(fn_lo, prob_d, reps)
    t_hi, _ = _time_call(fn_hi, prob_d, reps)
    return max(t_hi - t_lo, 1e-9) / (iters_hi - iters_lo) * 1000.0, res


def main():
    import jax

    prob = make_problem()

    tpu_ms, res = time_ba(jax.devices()[0], prob)

    try:
        cpu_dev = jax.devices("cpu")[0]
        cpu_ms, _ = time_ba(cpu_dev, prob, reps=2)
        vs = cpu_ms / tpu_ms
    except Exception:
        vs = float("nan")

    print(
        json.dumps(
            {
                "metric": "local_ba_ms_per_iter_K16_M2048_obs16k",
                "value": round(tpu_ms, 3),
                "unit": "ms/iter",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
