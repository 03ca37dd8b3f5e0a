"""Pallas TPU kernel for the Gaussian event splat.

The splat (reference ``EvImConverter::ev2im_gauss``, src/Event/
EventConversion.cc:215-269) is the hottest event-engine op: every MCI
candidate, every contrast-maximization iteration, and every L1 chunk image
runs one. The separable formulation (event/tensorize.py
``_splat_gauss_separable``) turns it into ``A^T B`` with per-event row/col
Gaussian weight matrices; this kernel additionally FUSES the construction of
A (N,H) and B (N,W) with the contraction, tiling over events so the weight
matrices live only in VMEM, never in HBM — the op becomes pure MXU work with
an (H,W) VMEM accumulator.

Layout: events arrive as one (4, N) tensor [x; y; w; 0] so the lane
dimension is the event axis (128-aligned); H/W are padded to (8,128) tiles
and cropped by the caller.

Backward (needed by contrast maximization, which differentiates the image
w.r.t. warped event coordinates) is registered as a custom VJP that reuses
the XLA separable formulation — three more MXU contractions, no scatter.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU-only at lowering time; import is safe everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_EV_TILE = 512  # events per grid step


def use_pallas() -> bool:
    """Pallas path is enabled on real TPU backends only (the CPU interpreter
    is far slower than XLA's native matmul lowering). EORB_NO_PALLAS=1
    forces the XLA path — needed when jitting for an explicit CPU device
    while the DEFAULT backend is a TPU (default_backend() cannot see the
    target device at trace time and pallas_call fails to lower on CPU)."""
    if not _HAS_PALLAS or os.environ.get("EORB_NO_PALLAS") == "1":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _splat_kernel(ev_ref, out_ref, acc_ref, *, Hp, Wp, nt, inv2s2, trunc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = ev_ref[0, :]  # (nt,)
    y = ev_ref[1, :]
    w = ev_ref[2, :]

    # A^T (Hp, nt): Gaussian column weights, scaled by the event weight
    hh = jax.lax.broadcasted_iota(jnp.int32, (Hp, nt), 0).astype(jnp.float32)
    dy = hh - y[None, :]
    at = jnp.exp(-dy * dy * inv2s2) * (jnp.abs(dy) <= trunc) * w[None, :]
    # B (nt, Wp): Gaussian row weights
    ww = jax.lax.broadcasted_iota(jnp.int32, (nt, Wp), 1).astype(jnp.float32)
    dx = ww - x[:, None]
    b = jnp.exp(-dx * dx * inv2s2) * (jnp.abs(dx) <= trunc)

    acc_ref[:] += jnp.dot(at, b, preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("H", "W", "sigma", "trunc", "ev_tile")
)
def _splat_pallas(xy, w_ev, *, H, W, sigma, trunc, ev_tile=_EV_TILE):
    n = xy.shape[0]
    npad = _round_up(max(n, ev_tile), ev_tile)
    Hp = _round_up(H, 8)
    Wp = _round_up(W, 128)

    ev = jnp.zeros((4, npad), jnp.float32)
    ev = ev.at[0, :n].set(xy[:, 0].astype(jnp.float32))
    ev = ev.at[1, :n].set(xy[:, 1].astype(jnp.float32))
    ev = ev.at[2, :n].set(w_ev.astype(jnp.float32))
    # padded events have w=0 AND sit at (0,0); force them outside the image
    pad_mask = jnp.arange(npad) >= n
    ev = ev.at[0].set(jnp.where(pad_mask, -1e6, ev[0]))

    grid = npad // ev_tile
    out = pl.pallas_call(
        functools.partial(
            _splat_kernel, Hp=Hp, Wp=Wp, nt=ev_tile,
            inv2s2=1.0 / (2.0 * sigma * sigma), trunc=trunc,
        ),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((4, ev_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Hp, Wp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Hp, Wp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * Hp * Wp + 6 * npad * (Hp + Wp),
            bytes_accessed=4 * npad * 4 + Hp * Wp * 4,
            transcendentals=npad * (Hp + Wp),
        ),
    )(ev)
    return out[:H, :W]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def splat(xy, w_ev, H, W, sigma, trunc):
    return _splat_pallas(xy, w_ev, H=H, W=W, sigma=sigma, trunc=trunc)


def _splat_fwd(xy, w_ev, H, W, sigma, trunc):
    return splat(xy, w_ev, H, W, sigma, trunc), (xy, w_ev)


def _splat_bwd(H, W, sigma, trunc, res, g):
    """VJP via the separable formulation: g flows into A/B analytically.

    dL/dx_n = Σ_w (A g)[n,w] · B[n,w] · (w−x_n)/σ²  (and symmetrically for
    y through A), dL/dw_n = Σ_h A0[n,h] Σ_w g[h,w] B[n,w] — all MXU
    contractions, computed by jax.vjp of the XLA separable splat."""
    from eorb_slam_tpu.event.tensorize import _splat_gauss_separable

    _, vjp = jax.vjp(
        lambda xy, w: _splat_gauss_separable(xy, w, H, W, sigma, trunc),
        *res,
    )
    return vjp(g)


splat.defvjp(_splat_fwd, _splat_bwd)
