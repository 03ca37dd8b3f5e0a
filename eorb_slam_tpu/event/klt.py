"""Pyramidal Lucas-Kanade tracking as a jitted batched kernel.

Replaces ``ELK_Tracker`` / cv::calcOpticalFlowPyrLK (reference
include/Event/KLT_Tracker.h:29-93, src/Event/KLT_Tracker.cpp) with the
inverse-compositional formulation: per-point template gradients and the 2x2
Gauss-Newton Hessian are computed ONCE from the reference image, then each
pyramid level runs a fixed number of update iterations — all points advance
in lockstep as dense vmapped gather/arithmetic, no data-dependent control
flow. Factor-2 pyramid via average pooling (the reference uses OpenCV's
default 3-4 level pyramid; params Event.klt.* Examples/Event/EvETHZ.yaml).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _bilinear(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample img (H,W) at continuous (x,y) points (...,2); zero padding."""
    H, W = img.shape
    x = xy[..., 0]
    y = xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi, w):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb, v, 0.0) * w

    return (
        tap(y0i, x0i, (1 - fx) * (1 - fy))
        + tap(y0i, x0i + 1, fx * (1 - fy))
        + tap(y0i + 1, x0i, (1 - fx) * fy)
        + tap(y0i + 1, x0i + 1, fx * fy)
    )


def downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """Factor-2 average-pool downsample."""
    H, W = img.shape
    h2, w2 = H // 2, W // 2
    return img[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2).mean(axis=(1, 3))


class KLTResult(NamedTuple):
    xy: jnp.ndarray       # (N,2) tracked positions in the current image
    ok: jnp.ndarray       # (N,) bool — converged, in-bounds, low residual
    err: jnp.ndarray      # (N,) mean abs photometric residual
    ncc: jnp.ndarray      # (N,) template/patch normalized cross-correlation


@functools.partial(
    jax.jit, static_argnames=("win", "levels", "iters")
)
def track(
    img_ref: jnp.ndarray,    # (H,W) float
    img_cur: jnp.ndarray,    # (H,W)
    xy0: jnp.ndarray,        # (N,2) points in the reference image
    valid: jnp.ndarray,      # (N,)
    guess: jnp.ndarray = None,  # (N,2) initial positions in cur (def: xy0)
    win: int = 11,
    levels: int = 3,
    iters: int = 8,
    min_ncc: float = 0.5,
) -> KLTResult:
    H, W = img_ref.shape
    n = xy0.shape[0]
    if guess is None:
        guess = xy0
    half = win // 2
    oy, ox = jnp.meshgrid(
        jnp.arange(-half, half + 1, dtype=img_ref.dtype),
        jnp.arange(-half, half + 1, dtype=img_ref.dtype),
        indexing="ij",
    )
    offs = jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)  # (w2,2)

    # pyramids
    pyr_ref = [img_ref]
    pyr_cur = [img_cur]
    for _ in range(levels - 1):
        pyr_ref.append(downsample2(pyr_ref[-1]))
        pyr_cur.append(downsample2(pyr_cur[-1]))

    d = (guess - xy0) / (2.0 ** (levels - 1))   # displacement at coarsest
    p_ref = xy0

    for lv in range(levels - 1, -1, -1):
        Ir = pyr_ref[lv]
        Ic = pyr_cur[lv]
        s = 2.0 ** lv
        pr = p_ref / s                                       # (N,2)

        # template patch + gradients at the reference position
        pts = pr[:, None, :] + offs[None, :, :]              # (N,w2,2)
        T = _bilinear(Ir, pts)                               # (N,w2)
        gx = 0.5 * (
            _bilinear(Ir, pts + jnp.asarray([1.0, 0.0]))
            - _bilinear(Ir, pts - jnp.asarray([1.0, 0.0]))
        )
        gy = 0.5 * (
            _bilinear(Ir, pts + jnp.asarray([0.0, 1.0]))
            - _bilinear(Ir, pts - jnp.asarray([0.0, 1.0]))
        )
        Hxx = jnp.sum(gx * gx, axis=1)
        Hxy = jnp.sum(gx * gy, axis=1)
        Hyy = jnp.sum(gy * gy, axis=1)
        det = Hxx * Hyy - Hxy * Hxy
        inv_ok = det > 1e-6
        det_s = jnp.where(inv_ok, det, 1.0)

        def body(_, d):
            cur = (pr + d)[:, None, :] + offs[None, :, :]
            I = _bilinear(Ic, cur)                           # (N,w2)
            r = I - T
            bx = jnp.sum(gx * r, axis=1)
            by = jnp.sum(gy * r, axis=1)
            dx = (Hyy * bx - Hxy * by) / det_s
            dy = (Hxx * by - Hxy * bx) / det_s
            step = jnp.stack([dx, dy], axis=-1)
            step = jnp.where(inv_ok[:, None], step, 0.0)
            return d - step

        d = jax.lax.fori_loop(0, iters, body, d)
        if lv > 0:
            d = d * 2.0

    xy = xy0 + d
    # final residual + validity
    pts = xy[:, None, :] + offs[None, :, :]
    I = _bilinear(pyr_cur[0], pts)
    ptsr = xy0[:, None, :] + offs[None, :, :]
    T0 = _bilinear(pyr_ref[0], ptsr)
    err = jnp.mean(jnp.abs(I - T0), axis=1)
    # quality gate: normalized cross-correlation between template and the
    # tracked patch — robust to absolute intensity scale, 0 for vanished or
    # occluded targets
    muI = jnp.mean(I, axis=1, keepdims=True)
    muT = jnp.mean(T0, axis=1, keepdims=True)
    ncc = jnp.sum((I - muI) * (T0 - muT), axis=1) / (
        jnp.sqrt(jnp.sum((I - muI) ** 2, axis=1)
                 * jnp.sum((T0 - muT) ** 2, axis=1)) + 1e-9
    )
    inb = (
        (xy[:, 0] >= half) & (xy[:, 0] < W - half)
        & (xy[:, 1] >= half) & (xy[:, 1] < H - half)
    )
    ok = valid & inb & (ncc >= min_ncc)
    return KLTResult(xy=xy, ok=ok, err=err, ncc=ncc)


def median_displacement(res: KLTResult, xy0: jnp.ndarray) -> jnp.ndarray:
    """Median pixel displacement of good tracks — drives the adaptive event
    window size (reference calcNewL1ChunkSize targets maxPixelDisp,
    src/Event/EvImBuilder.cpp:197-230)."""
    disp = jnp.linalg.norm(res.xy - xy0, axis=-1)
    disp = jnp.where(res.ok, disp, jnp.nan)
    return jnp.nanmedian(disp)
