"""Pyramidal KLT kernel tests: known-shift recovery, occlusion rejection."""

import jax.numpy as jnp
import numpy as np

from eorb_slam_tpu.event import klt, tensorize

H, W = 160, 200


def blob_image(seed=0, n=120):
    rng = np.random.default_rng(seed)
    xy = rng.uniform([10, 10], [W - 10, H - 10], (n, 2)).astype(np.float32)
    img = tensorize.splat_gauss(
        jnp.asarray(xy), jnp.ones(n, bool), jnp.ones(n), H, W, sigma=1.5
    )
    return img, xy


def shift_image(img, dx, dy):
    """Sample img at (x-dx, y-dy): content moves by (+dx,+dy)."""
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    pts = jnp.stack([xs - dx, ys - dy], axis=-1).reshape(-1, 2)
    return klt._bilinear(img, pts).reshape(H, W)


class TestKLT:
    def test_recovers_known_shift(self):
        img, xy = blob_image()
        dx, dy = 3.7, -2.3
        img2 = shift_image(img, dx, dy)
        pts = jnp.asarray(xy[:50])
        res = klt.track(img, img2, pts, jnp.ones(50, bool))
        ok = np.asarray(res.ok)
        assert ok.sum() > 35
        d = np.asarray(res.xy) - np.asarray(pts)
        err = np.abs(d[ok] - np.asarray([dx, dy])).max()
        assert err < 0.35, f"max displacement error {err:.3f}px"

    def test_large_shift_with_pyramid(self):
        img, xy = blob_image(seed=1)
        dx, dy = 11.0, 7.0
        img2 = shift_image(img, dx, dy)
        pts = jnp.asarray(xy[:50])
        res = klt.track(img, img2, pts, jnp.ones(50, bool), levels=4,
                        iters=12)
        ok = np.asarray(res.ok)
        assert ok.sum() > 25
        d = np.asarray(res.xy)[ok] - np.asarray(pts)[ok]
        med = np.median(d, axis=0)
        assert np.abs(med - np.asarray([dx, dy])).max() < 0.5

    def test_lost_points_flagged(self):
        img, xy = blob_image(seed=2)
        # blobs vanish (flat current image): tracks must fail the residual
        # gate — the template energy has nowhere to go
        img2 = jnp.zeros_like(img)
        pts = jnp.asarray(xy[:40])
        res = klt.track(img, img2, pts, jnp.ones(40, bool))
        assert np.asarray(res.ok).mean() < 0.5

    def test_median_displacement(self):
        img, xy = blob_image(seed=3)
        img2 = shift_image(img, 4.0, 3.0)
        pts = jnp.asarray(xy[:60])
        res = klt.track(img, img2, pts, jnp.ones(60, bool))
        med = float(klt.median_displacement(res, pts))
        assert abs(med - 5.0) < 0.5  # |(4,3)| = 5
