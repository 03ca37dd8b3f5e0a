"""Front-end kernel tests: FAST vs OpenCV oracle, descriptor invariance,
Hamming matcher vs numpy popcount."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from eorb_slam_tpu.ops import fast, frontend, matching, orb, pyramid

RNG = np.random.default_rng(3)


def synth_image(h=240, w=320, n_blobs=80, seed=0):
    """Random blobby test image with corners (float32 [0,255])."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for _ in range(n_blobs):
        y, x = rng.integers(20, h - 20), rng.integers(20, w - 20)
        sz = rng.integers(4, 16)
        img[y : y + sz, x : x + sz] = rng.uniform(60, 255)
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    return img.astype(np.float32)


def test_fast_matches_opencv_detection():
    img = synth_image()
    score = np.asarray(fast.nms3x3(fast.fast_score(jnp.asarray(img), 20.0)))
    ours = np.argwhere(score > 0)  # (N,2) y,x

    det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=True)
    kps = det.detect(img.astype(np.uint8))
    cv_pts = np.asarray([[kp.pt[1], kp.pt[0]] for kp in kps])  # y,x
    assert len(cv_pts) > 20, "test image must have corners"

    # every cv corner should have one of ours within 2px (NMS tie-breaks differ)
    d = np.linalg.norm(cv_pts[:, None, :] - ours[None, :, :], axis=-1).min(axis=1)
    frac = (d <= 2.0).mean()
    assert frac > 0.9, f"only {frac:.2%} of OpenCV corners recovered"
    # and we should not hallucinate wildly more corners
    assert len(ours) < 4 * len(cv_pts)


def test_detect_grid_uniform_and_valid():
    img = synth_image()
    xy, resp, valid = fast.detect_grid(jnp.asarray(img), max_kp=256)
    xy, resp, valid = np.asarray(xy), np.asarray(resp), np.asarray(valid)
    assert valid.sum() > 50
    assert (resp[valid] > 0).all()
    # all valid keypoints inside the border
    assert (xy[valid, 0] >= 16).all() and (xy[valid, 0] < 320 - 16).all()
    assert (xy[valid, 1] >= 16).all() and (xy[valid, 1] < 240 - 16).all()


def test_orientation_rotation_equivariance():
    img = synth_image(256, 256, seed=4)
    # rotate image by 90 deg; orientation of the rotated patch should shift by 90
    img_r = np.rot90(img, k=-1).copy()  # clockwise
    xy = np.asarray([[100, 80]], np.float32)  # (x,y)
    a0 = float(orb.orientations(jnp.asarray(img), jnp.asarray(xy))[0])
    # point (x,y) maps to (W-1-y, x) under clockwise rot90
    xy_r = np.asarray([[256 - 1 - 80, 100]], np.float32)
    a1 = float(orb.orientations(jnp.asarray(img_r), jnp.asarray(xy_r))[0])
    d = (a1 - a0 - np.pi / 2) % (2 * np.pi)
    d = min(d, 2 * np.pi - d)
    assert d < 0.15, f"angle shift {np.degrees(d):.1f} deg off from 90"


def test_descriptor_rotation_invariance():
    """Descriptors at the same physical corner should match under rotation."""
    img = synth_image(256, 256, seed=5)
    feats = frontend.extract(jnp.asarray(img), max_kp=256)
    img_r = np.rot90(img, k=-1).copy()
    feats_r = frontend.extract(jnp.asarray(img_r), max_kp=256)

    # map our keypoints into rotated frame and find correspondences by position
    xy = np.asarray(feats.xy)
    v = np.asarray(feats.valid)
    xy_rot = np.stack([256 - 1 - xy[:, 1], xy[:, 0]], axis=1)
    xyr = np.asarray(feats_r.xy)
    vr = np.asarray(feats_r.valid)

    m12, d12 = matching.match_nnratio(
        feats.desc_pm1, feats.valid, feats_r.desc_pm1, feats_r.valid,
        pair_mask=jnp.asarray(
            np.linalg.norm(xy_rot[:, None] - xyr[None, :], axis=-1) < 3.0
        ),
        max_dist=80, nn_ratio=0.95,
    )
    m12 = np.asarray(m12)
    n_cand = (np.linalg.norm(xy_rot[v][:, None] - xyr[vr][None, :], axis=-1) < 3.0).any(1).sum()
    n_match = (m12 >= 0).sum()
    assert n_cand >= 20
    assert n_match > 0.5 * n_cand, f"{n_match}/{n_cand} rotated matches"
    d12 = np.asarray(d12)
    assert np.median(d12[m12 >= 0]) < 60


def test_hamming_matrix_vs_numpy():
    a = RNG.integers(0, 2**32, (16, 8), dtype=np.uint32)
    b = RNG.integers(0, 2**32, (24, 8), dtype=np.uint32)
    ap = orb.unpack_pm1(jnp.asarray(a))
    bp = orb.unpack_pm1(jnp.asarray(b))
    d = np.asarray(matching.hamming_matrix(ap, bp))
    ref = np.zeros((16, 24), np.int32)
    for i in range(16):
        for j in range(24):
            ref[i, j] = bin(
                int.from_bytes(a[i].tobytes(), "little")
                ^ int.from_bytes(b[j].tobytes(), "little")
            ).count("1")
    np.testing.assert_array_equal(d, ref)


def test_match_identical_descriptors():
    img = synth_image()
    f = frontend.extract(jnp.asarray(img), max_kp=256)
    m, d = matching.match_nnratio(
        f.desc_pm1, f.valid, f.desc_pm1, f.valid, nn_ratio=1.0
    )
    m, d = np.asarray(m), np.asarray(d)
    v = np.asarray(f.valid)
    idx = np.arange(256)
    # self-match must be identity with distance 0 (where valid)
    ok = m[v] == idx[v]
    assert ok.mean() > 0.95  # allow a few duplicate descriptors
    assert (d[v][ok] == 0).all()


def test_rotation_consistency_filter():
    n = 64
    a1 = np.zeros(n, np.float32)
    a2 = np.zeros(n, np.float32)
    a2[:50] = -0.3            # dominant rotation
    a2[50:] = RNG.uniform(1.0, 3.0, 14)  # stragglers
    best12 = np.arange(n)
    matched = np.ones(n, bool)
    keep = np.asarray(
        matching.rotation_consistency(
            jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(best12), jnp.asarray(matched)
        )
    )
    assert keep[:50].all()
    assert keep[50:].sum() <= 6


def test_extract_jit_shapes():
    img = synth_image()
    f = frontend.extract(jnp.asarray(img), max_kp=512)
    assert f.xy.shape == (512, 2)
    assert f.desc.shape == (512, 8)
    assert f.desc_pm1.shape == (512, 256)
    assert int(f.valid.sum()) > 100
    # octaves populated
    assert int(f.octave.max()) >= 1
