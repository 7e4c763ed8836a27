"""FAST detector unit tests.

Mirrors the reference's xUnit fixtures (ImageProcessing.Tests/
KeypointDetectionTests.cs): tiny synthetic images with known corner structure,
plus a brute-force re-implementation of the ring test as an oracle.
"""
import numpy as np
import pytest

from photogrammetry_tpu.ops.fast import (
    RING_OFFSETS, fast_score_map, extract_keypoints,
)


def brute_force_score(img, r, c, thr):
    """Direct transcription of the reference ring semantics
    (KeypointDetection.cs:65-113) as an oracle."""
    center = img[r, c]
    outside = []
    for dr, dc in RING_OFFSETS:
        t = img[r + dr, c + dc]
        inside = (t > center - thr) and (t < center + thr)
        outside.append(not inside)
    if all(outside):
        return 16
    best = run = 0
    for k in range(32):
        if outside[k % 16]:
            run += 1
            best = max(best, min(run, 16))
        else:
            run = 0
    return best if best >= 12 else 0


def test_uniform_image_has_no_keypoints():
    img = np.full((16, 16), 7.0, np.float32)
    s = np.asarray(fast_score_map(img, 1.0))
    assert (s == 0).all()


def test_bright_dot_is_corner():
    img = np.zeros((16, 16), np.float32)
    img[8, 8] = 100.0  # isolated dot: whole ring outside band -> score 16
    s = np.asarray(fast_score_map(img, 10.0))
    assert s[8, 8] == 16


def test_dim_center_bright_ring_not_corner():
    # Uniform bright image with one dim pixel: its ring is fully outside ->
    # corner at the dim pixel, but its neighbors see mostly-inside rings.
    img = np.full((16, 16), 100.0, np.float32)
    img[8, 8] = 0.0
    s = np.asarray(fast_score_map(img, 10.0))
    assert s[8, 8] == 16
    assert s[8, 4] == 0


def test_matches_brute_force_on_random_images():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (24, 24)).astype(np.float32)
    thr = 30.0
    s = np.asarray(fast_score_map(img, thr))
    for r in range(3, 21):
        for c in range(3, 21):
            assert s[r, c] == brute_force_score(img, r, c, thr), (r, c)


def test_border_excluded():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (20, 20)).astype(np.float32)
    s = np.asarray(fast_score_map(img, 5.0))
    assert (s[:3, :] == 0).all() and (s[-3:, :] == 0).all()
    assert (s[:, :3] == 0).all() and (s[:, -3:] == 0).all()


def test_extract_keypoints_raster_order():
    img = np.zeros((20, 20), np.float32)
    img[5, 5] = 100.0
    img[10, 12] = 100.0
    s = fast_score_map(img, 10.0)
    pts = extract_keypoints(s, capacity=8, order="raster")
    assert int(pts.count) == 2
    np.testing.assert_array_equal(np.asarray(pts.coords[:2]),
                                  [[5, 5], [10, 12]])
    assert np.asarray(pts.mask)[:2].all() and not np.asarray(pts.mask)[2:].any()


def test_extract_keypoints_score_order_stable():
    img = np.zeros((32, 32), np.float32)
    img[5, 5] = 100.0    # score 16
    # weaker corner: checkerboard-ish structure scores lower
    img[20, 20] = 100.0
    img[17, 20] = 100.0  # ring pixel inside band at position 0 -> score < 16
    s = fast_score_map(img, 10.0)
    pts = extract_keypoints(s, capacity=8, order="score")
    sc = np.asarray(pts.score)
    assert (np.diff(sc[: int(pts.count)]) <= 0).all()


def test_capacity_truncation():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (40, 40)).astype(np.float32)
    s = fast_score_map(img, 20.0)
    total = int((np.asarray(s) > 0).sum())
    if total < 3:
        pytest.skip("fixture produced too few corners")
    pts = extract_keypoints(s, capacity=2, order="raster")
    assert int(pts.count) == 2
    assert np.asarray(pts.mask).sum() == 2
