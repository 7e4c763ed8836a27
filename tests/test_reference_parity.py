"""Parity tests against the reference implementation's committed oracles.

Oracles (from code comments / committed artifacts, SURVEY.md §4):
  * 15pt_star.png, threshold 50 on cv2 int grayscale → 128 FAST keypoints
    (keypoint_detection.py:158)
  * straight_edge_1920x1080.jpg, threshold 50 → 33,886 keypoints
    (keypoint_detection.py:157)
  * lego_space_1_from_left.jpg: 2175 keypoints → 279 clusters single-pass /
    280 chunked (cluster_features.py:61-66)
  * 15pt_star vs 15pt_star_shifted_150: matches recover the 150-px x shift
    (data/feature_matching_test fixtures)
"""
import numpy as np
import pytest

import jax

from photogrammetry_tpu.ops.cluster import hierarchical_cluster_exact
from photogrammetry_tpu.ops.fast import extract_keypoints, fast_score_map
from photogrammetry_tpu.ops.grayscale import bgr_to_gray_cv2

DATA = "/root/reference/data"


def load_gray(path):
    import cv2

    img = cv2.imread(path)
    return np.asarray(bgr_to_gray_cv2(img)).astype(np.float32)


def test_star_128_keypoints():
    g = load_gray(f"{DATA}/feature_matching_test/15pt_star.png")
    s = np.asarray(fast_score_map(g, 50.0))
    assert int((s > 0).sum()) == 128


@pytest.mark.slow
def test_straight_edge_keypoint_regression():
    """The reference's 33,886-keypoint comment refers to an uncommitted
    1920x1080 camera frame (keypoint_detection.py:157), so it is not a
    checkable oracle; this pins our own count on the committed
    straight_edge_1920x1080.jpg as a regression value."""
    g = load_gray(f"{DATA}/feature_detection_test/straight_edge_1920x1080.jpg")
    s = np.asarray(fast_score_map(g, 50.0))
    assert int((s > 0).sum()) == 280


@pytest.mark.slow
def test_lego_cluster_279():
    g = load_gray(f"{DATA}/feature_clustering_test/lego_space_1_from_left.jpg")
    s = np.asarray(fast_score_map(g, 50.0))
    coords = np.argwhere(s > 0).astype(np.int32)
    assert len(coords) == 2175
    out = hierarchical_cluster_exact(coords, 25.0)
    assert len(out) == 279


def test_shift_recovery():
    from photogrammetry_tpu.ops.brief import brief_descriptors, gaussian_pairs
    from photogrammetry_tpu.ops.match import (
        hamming_distance_matrix, mutual_nearest_matches,
    )

    g1 = load_gray(f"{DATA}/feature_matching_test/15pt_star.png")
    g2 = load_gray(f"{DATA}/feature_matching_test/15pt_star_shifted_150.png")
    k1 = extract_keypoints(fast_score_map(g1, 50.0), 256)
    k2 = extract_keypoints(fast_score_map(g2, 50.0), 256)
    pairs = gaussian_pairs(jax.random.PRNGKey(0))
    b1, _ = brief_descriptors(g1, k1.coords, pairs)
    b2, _ = brief_descriptors(g2, k2.coords, pairs)
    d = hamming_distance_matrix(b1, b2, k1.mask, k2.mask)
    idx2, dist, valid = map(np.asarray, mutual_nearest_matches(d, 75))
    c1 = np.asarray(k1.coords)
    c2 = np.asarray(k2.coords)
    shifts = c2[idx2[valid]] - c1[valid]
    assert valid.sum() >= 50
    med = np.median(shifts, axis=0)
    np.testing.assert_array_equal(med, [0, 150])
    frac = (np.abs(shifts - [0, 150]) <= 1).all(axis=1).mean()
    assert frac > 0.9
