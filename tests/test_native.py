"""Native host library vs Python/JAX reference implementations."""
import numpy as np
import pytest

from photogrammetry_tpu import native
from photogrammetry_tpu.ops.cluster import hierarchical_cluster_exact
from photogrammetry_tpu.ops.match import greedy_global_matches


def test_native_builds():
    assert native.available(), "g++ build of libphoto_host.so failed"


def test_native_cluster_matches_python():
    rng = np.random.default_rng(40)
    coords = rng.integers(0, 200, (150, 2)).astype(np.int32)
    ref = hierarchical_cluster_exact(coords, 15.0)
    got = native.cluster_exact(coords, 15.0)
    assert len(got) == len(ref)
    # same centroid multiset
    assert sorted(map(tuple, got.tolist())) == sorted(map(tuple, ref.tolist()))


def test_native_cluster_empty_and_single():
    assert len(native.cluster_exact(np.zeros((0, 2), np.int32), 10.0)) == 0
    out = native.cluster_exact(np.array([[5, 7]], np.int32), 10.0)
    assert out.tolist() == [[5, 7]]


def test_native_greedy_matches_jax():
    rng = np.random.default_rng(41)
    d = rng.integers(0, 256, (40, 30)).astype(np.int32)
    ii, jj, dd = native.greedy_match(d)
    ji, jjj, jdd, valid = map(np.asarray, greedy_global_matches(d, 30))
    np.testing.assert_array_equal(dd, jdd[valid])
    # assignments must agree when distances are unique per step
    np.testing.assert_array_equal(ii, ji[valid])
    np.testing.assert_array_equal(jj, jjj[valid])


@pytest.mark.slow
def test_native_cluster_lego_parity():
    import cv2

    from photogrammetry_tpu.ops.fast import fast_score_map
    from photogrammetry_tpu.ops.grayscale import bgr_to_gray_cv2

    img = cv2.imread(
        "/root/reference/data/feature_clustering_test/lego_space_1_from_left.jpg")
    g = np.asarray(bgr_to_gray_cv2(img)).astype(np.float32)
    s = np.asarray(fast_score_map(g, 50.0))
    coords = np.argwhere(s > 0).astype(np.int32)
    assert len(coords) == 2175
    out = native.cluster_exact(coords, 25.0)
    assert len(out) == 279  # cluster_features.py:61-63 oracle
