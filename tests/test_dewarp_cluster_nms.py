"""Dewarp, clustering and NMS tests."""
import numpy as np
import pytest

from photogrammetry_tpu.core.cubic import solve_cubic_real, middle_real_root
from photogrammetry_tpu.ops.dewarp import (
    solve_undistorted_radius, generate_distortion_map, apply_distortion_map,
)
from photogrammetry_tpu.ops.cluster import (
    grid_cluster_keypoints, hierarchical_cluster_exact,
)
from photogrammetry_tpu.ops.nms import nms_keypoints, compact_points
from photogrammetry_tpu.utils.padding import pad_to

REF_COEFFS = [3e-4, 1e-7, 0.0, 0.0, 0.0]  # de_warp.py:52 / appsettings.json


# ---------------------------------------------------------------- cubic
def test_cubic_three_real_roots():
    # (r-1)(r-2)(r-3) = r^3 - 6r^2 + 11r - 6
    roots, n = solve_cubic_real(-6.0, 11.0, -6.0)
    assert int(n) == 3
    np.testing.assert_allclose(np.sort(np.asarray(roots)), [1, 2, 3], atol=1e-4)
    assert float(middle_real_root(-6.0, 11.0, -6.0)) == pytest.approx(2.0, abs=1e-4)


def test_cubic_single_real_root():
    # r^3 + r + 1 has one real root ~ -0.6823
    roots, n = solve_cubic_real(0.0, 1.0, 1.0)
    assert int(n) == 1
    assert float(middle_real_root(0.0, 1.0, 1.0)) == pytest.approx(-0.68233, abs=1e-4)


def test_cubic_vs_numpy_roots_batch():
    rng = np.random.default_rng(8)
    bs = rng.uniform(-5, 5, 64)
    cs = rng.uniform(-5, 5, 64)
    ds = rng.uniform(-5, 5, 64)
    mid = np.asarray(middle_real_root(bs, cs, ds))
    for i in range(64):
        r = np.roots([1.0, bs[i], cs[i], ds[i]])
        reals = np.sort(r.real[np.abs(r.imag) < 1e-6])
        expect = reals[1] if len(reals) == 3 else reals[0]
        assert mid[i] == pytest.approx(expect, abs=5e-3), i


# ---------------------------------------------------------------- dewarp
def test_undistorted_radius_forward_model_roundtrip():
    """r must satisfy rd = r * f(r) for the solved root."""
    coeffs = np.array(REF_COEFFS, np.float32)
    rds = np.linspace(1.0, 1200.0, 50).astype(np.float32)
    rs = np.asarray(solve_undistorted_radius(rds, coeffs))
    k1, k2, k3, k4, k5 = coeffs
    f = (1 + k1 * rs + k2 * rs ** 2) / (1 + k3 * rs + k4 * rs ** 2 + k5 * rs ** 3)
    np.testing.assert_allclose(rs * f, rds, rtol=2e-3)


def test_distortion_map_matches_reference_loop():
    """Oracle: direct transcription of warping.py:104-144 on a small image."""
    h, w = 24, 20
    coeffs = REF_COEFFS
    ref = np.empty((h, w, 2), np.float64)
    x0, y0 = h / 2, w / 2
    for u in range(h):
        for v in range(w):
            x = int(u - x0)
            y = int(v - y0)
            rd = np.hypot(x, y)
            if rd == 0:
                r = 0.0
            else:
                b = (rd * coeffs[3] - coeffs[0]) / (rd * coeffs[4] - coeffs[1])
                c = (rd * coeffs[2] - 1) / (rd * coeffs[4] - coeffs[1])
                d = rd / (rd * coeffs[4] - coeffs[1])
                roots = np.roots([1.0, b, c, d])
                reals = np.sort(roots.real[np.abs(roots.imag) < 1e-5])
                r = reals[1] if len(reals) == 3 else reals[0]
            theta = np.arctan2(x, y)
            ref[u, v] = (r * np.sin(theta) + x0, r * np.cos(theta) + y0)
    got = np.asarray(generate_distortion_map(h, w, coeffs))
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_apply_distortion_identity_map():
    rng = np.random.default_rng(9)
    img = rng.uniform(0, 255, (16, 12)).astype(np.float32)
    rows, cols = np.mgrid[0:16, 0:12].astype(np.float32)
    ident = np.stack([rows, cols], -1)
    out = np.asarray(apply_distortion_map(img, ident, mode="bilinear"))
    np.testing.assert_allclose(out, img, atol=1e-4)
    out_n = np.asarray(apply_distortion_map(img, ident, mode="nearest"))
    np.testing.assert_allclose(out_n, img, atol=1e-4)


def test_apply_distortion_out_of_bounds_zero():
    img = np.ones((8, 8), np.float32)
    bad = np.full((8, 8, 2), 100.0, np.float32)
    out = np.asarray(apply_distortion_map(img, bad))
    assert (out == 0).all()


def test_apply_distortion_bilinear_interpolates():
    img = np.array([[0.0, 10.0], [20.0, 30.0]], np.float32)
    m = np.array([[[0.5, 0.5]]], np.float32)
    out = np.asarray(apply_distortion_map(img, m))
    assert out[0, 0] == pytest.approx(15.0)


# ---------------------------------------------------------------- cluster
def test_exact_cluster_merges_nearby():
    coords = np.array([[0, 0], [0, 4], [100, 100]], np.int32)
    out = hierarchical_cluster_exact(coords, max_merge_dist=10)
    assert len(out) == 2
    assert [0, 2] in out.tolist()
    assert [100, 100] in out.tolist()


def test_exact_cluster_weighted_centroid():
    # (0,0)+(0,4) merge -> (0,2); then (0,2)+(0,8) at distance 6 -> weighted
    # centroid (2*(0,2)+(0,8))/3 = (0,4)
    coords = np.array([[0, 0], [0, 4], [0, 8]], np.int32)
    out = hierarchical_cluster_exact(coords, max_merge_dist=6)
    assert out.tolist() == [[0, 4]]


def test_exact_cluster_linkage_matrix():
    """Scipy-style linkage rows [id1, id2, dist, count] in merge order with
    new clusters numbered n0.. (the reference's z, hierarchical.py:56-58)."""
    coords = np.array([[0, 0], [0, 4], [0, 8], [50, 50]], np.int32)
    cents, z = hierarchical_cluster_exact(coords, max_merge_dist=6,
                                          return_linkage=True)
    # merge 0: clusters 0,1 at distance 4 -> cluster 4 (count 2, center (0,2))
    # merge 1: clusters 4,2 at distance 6 -> cluster 5 (count 3)
    assert z.shape == (2, 4)
    assert sorted(z[0, :2].tolist()) == [0, 1]
    assert z[0, 2] == pytest.approx(4.0) and z[0, 3] == 2
    assert sorted(z[1, :2].tolist()) == [2, 4]
    assert z[1, 2] == pytest.approx(6.0) and z[1, 3] == 3
    assert len(cents) == 2  # merged line + the far point


def test_grid_cluster_matches_exact_within_chunk():
    rng = np.random.default_rng(10)
    # Points confined to one chunk of a 64x64/4x4 grid.
    coords = rng.integers(0, 16, (12, 2)).astype(np.int32)
    pts = pad_to(coords, np.ones(12), capacity=32)
    out = grid_cluster_keypoints(pts, 64, 64, max_merge_dist=4.0,
                                 chunk_capacity=16)
    got = np.asarray(out.coords)[np.asarray(out.mask)]
    ref = hierarchical_cluster_exact(coords, max_merge_dist=4.0)
    # Same number of clusters; centroid sets match as multisets (ordering
    # and tie-breaking may differ).
    assert len(got) == len(ref)


def test_grid_cluster_distant_points_untouched():
    coords = np.array([[2, 2], [30, 30], [60, 60]], np.int32)
    pts = pad_to(coords, np.ones(3), capacity=8)
    out = grid_cluster_keypoints(pts, 64, 64, max_merge_dist=5.0,
                                 chunk_capacity=8)
    got = sorted(np.asarray(out.coords)[np.asarray(out.mask)].tolist())
    assert got == [[2, 2], [30, 30], [60, 60]]


# ---------------------------------------------------------------- nms
def test_nms_suppresses_within_radius():
    coords = np.array([[10, 10], [10, 14], [40, 40]], np.int32)
    score = np.array([16.0, 12.0, 14.0])
    pts = pad_to(coords, score, capacity=8)
    out = nms_keypoints(pts, 5.0)
    kept = np.asarray(out.mask)
    assert kept[0] and not kept[1] and kept[2]
    assert int(out.count) == 2


def test_nms_strictly_greater_survives():
    # distance exactly == radius is suppressed (IsAcceptableDistance uses >)
    coords = np.array([[0, 0], [0, 5]], np.int32)
    pts = pad_to(coords, np.array([10.0, 9.0]), capacity=4)
    out = nms_keypoints(pts, 5.0)
    assert int(out.count) == 1
    out2 = nms_keypoints(pts, 4.999)
    assert int(out2.count) == 2


def test_nms_recursive_chain():
    # A>B suppresses B; C only within radius of B, so C survives because B
    # was suppressed -> exercises the recursive greedy semantics.
    coords = np.array([[0, 0], [0, 4], [0, 8]], np.int32)
    pts = pad_to(coords, np.array([10.0, 9.0, 8.0]), capacity=4)
    out = nms_keypoints(pts, 5.0)
    kept = np.asarray(out.mask)
    assert kept[0] and not kept[1] and kept[2]


def test_compact_points():
    coords = np.array([[0, 0], [1, 1], [2, 2]], np.int32)
    pts = pad_to(coords, np.array([1.0, 2.0, 3.0]), capacity=8)
    masked = pts._replace(mask=np.array([False, True, True] + [False] * 5),
                          count=np.int32(2))
    out = compact_points(masked, capacity=4)
    assert int(out.count) == 2
    np.testing.assert_array_equal(np.asarray(out.coords[:2]), [[1, 1], [2, 2]])


def test_parallel_nms_equals_sequential():
    from photogrammetry_tpu.ops.nms import nms_keypoints_parallel

    rng = np.random.default_rng(70)
    for trial in range(5):
        n = 200
        coords = rng.integers(0, 300, (n, 2)).astype(np.int32)
        scores = rng.integers(12, 17, n).astype(np.float32)
        pts = pad_to(coords, scores, capacity=256)
        seq = nms_keypoints(pts, 12.0)
        par = nms_keypoints_parallel(pts, 12.0)
        np.testing.assert_array_equal(np.asarray(seq.mask),
                                      np.asarray(par.mask)), trial
        assert int(seq.count) == int(par.count)


def test_parallel_nms_chain():
    from photogrammetry_tpu.ops.nms import nms_keypoints_parallel

    # worst-case monotone chain: A>B>C... collinear within radius
    coords = np.array([[0, i * 4] for i in range(10)], np.int32)
    scores = np.arange(10, 0, -1).astype(np.float32)
    pts = pad_to(coords, scores, capacity=16)
    seq = nms_keypoints(pts, 5.0)
    par = nms_keypoints_parallel(pts, 5.0)
    np.testing.assert_array_equal(np.asarray(seq.mask), np.asarray(par.mask))


def test_anms_even_distribution():
    """ANMS keeps the strongest point and spreads survivors spatially."""
    import jax.numpy as jnp
    from photogrammetry_tpu.ops.nms import anms_keypoints
    from photogrammetry_tpu.utils.padding import PaddedPoints

    rng = np.random.default_rng(0)
    k = 64
    # dense cluster at origin + far-away weak singleton
    coords = np.vstack([rng.integers(0, 10, (k - 1, 2)), [[100, 100]]])
    score = np.concatenate([rng.integers(12, 17, k - 1), [12]]).astype(np.float32)
    pts = PaddedPoints(coords=jnp.asarray(coords, jnp.int32),
                       score=jnp.asarray(score),
                       mask=jnp.ones((k,), bool),
                       count=jnp.int32(k))
    out = anms_keypoints(pts, num_keep=4)
    kept = np.asarray(out.mask)
    assert int(out.count) == 4
    # the isolated point has infinite radius -> always kept
    assert kept[k - 1]
    # the globally strongest point has infinite radius -> always kept
    strongest = int(np.lexsort((np.arange(k), -score))[0])
    assert kept[strongest]


def test_anms_respects_mask():
    import jax.numpy as jnp
    from photogrammetry_tpu.ops.nms import anms_keypoints
    from photogrammetry_tpu.utils.padding import PaddedPoints

    coords = jnp.asarray([[0, 0], [5, 5], [50, 50], [90, 90]], jnp.int32)
    score = jnp.asarray([16.0, 15.0, 14.0, 13.0])
    mask = jnp.asarray([True, True, False, True])
    pts = PaddedPoints(coords=coords, score=score, mask=mask,
                       count=jnp.int32(3))
    out = anms_keypoints(pts, num_keep=8)
    kept = np.asarray(out.mask)
    assert not kept[2]
    assert int(out.count) == 3
