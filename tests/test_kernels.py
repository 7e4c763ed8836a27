"""Pallas kernels vs their XLA reference implementations (interpret mode)."""
import numpy as np
import jax.numpy as jnp

from photogrammetry_tpu.kernels.hamming import hamming_distance_matrix_pallas
from photogrammetry_tpu.kernels.fast_stencil import fast_score_map_pallas
from photogrammetry_tpu.ops.match import hamming_distance_matrix
from photogrammetry_tpu.ops.fast import fast_score_map


def test_hamming_kernel_matches_reference():
    rng = np.random.default_rng(30)
    b1 = rng.integers(0, 2, (200, 256)).astype(np.uint8)
    b2 = rng.integers(0, 2, (150, 256)).astype(np.uint8)
    ref = np.asarray(hamming_distance_matrix(b1, b2))
    got = np.asarray(hamming_distance_matrix_pallas(b1, b2, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_hamming_kernel_tile_aligned():
    rng = np.random.default_rng(31)
    b1 = rng.integers(0, 2, (256, 256)).astype(np.uint8)
    b2 = rng.integers(0, 2, (128, 256)).astype(np.uint8)
    ref = np.asarray(hamming_distance_matrix(b1, b2))
    got = np.asarray(hamming_distance_matrix_pallas(b1, b2, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_fast_stencil_matches_reference():
    rng = np.random.default_rng(32)
    img = rng.integers(0, 255, (200, 180)).astype(np.float32)
    ref = np.asarray(fast_score_map(img, 30.0))
    got = np.asarray(fast_score_map_pallas(img, 30.0, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_fast_stencil_tile_multiple():
    rng = np.random.default_rng(33)
    img = rng.integers(0, 255, (256, 256)).astype(np.float32)
    ref = np.asarray(fast_score_map(img, 50.0))
    got = np.asarray(fast_score_map_pallas(img, 50.0, interpret=True))
    np.testing.assert_array_equal(got, ref)
