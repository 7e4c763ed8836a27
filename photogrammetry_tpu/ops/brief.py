"""BRIEF descriptors as batched gathers + bit-packing.

Reference semantics (python_src/photogrammetry/models/keypoint.py:32-57,
dotnet_src/ImageProcessing.Abstractions/Keypoint.cs:29-57):
  * 256 point pairs drawn from N(0, sigma=50), rounded to integer offsets;
  * bit i is set iff intensity(p + a_i) < intensity(p + b_i);
  * pairs with either endpoint out of bounds leave the bit 0.

The reference regenerates pairs per run from an unseeded RNG, which makes
descriptors incomparable across runs — flagged "critical importance" at
keypoint_cache.py:22.  Here pairs are a pure function of a PRNG key, so
descriptors are deterministic and cacheable.

Bit order: pair i -> bit i (LSB-first), matching the Python tree
(keypoint.py:49: ``des += 2**idx``).  The C# tree uses MSB-first
(Keypoint.cs:38: left-shift per pair); Hamming distances are identical
under any fixed bit permutation so matching results are unaffected.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NUM_PAIRS = 256
DEFAULT_SIGMA = 50.0


def gaussian_pairs(key: jax.Array, sigma: float = DEFAULT_SIGMA,
                   num_pairs: int = NUM_PAIRS) -> jnp.ndarray:
    """(num_pairs, 2, 2) int32 — [(a_row, a_col), (b_row, b_col)] offsets."""
    pts = jax.random.normal(key, (num_pairs, 2, 2)) * sigma
    return jnp.rint(pts).astype(jnp.int32)


@jax.jit
def brief_bits(image: jnp.ndarray, coords: jnp.ndarray,
               pairs: jnp.ndarray) -> jnp.ndarray:
    """Descriptor bits for a batch of keypoints.

    Args:
      image: (H, W) grayscale.
      coords: (N, 2) int32 (row, col) keypoint centers.
      pairs: (P, 2, 2) int32 sampling offsets.
    Returns:
      (N, P) uint8 in {0, 1}; bit i of keypoint n.
    """
    h, w = image.shape
    img = image.astype(jnp.float32)
    # (N, P, 2, 2): per keypoint, per pair, two sample points.
    p = coords[:, None, None, :] + pairs[None]
    lim = jnp.array([h, w], jnp.int32)
    valid = jnp.all((p >= 0) & (p < lim), axis=(2, 3))  # (N, P)
    pc = jnp.clip(p, 0, lim - 1)
    vals = img[pc[..., 0], pc[..., 1]]  # (N, P, 2)
    return (valid & (vals[..., 0] < vals[..., 1])).astype(jnp.uint8)


@jax.jit
def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(N, P) {0,1} → (N, P//32) uint32, LSB-first within each word."""
    n, p = bits.shape
    assert p % 32 == 0
    w = bits.astype(jnp.uint32).reshape(n, p // 32, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(w * weights, axis=-1, dtype=jnp.uint32)


@partial(jax.jit, static_argnames=())
def brief_descriptors(image, coords, pairs):
    """Convenience: returns (bits (N,P) uint8, packed (N,P//32) uint32)."""
    bits = brief_bits(image, coords, pairs)
    return bits, pack_bits(bits)
