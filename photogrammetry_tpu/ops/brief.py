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


@partial(jax.jit, static_argnames=("radius",))
def keypoint_orientations(image: jnp.ndarray, coords: jnp.ndarray,
                          radius: int = 15) -> jnp.ndarray:
    """(N,) patch orientations by the intensity-centroid method (ORB's
    orientation operator): theta = atan2(m01, m10) over a (2r+1)^2 patch.

    TPU-native: the patch moments are separable box filters of img,
    img*row, img*col evaluated densely (the same dense-then-tiny-gather
    trick as ops.refine.refine_subpixel_dense — per-keypoint windowed
    gathers would sit on the chip's ~80 M elem/s element-gather wall),
    then 3 values are gathered per keypoint."""
    from photogrammetry_tpu.ops.refine import _box_filter

    h, w = image.shape
    img = image.astype(jnp.float32)
    rr = jnp.arange(h, dtype=jnp.float32)[:, None]
    cc = jnp.arange(w, dtype=jnp.float32)[None, :]
    m00 = _box_filter(img, radius)
    m_r = _box_filter(img * rr, radius)
    m_c = _box_filter(img * cc, radius)
    r0 = jnp.clip(coords[:, 0], 0, h - 1)
    c0 = jnp.clip(coords[:, 1], 0, w - 1)
    # centroid offsets relative to the keypoint
    denom = jnp.maximum(m00[r0, c0], 1e-6)
    dr = m_r[r0, c0] / denom - r0.astype(jnp.float32)
    dc = m_c[r0, c0] / denom - c0.astype(jnp.float32)
    return jnp.arctan2(dr, dc)


@jax.jit
def brief_bits_oriented(image: jnp.ndarray, coords: jnp.ndarray,
                        pairs: jnp.ndarray,
                        thetas: jnp.ndarray) -> jnp.ndarray:
    """Steered BRIEF (ORB-style): each keypoint's pair offsets are rotated
    by its patch orientation before sampling, making the descriptor
    rotation-invariant.  Same gather count as brief_bits (the rotation
    only changes the index arithmetic), so the same performance envelope;
    OOB pairs -> bit 0 as in the reference semantics.

    Not reference-parity (the reference's BRIEF is unoriented) — opt-in
    via FrontendConfig.oriented_brief."""
    h, w = image.shape
    img = image.astype(jnp.float32)
    # Rotate the sampling pattern INTO the patch's local frame: offsets
    # are expressed relative to the centroid direction, i.e. rotated by
    # -theta ([row', col'] = [[c, s], [-s, c]] @ [row, col]).  Verified
    # empirically (30-deg warped lego texture, corresponding points):
    # bit agreement 0.80 with -theta vs 0.57 with +theta and 0.67
    # unoriented.
    c, s = jnp.cos(thetas), jnp.sin(thetas)           # (N,)
    pr = pairs[None, :, :, 0].astype(jnp.float32)     # (1, P, 2)
    pc = pairs[None, :, :, 1].astype(jnp.float32)
    rr = c[:, None, None] * pr + s[:, None, None] * pc
    rc = -s[:, None, None] * pr + c[:, None, None] * pc
    p = jnp.stack([rr, rc], axis=-1)                  # (N, P, 2, 2) float
    p = jnp.rint(p).astype(jnp.int32) + coords[:, None, None, :]
    lim = jnp.array([h, w], jnp.int32)
    valid = jnp.all((p >= 0) & (p < lim), axis=(2, 3))
    pcl = jnp.clip(p, 0, lim - 1)
    vals = img[pcl[..., 0], pcl[..., 1]]
    return (valid & (vals[..., 0] < vals[..., 1])).astype(jnp.uint8)
