"""FAST-16 corner detection as a whole-image TPU stencil.

The reference implements FAST as a per-pixel Python/C# loop over a radius-3
Bresenham ring (python_src/photogrammetry/image_processing/keypoint_detection.py:93-139,
dotnet_src/ImageProcessing/KeypointDetection.cs:65-133): a pixel is a corner
iff >= 12 *consecutive* ring pixels (with wraparound) lie outside the band
(center-threshold, center+threshold); the length of the longest such run is
the FastScore (KeypointDetection.cs:88-113).

TPU-native design: instead of a scalar loop, the whole test is evaluated for
every pixel at once as 16 shifted copies of the image (pure VPU work, fused
by XLA).  The "quick" 4-compass-point pre-test of the reference
(keypoint_detection.py:72-91) is a CPU-only pruning optimization: any pixel
with a 12-long consecutive outside-run has at most 4 inside pixels spanning
at most one compass point, so the quick test never rejects a true corner —
it is intentionally absent here.

Dynamic keypoint counts are converted to static shapes by
``extract_keypoints`` (fixed capacity + mask), the framework-wide convention.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from photogrammetry_tpu.utils.padding import PaddedPoints

# Radius-3 Bresenham ring, positions 1..16 as (row, col) offsets relative to
# the center pixel, in ring order (keypoint_detection.py:12-29).
RING_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

BORDER = 3  # ring radius; detection excludes a 3px border (keypoint_detection.py:125,148)
MIN_CONSECUTIVE = 12


def _ring_outside_mask(image: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """(16, H, W) bool: ring pixel k strictly outside (c-thr, c+thr).

    The reference's in-band test is strict on both sides
    (keypoint_detection.py:61-63), so "outside" is <= lower or >= upper.
    """
    h, w = image.shape
    img = image.astype(jnp.float32)
    padded = jnp.pad(img, BORDER)
    shifted = jnp.stack(
        [padded[BORDER + dr:BORDER + dr + h, BORDER + dc:BORDER + dc + w]
         for dr, dc in RING_OFFSETS]
    )
    lower = img - threshold
    upper = img + threshold
    return (shifted <= lower) | (shifted >= upper)


@partial(jax.jit, static_argnames=())
def fast_score_map(image: jnp.ndarray, threshold: jnp.ndarray) -> jnp.ndarray:
    """Dense FAST score map.

    Returns (H, W) int32: 0 for non-corners, else the longest circular run of
    out-of-band ring pixels (12..16), matching the C# FastScore semantics
    (KeypointDetection.cs:88-113).
    """
    h, w = image.shape
    outside = _ring_outside_mask(image, threshold)  # (16, H, W) bool
    m = jnp.concatenate([outside, outside], axis=0).astype(jnp.int32)  # (32,H,W)

    # runs[k] = length of the True-run starting at ring position k (doubled
    # ring handles wraparound; a fully-outside ring saturates at 16).
    def body(carry, mk):
        run = mk * (1 + carry)
        return run, run

    _, runs = lax.scan(body, jnp.zeros((h, w), jnp.int32), m, reverse=True)
    score = jnp.minimum(jnp.max(runs[:16], axis=0), 16)
    score = jnp.where(score >= MIN_CONSECUTIVE, score, 0)

    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    interior = ((rows >= BORDER) & (rows < h - BORDER)
                & (cols >= BORDER) & (cols < w - BORDER))
    return jnp.where(interior, score, 0)


@partial(jax.jit, static_argnames=("capacity", "order"))
def extract_keypoints(score_map: jnp.ndarray, capacity: int,
                      order: str = "raster") -> PaddedPoints:
    """Dense score map → fixed-capacity keypoint list.

    order='raster' reproduces the reference's row-major detection order
    (keypoint_detection.py:125,161); order='score' sorts by descending score
    with raster-order tie-breaking (the stable sort the C# NMS relies on,
    RedundantKeypointEliminator.cs:21).
    """
    h, w = score_map.shape
    flat = score_map.reshape(-1)
    total = jnp.sum(flat > 0).astype(jnp.int32)

    if order == "raster":
        (idx,) = jnp.nonzero(flat > 0, size=capacity, fill_value=0)
        valid = jnp.arange(capacity) < total
    elif order == "score":
        # key = raster - score*(h*w): ascending sort gives score-desc,
        # raster-asc ties; scores <= 16 and h*w <= ~4M keep it inside int32.
        # Keys are unique (the raster term), so top_k of the negated key is
        # exactly argsort(key)[:capacity] at a fraction of a full-sort cost.
        key = jnp.where(flat > 0,
                        jnp.arange(h * w, dtype=jnp.int32)
                        - flat.astype(jnp.int32) * (h * w),
                        jnp.iinfo(jnp.int32).max)
        _, idx = lax.top_k(-key, capacity)
        valid = jnp.arange(capacity) < total
    else:
        raise ValueError(f"unknown order {order!r}")

    coords = jnp.stack([idx // w, idx % w], axis=-1).astype(jnp.int32)
    score = jnp.where(valid, flat[idx].astype(jnp.float32), 0.0)
    count = jnp.minimum(total, capacity)
    return PaddedPoints(coords=coords, score=score, mask=valid, count=count)
