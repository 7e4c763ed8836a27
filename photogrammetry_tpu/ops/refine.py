"""Subpixel keypoint refinement (batched gradient-weighted centroid solve).

The reference keeps integer pixel keypoints end-to-end; at small two-view
baselines the +-0.5 px quantization dominates the translation-direction
error, so the frontend refines corners to subpixel before geometry.

Method: the classic cornerSubPix normal-equation — for window pixels x_i with
image gradient g_i, the corner q satisfies g_i^T (x_i - q) = 0 for ideal
corners/blob edges, giving  q = (sum g g^T)^-1 (sum g g^T x).  Evaluated for
all keypoints at once with static window gathers; falls back to the original
coordinate when the 2x2 system is ill-conditioned (flat window).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("window", "iterations"))
def refine_subpixel(image: jnp.ndarray, coords: jnp.ndarray,
                    window: int = 3, iterations: int = 2) -> jnp.ndarray:
    """(H, W) image + (N, 2) int (row, col) → (N, 2) float32 refined (row, col).

    window is the half-size (full window = 2*window+1); refined positions are
    clamped to within 1.5 px of the detection (guards against runaway on
    degenerate windows).
    """
    h, w = image.shape
    img = image.astype(jnp.float32)
    # central-difference gradients, zero at the border
    gy = jnp.zeros_like(img).at[1:-1, :].set((img[2:, :] - img[:-2, :]) / 2.0)
    gx = jnp.zeros_like(img).at[:, 1:-1].set((img[:, 2:] - img[:, :-2]) / 2.0)

    offs = jnp.arange(-window, window + 1)
    orr, occ = jnp.meshgrid(offs, offs, indexing="ij")
    orr = orr.reshape(-1).astype(jnp.float32)
    occ = occ.reshape(-1).astype(jnp.float32)

    def step(q):
        base_r = jnp.round(q[:, 0]).astype(jnp.int32)
        base_c = jnp.round(q[:, 1]).astype(jnp.int32)
        rr = jnp.clip(base_r[:, None] + orr.astype(jnp.int32), 0, h - 1)
        cc = jnp.clip(base_c[:, None] + occ.astype(jnp.int32), 0, w - 1)
        gyy = gy[rr, cc]
        gxx = gx[rr, cc]
        # per-pixel structure tensor entries
        a = jnp.sum(gyy * gyy, axis=1)
        b = jnp.sum(gyy * gxx, axis=1)
        c = jnp.sum(gxx * gxx, axis=1)
        xr = rr.astype(jnp.float32)
        xc = cc.astype(jnp.float32)
        br = jnp.sum(gyy * gyy * xr + gyy * gxx * xc, axis=1)
        bc = jnp.sum(gxx * gyy * xr + gxx * gxx * xc, axis=1)
        det = a * c - b * b
        ok = jnp.abs(det) > 1e-6
        det_safe = jnp.where(ok, det, 1.0)
        qr = (c * br - b * bc) / det_safe
        qc = (a * bc - b * br) / det_safe
        refined = jnp.stack([qr, qc], axis=-1)
        return jnp.where(ok[:, None], refined, q)

    q = coords.astype(jnp.float32)
    for _ in range(iterations):
        q = step(q)
    # clamp displacement
    q0 = coords.astype(jnp.float32)
    return q0 + jnp.clip(q - q0, -1.5, 1.5)


def _box_filter(x: jnp.ndarray, half: int) -> jnp.ndarray:
    """(H, W) -> same-shape (2*half+1)-box sum, zero-padded, separable.

    Direct shifted adds, NOT cumsum: the xr/xc-weighted maps reach ~1e10
    partial sums under cumsum, past f32's 2^24 exact range (measured 3 px
    corner errors); k shifted adds keep each sum local."""
    k = 2 * half + 1
    p = jnp.pad(x, ((half, half), (0, 0)))
    x = sum(p[i:i + x.shape[0], :] for i in range(k))
    p = jnp.pad(x, ((0, 0), (half, half)))
    return sum(p[:, i:i + x.shape[1]] for i in range(k))


@partial(jax.jit, static_argnames=("window", "iterations"))
def refine_subpixel_dense(image: jnp.ndarray, coords: jnp.ndarray,
                          window: int = 3,
                          iterations: int = 2) -> jnp.ndarray:
    """refine_subpixel reformulated for the TPU's gather economics.

    The per-keypoint windowed sums are box filters of dense gradient
    products, so the six normal-equation accumulators are computed for
    EVERY pixel with separable cumsum box filters (bandwidth-bound dense
    work) and each iteration gathers only 6 values per keypoint — 25k
    gathered elements total instead of 400k.  The chip's serial
    element-gather rate (~80 M elem/s, docs/tpu_notes.md §0) made the
    gather formulation cost 10.2 ms/frame; this one is ~3 ms.

    Numerics: identical windowed sums away from the border (exact same
    normal equations; summation order differs so results agree to f32
    rounding).  At the border the box filter zero-pads where the gather
    formulation clamped coordinates; detection already excludes a 3 px
    border, and the 1.5 px displacement clamp bounds any residual
    difference.
    """
    h, w = image.shape
    img = image.astype(jnp.float32)
    gy = jnp.zeros_like(img).at[1:-1, :].set((img[2:, :] - img[:-2, :]) / 2.0)
    gx = jnp.zeros_like(img).at[:, 1:-1].set((img[:, 2:] - img[:, :-2]) / 2.0)
    rr = jnp.arange(h, dtype=jnp.float32)[:, None]
    cc = jnp.arange(w, dtype=jnp.float32)[None, :]
    gyy = gy * gy
    gyx = gy * gx
    gxx = gx * gx
    maps = jnp.stack([
        _box_filter(gyy, window),
        _box_filter(gyx, window),
        _box_filter(gxx, window),
        _box_filter(gyy * rr + gyx * cc, window),
        _box_filter(gyx * rr + gxx * cc, window),
    ])  # (5, H, W)

    def step(q):
        br_ = jnp.clip(jnp.round(q[:, 0]).astype(jnp.int32), 0, h - 1)
        bc_ = jnp.clip(jnp.round(q[:, 1]).astype(jnp.int32), 0, w - 1)
        vals = maps[:, br_, bc_]               # (5, N) — one small gather
        a, b, c, br, bc = vals
        det = a * c - b * b
        ok = jnp.abs(det) > 1e-6
        det_safe = jnp.where(ok, det, 1.0)
        qr = (c * br - b * bc) / det_safe
        qc = (a * bc - b * br) / det_safe
        refined = jnp.stack([qr, qc], axis=-1)
        return jnp.where(ok[:, None], refined, q)

    q = coords.astype(jnp.float32)
    for _ in range(iterations):
        q = step(q)
    q0 = coords.astype(jnp.float32)
    return q0 + jnp.clip(q - q0, -1.5, 1.5)
