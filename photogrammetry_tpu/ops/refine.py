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
