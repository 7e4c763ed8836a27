"""Pinhole camera model.

Geometry convention: image points are (x, y) = (col, row) homogeneous pixel
coordinates (the C# tree's Coordinate.X/Y, CameraPoseEstimation.cs:67-70);
detector output (row, col) is converted with ``keypoints_to_xy``.

The reference hard-codes K = [[1000,0,1500],[0,1000,2000],[0,0,1]]
(CameraPoseEstimation.cs:98-99); that value is kept as REFERENCE_K but every
API takes K explicitly.
"""
from __future__ import annotations

import jax.numpy as jnp

REFERENCE_K = ((1000.0, 0.0, 1500.0), (0.0, 1000.0, 2000.0), (0.0, 0.0, 1.0))


def intrinsic_matrix(fx, fy, cx, cy):
    return jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]],
                     jnp.float32)


def keypoints_to_xy(coords):
    """(N, 2) (row, col) detector coords → (N, 2) (x, y) pixel coords."""
    return jnp.stack([coords[..., 1], coords[..., 0]], axis=-1).astype(jnp.float32)


def to_homogeneous(pts):
    """(…, D) → (…, D+1) with a trailing 1."""
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def normalize_pixels(xy, k):
    """Pixel coords (…, 2) → normalized camera coords (…, 2) via K^-1."""
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]
    s = k[0, 1]
    y = (xy[..., 1] - cy) / fy
    x = (xy[..., 0] - cx - s * y) / fx
    return jnp.stack([x, y], axis=-1)


def project_points(points_w, r, t, k):
    """World points (…, 3) through [R | t] and K → pixel (…, 2), depth (…,).

    x_cam = R @ X + t;  pixel = K @ x_cam, dehomogenized.
    """
    xc = jnp.einsum("...ij,...j->...i", r, points_w) + t
    uvw = jnp.einsum("ij,...j->...i", k, xc)
    z = uvw[..., 2]
    xy = uvw[..., :2] / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)[..., None]
    return xy, z
