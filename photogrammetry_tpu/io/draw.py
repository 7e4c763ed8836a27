"""Diagnostic overlay drawing, vectorized.

Reference analogues: square/line drawing in
ImageProcessing/PipelinesV3/ResultBuilders.cs:41-103 (Bresenham line,
keypoint squares) and the cv2 overlays in scripts/match_keypoints.py:26-28.
All functions are pure NumPy on host images (visualization is not a device
workload).
"""
from __future__ import annotations

import numpy as np


def _ensure_rgb(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return np.stack([img] * 3, axis=-1).astype(np.uint8)
    return img.astype(np.uint8).copy()


def draw_squares(img: np.ndarray, coords, half: int = 3,
                 color=(255, 0, 0)) -> np.ndarray:
    """Draw hollow squares centered at (row, col) coords."""
    out = _ensure_rgb(img)
    h, w, _ = out.shape
    color = np.array(color, np.uint8)
    for r, c in np.asarray(coords).reshape(-1, 2):
        r0, r1 = max(r - half, 0), min(r + half, h - 1)
        c0, c1 = max(c - half, 0), min(c + half, w - 1)
        out[r0, c0:c1 + 1] = color
        out[r1, c0:c1 + 1] = color
        out[r0:r1 + 1, c0] = color
        out[r0:r1 + 1, c1] = color
    return out


def draw_lines(img: np.ndarray, starts, ends, color=(0, 255, 0)) -> np.ndarray:
    """Draw line segments between (row, col) endpoint arrays."""
    out = _ensure_rgb(img)
    h, w, _ = out.shape
    color = np.array(color, np.uint8)
    starts = np.asarray(starts).reshape(-1, 2)
    ends = np.asarray(ends).reshape(-1, 2)
    for (r0, c0), (r1, c1) in zip(starts, ends):
        n = int(max(abs(r1 - r0), abs(c1 - c0), 1)) + 1
        rr = np.linspace(r0, r1, n).round().astype(int)
        cc = np.linspace(c0, c1, n).round().astype(int)
        ok = (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
        out[rr[ok], cc[ok]] = color
    return out


def join_right(img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
    """Horizontal concat (Matrix.JoinRight, LinearAlgebra/Matrix.cs) for
    side-by-side match visualizations."""
    a = _ensure_rgb(img1)
    b = _ensure_rgb(img2)
    h = max(a.shape[0], b.shape[0])

    def pad(x):
        if x.shape[0] < h:
            x = np.concatenate(
                [x, np.zeros((h - x.shape[0], x.shape[1], 3), np.uint8)])
        return x

    return np.concatenate([pad(a), pad(b)], axis=1)
