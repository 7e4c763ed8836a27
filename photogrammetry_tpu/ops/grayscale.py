"""Color → grayscale conversion.

Two reference-compatible conversions exist upstream:
  * the Python tree converts with OpenCV BGR2GRAY then casts to int16
    (reference: python_src/photogrammetry/storage/image_db.py:36);
  * the C# tree averages the three channels
    (reference: dotnet_src/Images.Abstractions/Pixels/Grayscale.cs:8-23).

``bgr_to_gray_cv2`` reproduces OpenCV's fixed-point arithmetic bit-exactly so
keypoint-count oracles from the reference hold (e.g. 128 keypoints on
15pt_star.png, keypoint_detection.py:158).
"""
from __future__ import annotations

import jax.numpy as jnp

# OpenCV CV_DESCALE fixed-point BGR2GRAY coefficients (14-bit).
_R, _G, _B = 4899, 9617, 1868
_SHIFT = 14


def bgr_to_gray_cv2(bgr: jnp.ndarray) -> jnp.ndarray:
    """uint8 BGR (H, W, 3) → int32 grayscale (H, W), bit-exact with OpenCV.

    gray = (R*4899 + G*9617 + B*1868 + 2^13) >> 14
    """
    px = bgr.astype(jnp.int32)
    b, g, r = px[..., 0], px[..., 1], px[..., 2]
    return (r * _R + g * _G + b * _B + (1 << (_SHIFT - 1))) >> _SHIFT


def rgb_to_gray_mean(rgb: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) float → (H, W) float channel mean (C# Grayscale semantics)."""
    return jnp.mean(rgb.astype(jnp.float32), axis=-1)
