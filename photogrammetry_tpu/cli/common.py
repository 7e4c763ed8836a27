"""Shared CLI plumbing."""
from __future__ import annotations

import numpy as np


def load_gray(path: str) -> np.ndarray:
    """Load an image as float32 grayscale with cv2-exact weights when the
    file is color (matches the reference's int16 BGR2GRAY pipeline,
    image_db.py:36)."""
    import jax.numpy as jnp

    from photogrammetry_tpu.io.image import read_image
    from photogrammetry_tpu.ops.grayscale import bgr_to_gray_cv2

    rgb = read_image(path)
    if rgb.ndim == 2:
        return rgb.astype(np.float32)
    bgr = rgb[..., ::-1]
    return np.asarray(bgr_to_gray_cv2(jnp.asarray(bgr))).astype(np.float32)
