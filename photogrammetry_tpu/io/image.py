"""Image file I/O.

Reference analogues: LocalImageReader (ImageSharp decode to Rgba64,
LocalImageReader.cs:18-69) and cv2.imread/imwrite in the Python scripts.
Uses Pillow; returns NumPy arrays (host side — device placement is the
pipeline's job).
"""
from __future__ import annotations

import numpy as np


def read_image(path: str, grayscale: bool = False) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if grayscale:
        img = img.convert("L")
        return np.asarray(img, np.uint8)
    return np.asarray(img.convert("RGB"), np.uint8)


def write_image(path: str, array: np.ndarray) -> None:
    from PIL import Image

    arr = np.asarray(array)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
