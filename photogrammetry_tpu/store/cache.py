"""On-disk caches for expensive intermediates.

Reference analogues: distortion matrices cached as .npy keyed by dims +
coefficients (warping.py:9-25,179-181), and detected keypoints pickled with
a JSON index keyed by (image path, clustered?, threshold)
(python_src/photogrammetry/storage/keypoint_cache.py:9-71).

Unlike the reference, descriptor caching is sound here because BRIEF pairs
are a pure function of a seed (the reference's unseeded pairs made cached
descriptors incomparable across runs — its own "critical importance" TODO,
keypoint_cache.py:22); the seed is part of the cache key.
"""
from __future__ import annotations

import hashlib
import json
import os

import numpy as np


class DistortionMapCache:
    """dims+coefficients → (H, W, 2) float32 map, stored as .npz."""

    def __init__(self, cache_dir: str = "./data/distortion_maps"):
        self.cache_dir = cache_dir

    def _path(self, height: int, width: int, coeffs) -> str:
        coeff_str = "_".join(repr(float(c)) for c in coeffs)
        name = f"dim_{width}x{height}_coeff_{coeff_str}.npz"
        return os.path.join(self.cache_dir, name)

    def get_or_generate(self, height: int, width: int, coeffs,
                        refresh: bool = False) -> np.ndarray:
        path = self._path(height, width, coeffs)
        if not refresh and os.path.isfile(path):
            return np.load(path)["map"]
        from photogrammetry_tpu.ops.dewarp import generate_distortion_map

        dist_map = np.asarray(generate_distortion_map(height, width,
                                                      np.asarray(coeffs,
                                                                 np.float32)))
        os.makedirs(self.cache_dir, exist_ok=True)
        np.savez_compressed(path, map=dist_map)
        return dist_map


class KeypointCache:
    """(image path, threshold, reduction, pair seed) → keypoints+descriptors.

    JSON index + one .npz per entry, keyed by content hash of the image file
    plus the detection configuration (stronger than the reference's
    path-keyed index, which silently staled when an image was edited).
    """

    def __init__(self, cache_dir: str = "./data/keypoint_cache"):
        self.cache_dir = cache_dir
        self.index_path = os.path.join(cache_dir, "index.json")

    def _load_index(self) -> dict:
        if os.path.isfile(self.index_path):
            with open(self.index_path) as fh:
                return json.load(fh)
        return {}

    def _key(self, image_path: str, **config) -> str:
        h = hashlib.sha256()
        with open(image_path, "rb") as fh:
            h.update(fh.read())
        h.update(json.dumps(config, sort_keys=True).encode())
        return h.hexdigest()[:32]

    def get(self, image_path: str, **config):
        key = self._key(image_path, **config)
        entry = self._load_index().get(key)
        if entry is None:
            return None
        data = np.load(os.path.join(self.cache_dir, entry["file"]))
        return {k: data[k] for k in data.files}

    def put(self, image_path: str, arrays: dict, **config) -> None:
        key = self._key(image_path, **config)
        os.makedirs(self.cache_dir, exist_ok=True)
        fname = f"{key}.npz"
        np.savez_compressed(os.path.join(self.cache_dir, fname),
                            **{k: np.asarray(v) for k, v in arrays.items()})
        index = self._load_index()
        index[key] = {"file": fname, "image": os.path.basename(image_path),
                      "config": config}
        with open(self.index_path, "w") as fh:
            json.dump(index, fh, indent=1, sort_keys=True)
