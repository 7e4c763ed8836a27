"""Confirm the slow-gather data property: regular lattice coords (bank
conflicts) vs jittered, and whether padding the image width fixes it."""
from __future__ import annotations

import os
import time

import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from photogrammetry_tpu.ops.brief import brief_bits
from photogrammetry_tpu.ops.fast import extract_keypoints, fast_score_map
from photogrammetry_tpu.ops.nms import compact_points, nms_keypoints_parallel
from photogrammetry_tpu.sfm.frontend import FrontendConfig, make_pairs


def timeit(name, fn, *args, iters=10):
    jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:44s} {np.median(times)*1e3:9.3f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (1080, 1920)), jnp.float32)
    config = FrontendConfig(detection_threshold=50.0, max_keypoints=2048,
                            reduction="nms", suppression_radius=4.0)
    pairs = make_pairs(config)
    fn = jax.jit(brief_bits)

    # perfect 4px lattice in a band (mimics NMS output on the noise frame)
    rr, cc = np.meshgrid(np.arange(3, 338, 4), np.arange(4, 1917, 4),
                         indexing="ij")
    lat = np.stack([rr.ravel(), cc.ravel()], -1)[:2048].astype(np.int32)
    timeit("4px lattice", fn, frame, jnp.asarray(lat), pairs)

    jit1 = lat + rng.integers(-1, 2, lat.shape).astype(np.int32)
    timeit("4px lattice + jitter ±1", fn, frame, jnp.asarray(jit1), pairs)

    # row-only lattice (fixed col), col-only lattice (fixed row)
    rows = lat.copy(); rows[:, 1] = rng.integers(0, 1920, len(lat))
    timeit("rows lattice, random cols", fn, frame, jnp.asarray(rows), pairs)
    cols = lat.copy(); cols[:, 0] = rng.integers(0, 1080, len(lat))
    timeit("random rows, cols lattice", fn, frame, jnp.asarray(cols), pairs)

    # real NMS coords for reference
    def upto_nms(im):
        pts = extract_keypoints(fast_score_map(im, 50.0), 2048, order="score")
        return compact_points(nms_keypoints_parallel(pts, 4.0), 2048)

    pts = jax.block_until_ready(jax.jit(upto_nms)(frame))
    nms_coords = jnp.asarray(np.asarray(pts.coords))
    timeit("real NMS coords (ref)", fn, frame, nms_coords, pairs)

    # padded-width image (breaks row-stride alignment) — new executable
    for wpad in (1927, 1984, 2048):
        fpad = jnp.pad(frame, ((0, 0), (0, wpad - 1920)))
        timeit(f"real NMS coords, W={wpad}", fn, fpad, nms_coords, pairs)


if __name__ == "__main__":
    main()
