"""Isolate each frontend stage program in one fresh process."""
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
from photogrammetry_tpu.ops.nms import (
    compact_points, nms_keypoints_parallel, nms_keypoints_static,
)
from photogrammetry_tpu.ops.refine import refine_subpixel
from photogrammetry_tpu.sfm.frontend import FrontendConfig, make_pairs


def timeit(name, fn, *args, iters=10):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    c = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:48s} {np.median(times)*1e3:9.3f} ms (first {c:.0f}s)",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (1080, 1920)), jnp.float32)
    config = FrontendConfig(detection_threshold=50.0, max_keypoints=2048,
                            reduction="nms", suppression_radius=4.0)
    pairs = make_pairs(config)

    def det(nms):
        return jax.jit(lambda im: compact_points(nms(extract_keypoints(
            fast_score_map(im, 50.0), 2048, order="score")), 2048))

    d_while = det(lambda p: nms_keypoints_parallel(p, 4.0))
    d_s16 = det(lambda p: nms_keypoints_static(p, 4.0, rounds=16))
    d_s64 = det(lambda p: nms_keypoints_static(p, 4.0, rounds=64))

    timeit("detect (while NMS)", d_while, frame)
    timeit("detect (static-16 NMS)", d_s16, frame)
    timeit("detect (static-64 NMS)", d_s64, frame)

    pts = jax.block_until_ready(d_while(frame))

    def tail(im, coords):
        return brief_bits(im, coords, pairs), refine_subpixel(im, coords)

    describe = jax.jit(tail)
    timeit("describe (brief+refine)", describe, frame, pts.coords)

    def split(im):
        p = d_while(im)
        return describe(im, p.coords)

    timeit("split: while-detect | describe", split, frame)


if __name__ == "__main__":
    main()
