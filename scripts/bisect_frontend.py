"""Bisect the fused detect_and_describe cost on the real chip.

Times fused variants with per-call block_until_ready (no dispatch
pipelining), so numbers are honest device-time per call.
"""
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
    anms_keypoints, compact_points, nms_keypoints_parallel,
)
from photogrammetry_tpu.ops.refine import refine_subpixel
from photogrammetry_tpu.sfm.frontend import (
    FrontendConfig, detect_and_describe, make_pairs,
)


def timeit(name, fn, *args, iters=10):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    med = np.median(times)
    print(f"{name:40s} {med*1e3:9.3f} ms   (first call {compile_s:.1f} s)",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (1080, 1920)), jnp.float32)
    config = FrontendConfig(detection_threshold=50.0, max_keypoints=2048,
                            reduction="nms", suppression_radius=4.0)
    pairs = make_pairs(config)

    timeit("score only", jax.jit(lambda im: fast_score_map(im, 50.0)), frame)
    timeit("score+extract",
           jax.jit(lambda im: extract_keypoints(
               fast_score_map(im, 50.0), 2048, order="score")), frame)

    def upto_nms(im):
        pts = extract_keypoints(fast_score_map(im, 50.0), 2048, order="score")
        return compact_points(nms_keypoints_parallel(pts, 4.0), 2048)

    timeit("score+extract+nms+compact", jax.jit(upto_nms), frame)

    def upto_anms(im):
        pts = extract_keypoints(fast_score_map(im, 50.0), 2048, order="score")
        return compact_points(anms_keypoints(pts, 512), 2048)

    timeit("score+extract+anms+compact", jax.jit(upto_anms), frame)

    def upto_brief(im):
        pts = upto_nms(im)
        return brief_bits(im, pts.coords, pairs)

    timeit("... +brief", jax.jit(upto_brief), frame)

    def upto_refine(im):
        pts = upto_nms(im)
        bits = brief_bits(im, pts.coords, pairs)
        return bits, refine_subpixel(im, pts.coords)

    timeit("... +brief+refine", jax.jit(upto_refine), frame)

    fn = jax.jit(lambda im: detect_and_describe(im, pairs, config))
    timeit("full detect_and_describe", fn, frame)

    cfg_ns = FrontendConfig(detection_threshold=50.0, max_keypoints=2048,
                            reduction="nms", suppression_radius=4.0,
                            subpixel=False)
    timeit("full, subpixel=False",
           jax.jit(lambda im: detect_and_describe(im, pairs, cfg_ns)), frame)


if __name__ == "__main__":
    main()
