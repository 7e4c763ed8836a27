"""Per-stage TPU timing of the frontend (development tool, not a benchmark).

Times each jitted stage of detect_and_describe separately on the real chip,
plus the fused whole and the batched variant, so optimization effort goes
where the milliseconds are.  Run under `timeout` (tunnel compiles are slow).
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
from photogrammetry_tpu.ops.nms import compact_points, nms_keypoints_parallel
from photogrammetry_tpu.ops.refine import refine_subpixel
from photogrammetry_tpu.sfm.frontend import (
    FrontendConfig, detect_and_describe, detect_and_describe_batch,
    make_pairs,
)


def timeit(name, fn, *args, iters=20):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    per = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {per*1e3:9.3f} ms   (first call {compile_s:.1f} s)",
          flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    config = FrontendConfig(detection_threshold=50.0, max_keypoints=2048,
                            reduction="nms", suppression_radius=4.0)
    pairs = make_pairs(config)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (1080, 1920)), jnp.float32)

    score = timeit("fast_score_map", jax.jit(fast_score_map), frame,
                   jnp.float32(50.0))
    extract = jax.jit(lambda s: extract_keypoints(s, capacity=2048,
                                                  order="score"))
    pts = timeit("extract_keypoints(2048)", extract, score)
    nms = jax.jit(lambda p: compact_points(
        nms_keypoints_parallel(p, 4.0), 2048))
    pts2 = timeit("nms_parallel+compact", nms, pts)
    timeit("brief_bits(2048)", jax.jit(brief_bits), frame, pts2.coords, pairs)
    timeit("refine_subpixel(2048)", jax.jit(refine_subpixel), frame,
           pts2.coords)

    fn = jax.jit(lambda im: detect_and_describe(im, pairs, config))
    timeit("detect_and_describe (fused)", fn, frame)

    for b in (4, 8):
        frames = jnp.asarray(rng.integers(0, 255, (b, 1080, 1920)),
                             jnp.float32)
        fb = jax.jit(lambda ims: detect_and_describe_batch(ims, pairs,
                                                           config))
        out = timeit(f"batched frontend B={b}", fb, frames, iters=10)
        del out


if __name__ == "__main__":
    main()
