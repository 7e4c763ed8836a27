"""Test whether an optimization_barrier between NMS and BRIEF removes the
fused-program gather pathology (40 ms vs 0.06 ms standalone)."""
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
from photogrammetry_tpu.sfm.frontend import FrontendConfig, make_pairs


def timeit(name, fn, *args, iters=10):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:44s} {np.median(times)*1e3:9.3f} ms  "
          f"(first {compile_s:.1f} s)", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (1080, 1920)), jnp.float32)
    config = FrontendConfig(detection_threshold=50.0, max_keypoints=2048,
                            reduction="nms", suppression_radius=4.0)
    pairs = make_pairs(config)

    def upto_nms(im):
        pts = extract_keypoints(fast_score_map(im, 50.0), 2048, order="score")
        return compact_points(nms_keypoints_parallel(pts, 4.0), 2048)

    def fused_plain(im):
        pts = upto_nms(im)
        return brief_bits(im, pts.coords, pairs)

    def fused_barrier(im):
        pts = upto_nms(im)
        coords = jax.lax.optimization_barrier(pts.coords)
        return brief_bits(im, coords, pairs)

    def fused_barrier_both(im):
        pts = upto_nms(im)
        coords, im2 = jax.lax.optimization_barrier((pts.coords, im))
        return brief_bits(im2, coords, pairs)

    def full_barrier(im):
        pts = upto_nms(im)
        coords, im2 = jax.lax.optimization_barrier((pts.coords, im))
        bits = brief_bits(im2, coords, pairs)
        return bits, refine_subpixel(im2, coords)

    timeit("fused nms+brief (plain, known 40ms)", jax.jit(fused_plain),
           frame)
    timeit("fused nms+brief barrier(coords)", jax.jit(fused_barrier), frame)
    timeit("fused nms+brief barrier(coords, image)",
           jax.jit(fused_barrier_both), frame)
    timeit("full w/ barrier + refine", jax.jit(full_barrier), frame)


if __name__ == "__main__":
    main()
