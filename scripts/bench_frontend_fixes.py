"""Candidate fixes for the slow fused frontend (while_loop + gather in one
program = ~40 ms): static-round NMS, loop-free ANMS, split programs."""
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
from jax import lax

from photogrammetry_tpu.ops.brief import brief_bits
from photogrammetry_tpu.ops.fast import extract_keypoints, fast_score_map
from photogrammetry_tpu.ops.nms import (
    anms_keypoints, compact_points, nms_keypoints_parallel,
)
from photogrammetry_tpu.ops.refine import refine_subpixel
from photogrammetry_tpu.sfm.frontend import FrontendConfig, make_pairs
from photogrammetry_tpu.utils.padding import PaddedPoints


def nms_static_rounds(points, radius, rounds=16):
    """Parallel fixed-point NMS with a static trip count (fori_loop)."""
    coords = points.coords.astype(jnp.float32)
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    k = points.coords.shape[0]
    d2 = jnp.sum((coords[:, None, :] - coords[None, :, :]) ** 2, axis=-1)
    near = d2 <= r2
    idx = jnp.arange(k)
    stronger = (points.score[None, :] > points.score[:, None]) | \
        ((points.score[None, :] == points.score[:, None])
         & (idx[None, :] < idx[:, None]))
    dominates = near & stronger

    def body(_, state):
        active, kept = state
        blocked = jnp.any(dominates & active[None, :], axis=1)
        new_kept = active & ~blocked
        suppressed = jnp.any(near & new_kept[None, :], axis=1)
        return active & ~suppressed, kept | new_kept

    active, kept = lax.fori_loop(0, rounds, body,
                                 (points.mask, jnp.zeros((k,), bool)))
    return PaddedPoints(points.coords, points.score, kept,
                        jnp.sum(kept).astype(jnp.int32))


def timeit(name, fn, *args, iters=10):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    c = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:52s} {np.median(times)*1e3:9.3f} ms  (first {c:.0f}s)",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (1080, 1920)), jnp.float32)
    config = FrontendConfig(detection_threshold=50.0, max_keypoints=2048,
                            reduction="nms", suppression_radius=4.0)
    pairs = make_pairs(config)

    rand = jnp.asarray(np.stack([rng.integers(0, 1080, 2048),
                                 rng.integers(0, 1920, 2048)],
                                axis=-1).astype(np.int32))
    timeit("0 baseline brief(rand) at process start", jax.jit(brief_bits),
           frame, rand, pairs)

    def tail(im, pts):
        bits = brief_bits(im, pts.coords, pairs)
        rc = refine_subpixel(im, pts.coords)
        return pts, bits, rc

    # A: fused, static-round NMS
    def fused_static(im):
        pts = extract_keypoints(fast_score_map(im, 50.0), 2048, order="score")
        pts = compact_points(nms_static_rounds(pts, 4.0), 2048)
        return tail(im, pts)

    timeit("A fused frontend, static-round NMS", jax.jit(fused_static),
           frame)

    # B: fused, ANMS (loop-free)
    def fused_anms(im):
        pts = extract_keypoints(fast_score_map(im, 50.0), 2048, order="score")
        pts = compact_points(anms_keypoints(pts, 512), 2048)
        return tail(im, pts)

    timeit("B fused frontend, ANMS", jax.jit(fused_anms), frame)

    # C: split programs: detect+NMS | describe
    detect = jax.jit(lambda im: compact_points(nms_keypoints_parallel(
        extract_keypoints(fast_score_map(im, 50.0), 2048, order="score"),
        4.0), 2048))
    describe = jax.jit(tail)

    def split(im):
        return describe(im, detect(im))

    timeit("C split detect | describe (while-loop NMS)", split, frame)


if __name__ == "__main__":
    main()
