"""Pinpoint the fused-frontend 40ms: dependency edge vs data content vs
coexistence of NMS and BRIEF in one program."""
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
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:46s} {np.median(times)*1e3:9.3f} ms  "
          f"(first {compile_s:.1f} s)", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (1080, 1920)), jnp.float32)
    config = FrontendConfig(detection_threshold=50.0, max_keypoints=2048,
                            reduction="nms", suppression_radius=4.0)
    pairs = make_pairs(config)
    rand_coords = jnp.asarray(
        np.stack([rng.integers(0, 1080, 2048), rng.integers(0, 1920, 2048)],
                 axis=-1), jnp.int32)

    def upto_nms(im):
        pts = extract_keypoints(fast_score_map(im, 50.0), 2048, order="score")
        return compact_points(nms_keypoints_parallel(pts, 4.0), 2048)

    # E1: NMS + BRIEF coexist, but BRIEF reads independent random coords.
    def coexist(im, rc):
        pts = upto_nms(im)
        return pts, brief_bits(im, rc, pairs)

    timeit("E1 coexist, brief(random coords)", jax.jit(coexist), frame,
           rand_coords)

    # E2: standalone BRIEF fed the *actual* NMS output data.
    nms_coords = jax.jit(lambda im: upto_nms(im).coords)(frame)
    nms_coords = jax.block_until_ready(nms_coords)
    timeit("E2 standalone brief(real NMS coords)", jax.jit(brief_bits),
           frame, nms_coords, pairs)

    # E3: dependency edge, minimal: gather only (no valid/compare logic).
    def dep_gather(im):
        pts = upto_nms(im)
        p = pts.coords[:, None, None, :] + pairs[None]
        pc = jnp.clip(p, 0, jnp.array([1079, 1919], jnp.int32))
        return im[pc[..., 0], pc[..., 1]]

    timeit("E3 nms -> raw gather", jax.jit(dep_gather), frame)

    # E4: dependency edge but tiny gather (64 points).
    def dep_gather_small(im):
        pts = upto_nms(im)
        p = pts.coords[:64, None, None, :] + pairs[None]
        pc = jnp.clip(p, 0, jnp.array([1079, 1919], jnp.int32))
        return im[pc[..., 0], pc[..., 1]]

    timeit("E4 nms -> raw gather (64 kps)", jax.jit(dep_gather_small), frame)


if __name__ == "__main__":
    main()
