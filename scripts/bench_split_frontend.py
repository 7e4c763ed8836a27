"""Split frontend (detect | describe as separate dispatches) in a fresh
process — the production candidate."""
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
    compact_points, nms_keypoints_static,
)
from photogrammetry_tpu.ops.refine import refine_subpixel
from photogrammetry_tpu.sfm.frontend import FrontendConfig, make_pairs


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (1080, 1920)), jnp.float32)
    config = FrontendConfig(detection_threshold=50.0, max_keypoints=2048,
                            reduction="nms", suppression_radius=4.0)
    pairs = make_pairs(config)

    detect = jax.jit(lambda im: compact_points(nms_keypoints_static(
        extract_keypoints(fast_score_map(im, 50.0), 2048, order="score"),
        4.0), 2048))

    def tail(im, coords):
        bits = brief_bits(im, coords, pairs)
        rc = refine_subpixel(im, coords)
        return bits, rc

    describe = jax.jit(tail)

    def frontend(im):
        pts = detect(im)
        bits, rc = describe(im, pts.coords)
        return pts, bits, rc

    out = jax.block_until_ready(frontend(frame))
    print("compiled", flush=True)
    # blocked per call
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(frontend(frame))
        times.append(time.perf_counter() - t0)
    print(f"split frontend, per-call blocked: "
          f"{np.median(times)*1e3:.3f} ms", flush=True)
    # pipelined (bench.py style)
    t0 = time.perf_counter()
    for _ in range(50):
        out = frontend(frame)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 50
    print(f"split frontend, pipelined: {dt*1e3:.3f} ms "
          f"({1.0/dt:.1f} frames/s)", flush=True)


if __name__ == "__main__":
    main()
