"""Three-way split: detect | brief | refine — one large gather per program.
Plus batched describe to discriminate device-time vs dispatch overhead."""
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
from photogrammetry_tpu.ops.nms import compact_points, nms_keypoints_static
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

    detect = jax.jit(lambda im: compact_points(nms_keypoints_static(
        extract_keypoints(fast_score_map(im, 50.0), 2048, order="score"),
        4.0), 2048))
    brief = jax.jit(brief_bits)
    refine = jax.jit(refine_subpixel)

    def frontend3(im):
        pts = detect(im)
        bits = brief(im, pts.coords, pairs)
        rc = refine(im, pts.coords)
        return pts, bits, rc

    timeit("detect alone", detect, frame)
    pts = jax.block_until_ready(detect(frame))
    timeit("brief alone (device coords)", brief, frame, pts.coords, pairs)
    timeit("refine alone (device coords)", refine, frame, pts.coords)
    timeit("3-way split frontend, blocked", frontend3, frame)

    # pipelined throughput
    t0 = time.perf_counter()
    out = None
    for _ in range(50):
        out = frontend3(frame)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 50
    print(f"3-way split pipelined: {dt*1e3:.3f} ms ({1.0/dt:.1f} f/s)",
          flush=True)


if __name__ == "__main__":
    main()
