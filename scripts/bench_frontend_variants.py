"""Frontend fps on TPU: noise vs the committed real 1080p frame, and the
capacity sweep needed to explain the BENCH_r02 (8811 fps) vs commit 2c103f6
(12195 fps) gap.  One process => numbers comparable (docs/tpu_notes.md §4).

Run: timeout 1800 python scripts/bench_frontend_variants.py
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import cv2
    import jax.numpy as jnp

    from photogrammetry_tpu.ops.grayscale import bgr_to_gray_cv2
    from photogrammetry_tpu.sfm.frontend import (
        FrontendConfig, detect_and_describe_split, make_pairs,
    )

    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.integers(0, 255, (1080, 1920)), jnp.float32)
    real = jnp.asarray(np.asarray(bgr_to_gray_cv2(cv2.imread(
        "/root/reference/data/feature_detection_test/"
        "straight_edge_1920x1080.jpg"))), jnp.float32)

    def bench(frame, cap, iters=200):
        config = FrontendConfig(detection_threshold=50.0, max_keypoints=cap,
                                reduction="nms", suppression_radius=4.0)
        pairs = make_pairs(config)
        fn = lambda im: detect_and_describe_split(im, pairs, config)
        out = fn(frame)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(frame)
        jax.block_until_ready(out)
        return iters / (time.perf_counter() - t0)

    for cap in (512, 1024, 2048):
        for name, frame in (("noise", noise), ("real", real)):
            fps = bench(frame, cap)
            print(json.dumps({"input": name, "capacity": cap,
                              "fps": round(fps, 1)}), flush=True)


if __name__ == "__main__":
    main()
