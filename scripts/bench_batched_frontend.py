"""Batched vs single-frame frontend on the chip, round 5: the batched
path now uses the grid-batched Pallas FAST stencil (frames in the kernel
grid) instead of pinning the XLA stencil under vmap."""
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


def main():
    from photogrammetry_tpu.sfm.frontend import (
        FrontendConfig, detect_and_describe_batch_split,
        detect_and_describe_split, make_pairs,
    )

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (16, 1080, 1920)),
                         jnp.float32)
    _ = float(frames[0, 0, 0])

    for cap in (512, 2048):
        cfg = FrontendConfig(detection_threshold=50.0, max_keypoints=cap,
                             reduction="nms", suppression_radius=4.0)
        pairs = make_pairs(cfg)

        def single(f):
            return detect_and_describe_split(f, pairs, cfg)

        def batched(fs):
            return detect_and_describe_batch_split(fs, pairs, cfg)

        out = single(frames[0])
        _ = float(out.xy[0, 0])
        t0 = time.perf_counter()
        for i in range(16):
            out = single(frames[i % 16])
        _ = float(out.xy[0, 0])
        t_single = (time.perf_counter() - t0) / 16

        ob = batched(frames)
        _ = float(ob.xy[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(3):
            ob = batched(frames)
        _ = float(ob.xy[0, 0, 0])
        t_batch = (time.perf_counter() - t0) / 3 / 16

        print(f"cap {cap}: single {t_single*1e3:6.1f} ms/frame "
              f"({1/t_single:5.1f} fps) | batched B=16 "
              f"{t_batch*1e3:6.1f} ms/frame ({1/t_batch:5.1f} fps)",
              flush=True)


if __name__ == "__main__":
    main()
