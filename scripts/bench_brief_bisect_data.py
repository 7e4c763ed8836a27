"""Bisect WHICH aspect of the real NMS coords makes the gather slow."""
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
from photogrammetry_tpu.sfm.frontend import FrontendConfig, make_pairs


def timeit(name, fn, *args, iters=8):
    jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:44s} {np.median(times)*1e3:9.3f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (1080, 1920)), jnp.float32)
    config = FrontendConfig(detection_threshold=50.0, max_keypoints=2048,
                            reduction="nms", suppression_radius=4.0)
    pairs = make_pairs(config)
    fn = jax.jit(brief_bits)

    real = np.load("/tmp/nms_coords.npy")
    rand = np.stack([rng.integers(0, 1080, 2048),
                     rng.integers(0, 1920, 2048)], axis=-1).astype(np.int32)

    timeit("real (ref, expect ~36ms)", fn, frame, jnp.asarray(real), pairs)
    for head in (32, 128, 512, 1024):
        mix = rand.copy()
        mix[:head] = real[:head]
        timeit(f"real[:{head}] + random rest", fn, frame, jnp.asarray(mix),
               pairs)
    jit = real + rng.integers(-1, 2, real.shape).astype(np.int32)
    timeit("real + jitter ±1", fn, frame, jnp.asarray(jit), pairs)
    rr = real.copy(); rr[:, 1] = rand[:, 1]
    timeit("real rows, random cols", fn, frame, jnp.asarray(rr), pairs)
    rc = real.copy(); rc[:, 0] = rand[:, 0]
    timeit("random rows, real cols", fn, frame, jnp.asarray(rc), pairs)
    # same row-band as real but uniform random
    band = rand.copy(); band[:, 0] = rng.integers(3, 338, 2048)
    timeit("random in rows 3..337", fn, frame, jnp.asarray(band), pairs)


if __name__ == "__main__":
    main()
