"""Does executing the NMS while_loop program degrade subsequent calls?

Times the SAME brief executable on the SAME data before and after running
the while_loop program once.
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
from photogrammetry_tpu.sfm.frontend import FrontendConfig, make_pairs


def timeit(name, fn, *args, iters=8):
    jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:52s} {np.median(times)*1e3:9.3f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (1080, 1920)), jnp.float32)
    config = FrontendConfig(detection_threshold=50.0, max_keypoints=2048,
                            reduction="nms", suppression_radius=4.0)
    pairs = make_pairs(config)
    fn = jax.jit(brief_bits)
    rand = jnp.asarray(np.stack([rng.integers(0, 1080, 2048),
                                 rng.integers(0, 1920, 2048)],
                                axis=-1).astype(np.int32))
    score_fn = jax.jit(lambda im: fast_score_map(im, 50.0))

    timeit("brief(random) BEFORE while_loop", fn, frame, rand, pairs)
    timeit("score_map BEFORE while_loop", score_fn, frame)

    def upto_nms(im):
        pts = extract_keypoints(fast_score_map(im, 50.0), 2048, order="score")
        return compact_points(nms_keypoints_parallel(pts, 4.0), 2048)

    nms_fn = jax.jit(upto_nms)
    jax.block_until_ready(nms_fn(frame))
    print("-- while_loop program executed once --", flush=True)

    timeit("brief(random) AFTER while_loop", fn, frame, rand, pairs)
    timeit("score_map AFTER while_loop", score_fn, frame)
    timeit("nms program itself AFTER", nms_fn, frame)
    timeit("brief(random) AFTER, again", fn, frame, rand, pairs)


if __name__ == "__main__":
    main()
