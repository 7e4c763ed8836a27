"""Which *data* property of the index vector makes the TPU gather slow?
Same compiled executable, different index contents."""
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

    rand = np.stack([rng.integers(0, 1080, 2048),
                     rng.integers(0, 1920, 2048)], axis=-1).astype(np.int32)
    timeit("random coords", fn, frame, jnp.asarray(rand), pairs)

    dup = rand.copy()
    dup[200:] = dup[0]
    timeit("random, 90% duplicates of row 0", fn, frame, jnp.asarray(dup),
           pairs)

    zeros = np.zeros((2048, 2), np.int32)
    timeit("all zeros", fn, frame, jnp.asarray(zeros), pairs)

    corner = rand.copy()
    corner[:, 0] = rng.integers(0, 8, 2048)      # near top edge: many
    corner[:, 1] = rng.integers(0, 8, 2048)      # out-of-bounds samples
    timeit("all near (0,0) corner", fn, frame, jnp.asarray(corner), pairs)

    center = rand.copy()
    center[:, 0] = rng.integers(500, 580, 2048)  # interior cluster,
    center[:, 1] = rng.integers(900, 1020, 2048)  # no OOB samples
    timeit("interior 80x120 cluster", fn, frame, jnp.asarray(center), pairs)

    # real NMS output
    def upto_nms(im):
        pts = extract_keypoints(fast_score_map(im, 50.0), 2048, order="score")
        return compact_points(nms_keypoints_parallel(pts, 4.0), 2048)

    pts = jax.block_until_ready(jax.jit(upto_nms)(frame))
    nms_coords = np.asarray(pts.coords)
    print("nms count:", int(pts.count), "coord ranges:",
          nms_coords.min(0), nms_coords.max(0), flush=True)
    timeit("real NMS coords", fn, frame, jnp.asarray(nms_coords), pairs)
    # NMS coords shuffled (break any ordering)
    perm = rng.permutation(2048)
    timeit("real NMS coords, shuffled", fn, frame,
           jnp.asarray(nms_coords[perm]), pairs)
    # NMS valid prefix + random tail (kill duplicates, keep real head)
    mixed = nms_coords.copy()
    n = int(pts.count)
    mixed[n:] = rand[n:]
    timeit("NMS head + random tail", fn, frame, jnp.asarray(mixed), pairs)


if __name__ == "__main__":
    main()
