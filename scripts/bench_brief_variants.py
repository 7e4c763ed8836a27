"""Compare BRIEF gather strategies on the real chip (dev tool).

The (N, P, 2)-index 2D gather lowers to a near-serial path on TPU (~40 ms
for 1M samples).  Candidates:
  v1: flattened 1D jnp.take
  v2: whole-image bit planes via static shifts (pairs concrete at trace
      time), then one small gather of packed words
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

from photogrammetry_tpu.ops.brief import brief_bits, gaussian_pairs


def brief_bits_flat(image, coords, pairs):
    h, w = image.shape
    img = image.astype(jnp.float32).reshape(-1)
    p = coords[:, None, None, :] + pairs[None]          # (N, P, 2, 2)
    lim = jnp.array([h, w], jnp.int32)
    valid = jnp.all((p >= 0) & (p < lim), axis=(2, 3))  # (N, P)
    pc = jnp.clip(p, 0, lim - 1)
    flat_idx = pc[..., 0] * w + pc[..., 1]              # (N, P, 2)
    vals = jnp.take(img, flat_idx.reshape(-1)).reshape(flat_idx.shape)
    return (valid & (vals[..., 0] < vals[..., 1])).astype(jnp.uint8)


def make_brief_bits_planes(pairs_np):
    """Build a bit-plane BRIEF: all shifts static (pairs baked in)."""
    pairs_np = np.asarray(pairs_np)
    p = pairs_np.shape[0]

    def fn(image, coords):
        h, w = image.shape
        img = image.astype(jnp.float32)
        planes = []
        for i in range(p):
            (ar, ac), (br, bc) = pairs_np[i]
            # value at x of image shifted by (dr, dc) == img[x + (dr, dc)]
            a = jnp.roll(img, (-ar, -ac), axis=(0, 1))
            b = jnp.roll(img, (-br, -bc), axis=(0, 1))
            planes.append(a < b)
        bits_img = jnp.stack(planes, axis=-1)           # (H, W, P) bool
        n = coords.shape[0]
        lim = jnp.array([h, w], jnp.int32)
        pr = coords[:, None, None, :] + jnp.asarray(pairs_np)[None]
        valid = jnp.all((pr >= 0) & (pr < lim), axis=(2, 3))
        cc = jnp.clip(coords, 0, lim - 1)
        flat_idx = cc[:, 0] * w + cc[:, 1]
        got = jnp.take(bits_img.reshape(h * w, p), flat_idx, axis=0)
        return (valid & got).astype(jnp.uint8)

    return fn


def timeit(name, fn, *args, iters=10):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:28s} {np.median(times)*1e3:9.3f} ms  "
          f"(first {compile_s:.1f} s)", flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (1080, 1920)), jnp.float32)
    coords = jnp.asarray(
        np.stack([rng.integers(0, 1080, 2048), rng.integers(0, 1920, 2048)],
                 axis=-1), jnp.int32)
    pairs = gaussian_pairs(jax.random.PRNGKey(0))

    ref = timeit("v0 current (2d gather)", jax.jit(brief_bits), frame,
                 coords, pairs)
    v1 = timeit("v1 flat take", jax.jit(brief_bits_flat), frame, coords,
                pairs)
    print("v1 == v0:", bool(jnp.all(v1 == ref)), flush=True)
    planes = make_brief_bits_planes(np.asarray(pairs))
    v2 = timeit("v2 bit planes (static)", jax.jit(planes), frame, coords)
    print("v2 == v0:", bool(jnp.all(v2 == ref)), flush=True)


if __name__ == "__main__":
    main()
