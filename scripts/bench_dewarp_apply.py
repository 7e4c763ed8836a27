"""Time apply_distortion_map on TPU: 4-gather bilinear vs single-gather."""
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

from photogrammetry_tpu.ops.dewarp import (
    apply_distortion_map, generate_distortion_map,
)


def apply_bilinear_onegather(image, dist_map):
    squeeze = image.ndim == 2
    img = image[..., None] if squeeze else image
    h, w, _ = img.shape
    imgf = img.astype(jnp.float32)
    sr = dist_map[..., 0]
    sc = dist_map[..., 1]
    r0 = jnp.floor(sr)
    c0 = jnp.floor(sc)
    fr = (sr - r0)[..., None]
    fc = (sc - c0)[..., None]
    r0i = r0.astype(jnp.int32)
    c0i = c0.astype(jnp.int32)
    # all 4 taps through ONE gather op
    rr = jnp.stack([r0i, r0i, r0i + 1, r0i + 1])        # (4, H, W)
    cc = jnp.stack([c0i, c0i + 1, c0i, c0i + 1])
    inside = (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
    vals = imgf[jnp.clip(rr, 0, h - 1), jnp.clip(cc, 0, w - 1)]  # (4,H,W,C)
    vals = jnp.where(inside[..., None], vals, 0.0)
    out = (vals[0] * (1 - fr) * (1 - fc) + vals[1] * (1 - fr) * fc
           + vals[2] * fr * (1 - fc) + vals[3] * fr * fc)
    out = out.astype(image.dtype) if jnp.issubdtype(image.dtype,
                                                    jnp.floating) \
        else jnp.round(out).astype(image.dtype)
    return out[..., 0] if squeeze else out


def timeit(name, fn, *args, iters=10):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    c = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:40s} {np.median(times)*1e3:9.3f} ms (first {c:.0f}s)",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (1080, 1920)), jnp.float32)
    dmap = generate_distortion_map(1080, 1920, (3e-4, 1e-7, 0, 0, 0))
    dmap = jax.block_until_ready(dmap)

    near = jax.jit(lambda i, d: apply_distortion_map(i, d, mode="nearest"))
    bil4 = jax.jit(lambda i, d: apply_distortion_map(i, d, mode="bilinear"))
    bil1 = jax.jit(apply_bilinear_onegather)

    a = timeit("nearest (1 gather)", near, img, dmap)
    b = timeit("bilinear current (4 gathers)", bil4, img, dmap)
    c = timeit("bilinear one-gather", bil1, img, dmap)
    print("one-gather == current:",
          bool(jnp.max(jnp.abs(b - c)) < 1e-3), flush=True)


if __name__ == "__main__":
    main()
