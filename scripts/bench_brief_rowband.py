"""VERDICT r4 item 8: one more principled shot at the BRIEF gather wall,
as row/segment gathers — MEASUREMENT FIRST.

The idea: gather each keypoint's patch as contiguous row SEGMENTS
(row-gather path, measured 1.15 G elem/s for full rows) instead of 512
scattered elements (element-gather path, ~80 M elem/s), then sample the
pair offsets densely in-VMEM/registers.  Whether it can win is pure
arithmetic on two rates:

  current:  K x P x 2 elements at the element rate
  banded:   K x (2R+1) segments x (2R+1) elements at the segment rate,
            R = the descriptor pattern's spatial radius

With the reference pattern (sigma=50 -> R ~ 150, unclipped tails beyond)
the band is ~90,000 elements per keypoint vs 512 sampled — the segment
rate would have to beat the element rate by ~175x to break even; the
measured row-vs-element ratio is only ~14x.  This script measures the
actual segment-gather rate vs segment length to close the question with
data.
"""
from __future__ import annotations

import os
import time

import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)

import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=10):
    out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    ts = []
    for _rep in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(np.asarray(out).ravel()[0])
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts)) * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (1080, 1920)), jnp.float32)
    _ = float(img[0, 0])

    # element-gather baseline: the current BRIEF sample set
    k, p = 2048, 256
    coords = jnp.asarray(
        np.stack([rng.integers(200, 880, (k, p, 2)),
                  rng.integers(200, 1720, (k, p, 2))], axis=-1),
        jnp.int32)

    @jax.jit
    def elem_gather(im, c):
        return im[c[..., 0], c[..., 1]].sum(axis=(1, 2))

    ms = timed(elem_gather, img, coords)
    n = k * p * 2
    print(f"element gather {n/1e6:.2f}M elems: {ms:8.2f} ms "
          f"({n/ms/1e3:.0f} M elem/s)", flush=True)

    # segment gathers: per (kp, row-of-band) contiguous seg_len elements
    for seg_len, nseg in [(64, 64), (128, 128), (128, 64), (304, 304)]:
        rows = jnp.asarray(rng.integers(0, 1080 - 1, (k, nseg)), jnp.int32)
        col0 = jnp.asarray(rng.integers(0, 1920 - seg_len, (k, 1)),
                           jnp.int32)
        cols = col0[..., None] + jnp.arange(seg_len)[None, None, :]

        @jax.jit
        def seg_gather(im, r, c):
            # (k, nseg, seg_len) gather of contiguous segments
            return im[r[..., None], c].sum(axis=(1, 2))

        ms = timed(seg_gather, img, rows, cols, iters=5)
        n = k * nseg * seg_len
        print(f"segment gather {nseg}x{seg_len} per kp "
              f"({n/1e6:6.1f}M elems): {ms:8.2f} ms "
              f"({n/ms/1e3:.0f} M elem/s)", flush=True)

    # dynamic-slice patch extraction (vmapped) as the alternative form
    for radius in [32, 64]:
        side = 2 * radius + 1
        centers = jnp.asarray(
            np.stack([rng.integers(radius, 1080 - radius - 1, k),
                      rng.integers(radius, 1920 - radius - 1, k)], -1),
            jnp.int32)

        @jax.jit
        def patches(im, c):
            def one(cc):
                return jax.lax.dynamic_slice(
                    im, (cc[0] - radius, cc[1] - radius), (side, side))
            return jax.vmap(one)(c).sum(axis=(1, 2))

        ms = timed(patches, img, centers, iters=5)
        n = k * side * side
        print(f"vmapped dynamic_slice {side}x{side} patches "
              f"({n/1e6:6.1f}M elems): {ms:8.2f} ms "
              f"({n/ms/1e3:.0f} M elem/s)", flush=True)


if __name__ == "__main__":
    main()
