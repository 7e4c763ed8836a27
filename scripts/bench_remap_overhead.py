"""Discriminate what dominates the slab remap kernel: per-grid-step
overhead vs window work.  Times ONE pass with synthetic identity maps at
several (tile, dv) settings; if cost tracks grid-step count rather than
dv, the kernel is pipeline-bubble-bound."""
from __future__ import annotations

import os
import time

import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)

import jax.numpy as jnp
import numpy as np

from photogrammetry_tpu.kernels import remap as R


def timed(fn, *args, iters=20):
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
    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (h, w)), jnp.float32)
    _ = float(img[0, 0])
    rows = (np.arange(h)[:, None] * np.ones((1, w))).astype(np.float32)

    for th, tw, spread in [(64, 512, 0), (64, 512, 40), (64, 512, 80),
                           (256, 512, 0), (256, 512, 80),
                           (64, 1920, 0), (64, 1920, 40),
                           (256, 1920, 80)]:
        # spread widens the per-tile window artificially
        rho = rows + spread * np.random.default_rng(1).random((h, w)) \
            .astype(np.float32)
        plan, pt, _pb = R._build_pass(rho, h, th, min(tw, w), h, w)
        ht, wt, ns = plan.slabs.shape
        try:
            run = jax.jit(lambda s, p=plan, t=pt:
                          R._run_pass(s, p, t, False))
            ms = timed(run, img)
            msg = f"{ms:8.2f} ms"
        except Exception as e:  # noqa: BLE001
            msg = f"FAIL {type(e).__name__}: {str(e).splitlines()[0][:90]}"
        print(f"tile ({th},{tw}) spread {spread:3d}: dv={plan.dv:4d} "
              f"grid {ht}x{wt}x{ns}={ht*wt*ns:5d} steps  {msg}",
              flush=True)


if __name__ == "__main__":
    main()
