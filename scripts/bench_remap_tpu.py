"""A/B the separable Pallas remap vs the XLA gather remap on the chip.

Forcing-read protocol (bench.py / BENCH_FULL.md): up-front scalar read
(deterministic sync mode), timed blocks terminated by a value read of the
last output, median of five.

Target (VERDICT r4 item 4): beat the reference's cv2.remap headline
(8-16 ms at 1080p, warping.py:149-161 / stats.json) on the TPU — the one
op where the chip previously lost (87 ms element-gather-bound).
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


def timed(fn, *args, iters=20):
    out = fn(*args)
    _ = float(out.reshape(-1)[0])  # warm + force
    best = []
    for _rep in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(out.reshape(-1)[0])
        best.append((time.perf_counter() - t0) / iters)
    return float(np.median(best)) * 1e3


def main():
    from photogrammetry_tpu.kernels.remap import (
        apply_remap_pallas, build_remap_plan,
    )
    from photogrammetry_tpu.ops.dewarp import (
        apply_distortion_map, generate_distortion_map,
    )

    print("backend:", jax.default_backend(), flush=True)
    h, w = 1080, 1920
    coeffs = (3e-4, 1e-7, 0, 0, 0)  # reference appsettings/de_warp.py:52
    dmap_d = generate_distortion_map(h, w, coeffs)
    dmap = np.asarray(dmap_d)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (h, w)), jnp.float32)
    _ = float(img[0, 0])  # sync-dispatch mode

    xla = jax.jit(lambda i, d: apply_distortion_map(i, d, mode="bilinear"))
    t_xla = timed(xla, img, jnp.asarray(dmap), iters=5)
    print(f"XLA gather bilinear:      {t_xla:8.2f} ms", flush=True)

    ref = np.asarray(xla(img, jnp.asarray(dmap)))
    for tile in [(64, 256), (64, 512), (64, 1024), (32, 512), (128, 512)]:
        t_build0 = time.perf_counter()
        plan = build_remap_plan(dmap, (h, w), tile=tile)
        t_build = time.perf_counter() - t_build0
        if plan is None:
            print(f"tile {tile}: plan rejected", flush=True)
            continue
        try:
            t_pal = timed(apply_remap_pallas, img, plan, iters=20)
        except Exception as e:  # noqa: BLE001 — record and continue sweep
            print(f"tile {tile}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        out = np.asarray(apply_remap_pallas(img, plan))
        err = np.abs(out - ref)
        print(f"tile {tile}: {t_pal:8.2f} ms  dv=({plan.pass1.dv},"
              f"{plan.pass2.dv})  build={t_build:.2f}s  "
              f"err max {err.max():.2f} mean {err.mean():.3f}", flush=True)


if __name__ == "__main__":
    main()
