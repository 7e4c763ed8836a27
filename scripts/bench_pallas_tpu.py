"""Prove the Pallas tier on real TPU hardware (VERDICT r2 item 3).

Compiles kernels/hamming.py and kernels/schur.py on the chip, checks
exactness against the plain-XLA paths, and times both at the sweep sizes
VERDICT asks for (F=8..32, T=2048..8192; Hamming 4096^2x256).  Prints one
JSON line per measurement; results are committed to docs/tpu_notes.md.

Run: timeout 1800 python scripts/bench_pallas_tpu.py
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def timed(f, *a, iters=50):
    import jax

    jax.block_until_ready(f(*a))
    t = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t) / iters


def main() -> None:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from photogrammetry_tpu.kernels.hamming import hamming_distance_matrix_pallas
    from photogrammetry_tpu.kernels.schur import schur_products_pallas
    from photogrammetry_tpu.ops.match import hamming_distance_matrix

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    rng = np.random.default_rng(0)

    # ---- Hamming 4096x4096x256 ------------------------------------------
    b1 = jnp.asarray(rng.integers(0, 2, (4096, 256)), jnp.uint8)
    b2 = jnp.asarray(rng.integers(0, 2, (4096, 256)), jnp.uint8)

    try:
        t0 = time.perf_counter()
        d_pallas = jax.block_until_ready(
            hamming_distance_matrix_pallas(b1, b2))
        print(json.dumps({"event": "hamming_pallas_compiled",
                          "secs": round(time.perf_counter() - t0, 1)}),
              flush=True)
        d_xla = jax.block_until_ready(hamming_distance_matrix(b1, b2))
        exact = bool(jnp.array_equal(d_pallas, d_xla))
        dt_p = timed(hamming_distance_matrix_pallas, b1, b2)
        dt_x = timed(jax.jit(hamming_distance_matrix), b1, b2)
        print(json.dumps({"metric": "hamming_4096x4096x256", "exact": exact,
                          "pallas_ms": round(dt_p * 1e3, 3),
                          "xla_ms": round(dt_x * 1e3, 3)}), flush=True)
    except Exception as e:  # keep going: schur results are independent
        print(json.dumps({"metric": "hamming_4096x4096x256",
                          "error": str(e)[:500]}), flush=True)

    # ---- Schur products sweep -------------------------------------------
    def einsum_ref(w_hinv, w_cp, b_p):
        s_off = jnp.einsum("ftik,gtjk->fgij", w_hinv, w_cp)
        corr = jnp.einsum("ftik,tk->fi", w_hinv, b_p)
        return s_off, corr

    einsum_j = jax.jit(einsum_ref)
    for f in (8, 16, 32):
        for t in (2048, 4096, 8192):
            w_hinv = jnp.asarray(rng.normal(0, 1, (f, t, 6, 3)), jnp.float32)
            w_cp = jnp.asarray(rng.normal(0, 1, (f, t, 6, 3)), jnp.float32)
            b_p = jnp.asarray(rng.normal(0, 1, (t, 3)), jnp.float32)
            try:
                t0 = time.perf_counter()
                s_p, c_p = jax.block_until_ready(
                    schur_products_pallas(w_hinv, w_cp, b_p))
                compile_s = time.perf_counter() - t0
                s_x, c_x = jax.block_until_ready(einsum_j(w_hinv, w_cp, b_p))
                err = float(jnp.max(jnp.abs(s_p - s_x)) /
                            (jnp.max(jnp.abs(s_x)) + 1e-30))
                dt_p = timed(schur_products_pallas, w_hinv, w_cp, b_p,
                             iters=20)
                dt_x = timed(einsum_j, w_hinv, w_cp, b_p, iters=20)
                print(json.dumps({
                    "metric": f"schur_F{f}_T{t}", "rel_err": err,
                    "compile_s": round(compile_s, 1),
                    "pallas_us": round(dt_p * 1e6, 1),
                    "xla_us": round(dt_x * 1e6, 1)}), flush=True)
            except Exception as e:
                print(json.dumps({"metric": f"schur_F{f}_T{t}",
                                  "error": str(e)[:500]}), flush=True)


if __name__ == "__main__":
    main()
