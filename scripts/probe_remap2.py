"""Probe 2: which dynamic-base forms does the axon AOT accept?

  q1: DMA offset = quadratic integer polynomial of program ids
  q2: PrefetchScalarGridSpec block index_map driven by a prefetched
      scalar table (the canonical dynamic-gather pattern)
  q3: row-broadcast accumulation (band[r] * weights) instead of shifted
      64-row slices — relayout cost check, static base
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW, DV = 64, 512, 32
BR = TH + DV


def probe(name, fn):
    try:
        t0 = time.perf_counter()
        out = fn()
        _ = float(np.asarray(out).ravel()[0])
        dt = time.perf_counter() - t0
        print(f"{name}: OK ({dt:.1f}s first)", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:140]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


def q1():
    def kernel(src_hbm, o_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def body(band, sem):
            r0f = 8 * i + 2 * j + (i * i) // 2 + (j * j) // 4 + 1
            r0 = pl.multiple_of((r0f // 8) * 8, 8)
            c = pltpu.make_async_copy(
                src_hbm.at[pl.ds(r0, BR), pl.ds(j * TW, TW)], band, sem)
            c.start()
            c.wait()
            o_ref[:] = band[0:TH, :]

        pl.run_scoped(body, pltpu.VMEM((BR, TW), jnp.float32),
                      pltpu.SemaphoreType.DMA(()))

    src = jnp.ones((1280, 2048), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 2048), jnp.float32),
        grid=(4, 4),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(src)


def q2():
    # slab-gather: input blocked (8, TW); block row index from a
    # prefetched per-(i,j,s) table
    def kernel(tab_ref, slab_ref, o_ref):
        s = pl.program_id(2)

        @pl.when(s == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += slab_ref[0:1, :] * 0.1

    ht, wt, ns = 2, 4, 4
    tab = jnp.arange(ht * wt * ns, dtype=jnp.int32).reshape(ht, wt, ns) % 8
    src = jnp.ones((1280, 2048), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ht, wt, ns),
        in_specs=[
            pl.BlockSpec((8, TW), lambda i, j, s, tab: (tab[i, j, s], j)),
        ],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j, s, tab: (i, j)),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ht * TH, wt * TW), jnp.float32),
        grid_spec=grid_spec,
    )(tab, src)


def q3():
    def kernel(src_hbm, rho_ref, o_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def body(band, sem):
            c = pltpu.make_async_copy(
                src_hbm.at[pl.ds(i * TH, BR), pl.ds(j * TW, TW)], band, sem)
            c.start()
            c.wait()
            rho_l = rho_ref[...]
            acc = jnp.zeros((TH, TW), jnp.float32)
            for r in range(BR):
                w = jnp.maximum(1.0 - jnp.abs(rho_l - r), 0.0)
                acc = acc + band[r:r + 1, :] * w
            o_ref[:] = acc

        pl.run_scoped(body, pltpu.VMEM((BR, TW), jnp.float32),
                      pltpu.SemaphoreType.DMA(()))

    src = jnp.ones((1280, 2048), jnp.float32)
    rho = jnp.full((256, 2048), 5.25, jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 2048), jnp.float32),
        grid=(4, 4),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(src, rho)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    probe("q1 quadratic-offset", q1)
    probe("q2 prefetch-blockmap", q2)
    probe("q3 row-broadcast", q3)
