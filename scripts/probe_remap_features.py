"""Bisect which kernel feature crashes the axon AOT (remap kernel debug).

Each probe is a minimal pallas_call exercising ONE suspect feature:
  p1: SMEM 2D int32 table indexed [i, j] by program ids
  p2: manual DMA with STATIC row base (fast_stencil-style control)
  p3: manual DMA with DYNAMIC row base from the SMEM table
  p4: unrolled shifted sublane slices of the DMA'd band (the weight loop)
  p5: the full remap pass kernel at small size
"""
from __future__ import annotations

import os
import traceback

import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW, DV = 8, 128, 16
BR = TH + DV


def probe(name, fn):
    try:
        out = fn()
        print(f"{name}: OK {np.asarray(out).ravel()[:2]}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


def p1():
    def kernel(tab_ref, x_ref, o_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        o_ref[:] = x_ref[:] + tab_ref[i, j].astype(jnp.float32)

    tab = jnp.arange(8, dtype=jnp.int32).reshape(2, 4)
    x = jnp.ones((16, 512), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 512), jnp.float32),
        grid=(2, 4),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(tab, x)


def p2():
    def kernel(src_hbm, o_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def body(band, sem):
            c = pltpu.make_async_copy(
                src_hbm.at[pl.ds(i * TH, BR), pl.ds(j * TW, TW)], band, sem)
            c.start()
            c.wait()
            o_ref[:] = band[0:TH, :]

        pl.run_scoped(body, pltpu.VMEM((BR, TW), jnp.float32),
                      pltpu.SemaphoreType.DMA(()))

    src = jnp.ones((16 + DV, 512), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 512), jnp.float32),
        grid=(2, 4),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(src)


def p3():
    def kernel(tab_ref, src_hbm, o_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def body(band, sem):
            r0 = tab_ref[i, j]
            c = pltpu.make_async_copy(
                src_hbm.at[pl.ds(r0, BR), pl.ds(j * TW, TW)], band, sem)
            c.start()
            c.wait()
            o_ref[:] = band[0:TH, :]

        pl.run_scoped(body, pltpu.VMEM((BR, TW), jnp.float32),
                      pltpu.SemaphoreType.DMA(()))

    tab = jnp.zeros((2, 4), jnp.int32).at[1].set(8)
    src = jnp.ones((16 + DV, 512), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 512), jnp.float32),
        grid=(2, 4),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(tab, src)


def p4():
    def kernel(src_hbm, rho_ref, o_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def body(band, sem):
            c = pltpu.make_async_copy(
                src_hbm.at[pl.ds(i * TH, BR), pl.ds(j * TW, TW)], band, sem)
            c.start()
            c.wait()
            rho_l = rho_ref[...]
            y = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0) \
                .astype(jnp.float32)
            acc = jnp.zeros((TH, TW), jnp.float32)
            for d in range(DV):
                w = jnp.maximum(1.0 - jnp.abs(rho_l - (y + d)), 0.0)
                acc = acc + band[d:d + TH, :] * w
            o_ref[:] = acc

        pl.run_scoped(body, pltpu.VMEM((BR, TW), jnp.float32),
                      pltpu.SemaphoreType.DMA(()))

    src = jnp.ones((16 + DV, 512), jnp.float32)
    rho = jnp.full((16, 512), 2.5, jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 512), jnp.float32),
        grid=(2, 4),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(src, rho)


def p5():
    from photogrammetry_tpu.kernels.remap import (
        apply_remap_pallas, build_remap_plan,
    )

    rows = np.arange(64)[:, None] * np.ones((1, 256))
    cols = np.arange(256)[None, :] * np.ones((64, 1))
    dmap = np.stack([rows * 0.9 + 2.2, cols * 0.9 + 1.7], -1)
    plan = build_remap_plan(dmap, (64, 256), tile=(32, 128))
    img = jnp.asarray(np.random.default_rng(0)
                      .integers(0, 255, (64, 256)), jnp.float32)
    return apply_remap_pallas(img, plan)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    probe("p1 smem-table", p1)
    probe("p2 static-dma", p2)
    probe("p3 dyn-dma", p3)
    probe("p4 shift-loop", p4)
    probe("p5 full-small", p5)
