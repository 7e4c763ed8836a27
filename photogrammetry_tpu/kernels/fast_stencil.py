"""Pallas TPU kernel: fused FAST-16 score-map stencil.

One kernel evaluates the full ring test for a band of rows: the haloed input
band is DMA'd from HBM into VMEM scratch (overlapping reads expressed as
explicit async copies — the canonical halo pattern), the band test and the
circular-run-length recurrence run as VPU ops with a single live mask, and
only the int32 score band is written back.  The 16 (H, W) shifted
intermediates of the XLA formulation (ops/fast.py) never touch HBM.

STATUS (round 3): compiles on the axon AOT in ~1.4 s (the round-1 >9 min
hang no longer reproduces on the current toolchain), bit-exact against
ops.fast.fast_score_map on hardware, and measured 3.1x faster standalone
at 1080p (0.80 vs 2.49 ms) / +15% on the full split frontend (17.8k ->
20.5k frames/s, docs/tpu_notes.md §5).  Default on TPU backends via
FrontendConfig.use_pallas_detect=None auto-resolution; interpret-mode
parity stays covered by tests/test_kernels.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from photogrammetry_tpu.ops.fast import BORDER, MIN_CONSECUTIVE, RING_OFFSETS

TILE_H = 64
# column tile: bounds the VMEM live-set of the 32 shifted ring slices the
# Mosaic scheduler keeps on its scoped stack (32 x TILE_H x W x 4 B grows
# with W: 15.7 MB at W=1920 — just under the 16 MB scoped limit — and a
# 30 MB OOM at the 12-MP lego photos' W=4096; observed round 4)
TILE_W = 1024
# halo of 4 (not the minimal 3): keeps DMA'd band rows 8-aligned
HALO = 4
# DMA'd column slices must be 128-lane aligned, so the band carries a full
# extra 128 columns instead of 2*HALO ("Slice shape along dimension 1 must
# be aligned to tiling (128)", Mosaic)
COL_PAD = 128


def _make_kernel(tile_w: int, batched: bool = False):
    def kernel(thr_ref, img_hbm, out_ref):
        if batched:
            # leading grid dim = frame index (VERDICT r4 item 6: the
            # batched production frontend previously pinned the XLA
            # stencil because vmap-of-pallas_call was unexercised on the
            # axon AOT; batching belongs in the kernel grid)
            b = pl.program_id(0)
            i = pl.program_id(1)
            j = pl.program_id(2)
            src = img_hbm.at[b]
        else:
            i = pl.program_id(0)
            j = pl.program_id(1)
            src = img_hbm
        h = out_ref.shape[-2]
        w = out_ref.shape[-1]

        def body(band, sem):
            copy = pltpu.make_async_copy(
                src.at[pl.ds(i * TILE_H, TILE_H + 2 * HALO),
                       pl.ds(j * tile_w, tile_w + COL_PAD)],
                band, sem)
            copy.start()
            copy.wait()

            thr = thr_ref[0]
            center = band[HALO:HALO + h, HALO:HALO + w]
            lower = center - thr
            upper = center + thr

            run = jnp.zeros((h, w), jnp.int32)
            best = jnp.zeros((h, w), jnp.int32)
            # longest circular run of out-of-band ring pixels (doubled ring,
            # backward recurrence; one live mask at a time)
            for k in range(31, -1, -1):
                dr, dc = RING_OFFSETS[k % 16]
                s = band[HALO + dr:HALO + dr + h, HALO + dc:HALO + dc + w]
                m = ((s <= lower) | (s >= upper)).astype(jnp.int32)
                run = m * (1 + run)
                if k < 16:
                    best = jnp.maximum(best, run)
            score = jnp.minimum(best, 16)
            result = jnp.where(score >= MIN_CONSECUTIVE, score, 0)
            if batched:
                out_ref[0] = result
            else:
                out_ref[:] = result

        pl.run_scoped(
            body,
            pltpu.VMEM((TILE_H + 2 * HALO, tile_w + COL_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        )

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def fast_score_map_pallas_batch(images: jnp.ndarray, threshold,
                                interpret: bool = False) -> jnp.ndarray:
    """Batched drop-in for vmap(ops.fast.fast_score_map): (B, H, W) ->
    (B, H, W) int32 score maps, frames as the leading KERNEL GRID
    dimension (vmap-of-pallas_call is unexercised on the axon AOT;
    in-grid batching is the supported form)."""
    bsz, h, w = images.shape
    img = images.astype(jnp.float32)

    pad_h = (-h) % TILE_H
    hp = h + pad_h
    w128 = ((w + 127) // 128) * 128
    tile_w = w128 if w128 <= 1920 else TILE_W
    w_out = ((w + tile_w - 1) // tile_w) * tile_w
    padded = jnp.pad(img, ((0, 0), (HALO, HALO + pad_h),
                           (HALO, (w_out - w) + COL_PAD - HALO)))
    thr = jnp.full((1,), threshold, jnp.float32)

    out = pl.pallas_call(
        _make_kernel(tile_w, batched=True),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, w_out), jnp.int32),
        grid=(bsz, hp // TILE_H, w_out // tile_w),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # threshold scalar
            pl.BlockSpec(memory_space=pltpu.ANY),   # images stay in HBM
        ],
        out_specs=pl.BlockSpec((1, TILE_H, tile_w),
                               lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(thr, padded)

    score = out[:, :h, :w]
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    interior = ((rows >= BORDER) & (rows < h - BORDER)
                & (cols >= BORDER) & (cols < w - BORDER))
    return jnp.where(interior[None], score, 0)


@partial(jax.jit, static_argnames=("interpret",))
def fast_score_map_pallas(image: jnp.ndarray, threshold,
                          interpret: bool = False) -> jnp.ndarray:
    """Drop-in Pallas replacement for ops.fast.fast_score_map."""
    h, w = image.shape
    img = image.astype(jnp.float32)

    pad_h = (-h) % TILE_H
    hp = h + pad_h
    # Column tiling: out width padded to a TILE_W multiple (tile_w is a
    # 128 multiple, so out blocks and DMA column starts are lane-aligned);
    # the input carries COL_PAD extra columns so every band's halo fits.
    # Adaptive: a full-width single band is fastest (splitting 1920 into
    # two 1024 tiles measured ~2x slower end-to-end — per-tile overhead
    # dominates at TILE_H=64), and is hardware-proven up to w=1920; only
    # wider frames (where the full band OOMs the 16 MB scoped VMEM) pay
    # the column split.
    w128 = ((w + 127) // 128) * 128
    tile_w = w128 if w128 <= 1920 else TILE_W
    w_out = ((w + tile_w - 1) // tile_w) * tile_w
    padded = jnp.pad(img, ((HALO, HALO + pad_h),
                           (HALO, (w_out - w) + COL_PAD - HALO)))
    thr = jnp.full((1,), threshold, jnp.float32)

    out = pl.pallas_call(
        _make_kernel(tile_w),
        out_shape=jax.ShapeDtypeStruct((hp, w_out), jnp.int32),
        grid=(hp // TILE_H, w_out // tile_w),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # threshold scalar
            pl.BlockSpec(memory_space=pltpu.ANY),   # image stays in HBM
        ],
        out_specs=pl.BlockSpec((TILE_H, tile_w), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(thr, padded)

    score = out[:h, :w]
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    interior = ((rows >= BORDER) & (rows < h - BORDER)
                & (cols >= BORDER) & (cols < w - BORDER))
    return jnp.where(interior, score, 0)
