"""Pallas TPU kernel: dense packed-BRIEF bit planes.  STATUS: a measured
NEGATIVE result on the current toolchain — bit-exact but 53 ms/frame vs
15.8 ms for the serial-gather formulation; kept as a documented
experiment, NOT wired into the frontend.

The idea: the BRIEF stage is the frontend's biggest cost on this chip
(gathering 2048 x 256 x 2 = 1M image samples at the hardware's ~80 M
elem/s serial element-gather rate -> 15.1 ms/frame, docs/tpu_notes.md
§0).  This kernel inverts the computation: evaluate every pair's
comparison DENSELY for all pixels — bit_p(x) = img[x+a_p] < img[x+b_p] —
as 512 statically-shifted VMEM slices per row band, pack the 256 bits
into 8 uint32 planes, then gather only (N, 8) words (16k elements).

Why it loses HERE: the sigma=50 pair offsets are lane-unaligned, so each
of the 512 shifted VMEM slices costs a vector lane-rotation; Mosaic's
rotate throughput (~20-40 G elem/s effective) puts the dense pass at
~53 ms — worse than the gathers it replaces.  (A pure-XLA roll
formulation materializes 4.2 GB of rolled copies: 12.5 ms, also no win.)
On a toolchain with cheap lane rotates or native per-lane gathers this
kernel is the right shape.  Also documented: Mosaic miscompiles
`(cmp).astype(u32) << k` for k >= 16 (drops the bits) — the multiply
form is used.

Interpret-mode and hardware bit-parity with ops.brief.brief_bits are
asserted in tests/test_kernels.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 32
COL_TILE = 1024  # column tile bound, mirrors fast_stencil's VMEM lesson


def _make_kernel(pairs_np: np.ndarray, tile_w: int, rpad: int, cpad: int,
                 num_words: int):
    p = [tuple(int(v) for v in row.ravel()) for row in pairs_np]

    def kernel(img_hbm, *out_refs):
        h = out_refs[0].shape[0]
        w = out_refs[0].shape[1]
        i = pl.program_id(0)
        j = pl.program_id(1)

        def body(band, sem):
            copy = pltpu.make_async_copy(
                img_hbm.at[pl.ds(i * TILE_H, TILE_H + 2 * rpad),
                           pl.ds(j * tile_w, tile_w + 2 * cpad)],
                band, sem)
            copy.start()
            copy.wait()

            for word in range(num_words):
                # Mosaic miscompiles shifts >= 16 of the casted comparison
                # result (drops the bits — observed on hardware, round 4);
                # the exact multiply-by-2^bit form is used.  See the
                # module docstring: this kernel is a documented NEGATIVE
                # result on the current toolchain either way.
                acc = jnp.zeros((h, w), jnp.uint32)
                for bit in range(32):
                    ar, ac, br, bc = p[word * 32 + bit]
                    sa = band[rpad + ar:rpad + ar + h,
                              cpad + ac:cpad + ac + w]
                    sb = band[rpad + br:rpad + br + h,
                              cpad + bc:cpad + bc + w]
                    acc = acc + ((sa < sb).astype(jnp.uint32)
                                 * np.uint32(1 << bit))
                out_refs[word][:] = acc

        pl.run_scoped(
            body,
            pltpu.VMEM((TILE_H + 2 * rpad, tile_w + 2 * cpad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        )

    return kernel


@partial(jax.jit, static_argnames=("pairs_static", "interpret"))
def _packed_planes(image: jnp.ndarray, pairs_static,
                   interpret: bool = False) -> jnp.ndarray:
    """(H, W) image -> (P//32, H, W) uint32 packed BRIEF planes.

    pairs_static: hashable nested tuple of the (P, 2, 2) int offsets.
    """
    pairs_np = np.asarray(pairs_static, np.int32).reshape(-1, 2, 2)
    num_pairs = pairs_np.shape[0]
    assert num_pairs % 32 == 0
    num_words = num_pairs // 32
    h, w = image.shape
    img = image.astype(jnp.float32)

    # halo: max |offset| per axis, rounded for sublane (8) / lane (128)
    # DMA alignment
    rmax = int(np.abs(pairs_np[..., 0]).max())
    cmax = int(np.abs(pairs_np[..., 1]).max())
    rpad = ((rmax + 7) // 8) * 8
    cpad = ((cmax + 127) // 128) * 128

    pad_h = (-h) % TILE_H
    hp = h + pad_h
    w128 = ((w + 127) // 128) * 128
    tile_w = min(COL_TILE, w128)
    w_out = ((w + tile_w - 1) // tile_w) * tile_w
    padded = jnp.pad(img, ((rpad, rpad + pad_h),
                           (cpad, cpad + (w_out - w))))

    outs = pl.pallas_call(
        _make_kernel(pairs_np, tile_w, rpad, cpad, num_words),
        out_shape=[jax.ShapeDtypeStruct((hp, w_out), jnp.uint32)
                   for _ in range(num_words)],
        grid=(hp // TILE_H, w_out // tile_w),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec((TILE_H, tile_w), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
                   for _ in range(num_words)],
        interpret=interpret,
    )(padded)
    return jnp.stack([o[:h, :w] for o in outs])


def brief_bits_packed(image: jnp.ndarray, coords: jnp.ndarray,
                      pairs: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.brief.brief_bits via the dense kernel.

    pairs must be a concrete (host-known) array — it is baked into the
    kernel statically.
    """
    pairs_np = np.asarray(pairs, np.int32)
    pairs_static = tuple(tuple(int(v) for v in row.ravel())
                         for row in pairs_np)
    words = _packed_planes(image, pairs_static, interpret=interpret)
    return _gather_unpack(words, coords, jnp.asarray(pairs_np),
                          image.shape[0], image.shape[1])


@partial(jax.jit, static_argnames=("h", "w"))
def _gather_unpack(words, coords, pairs, h: int, w: int):
    """(W8, H, W) planes + (N, 2) coords -> (N, P) uint8 bits with the
    reference's out-of-bounds-pair -> 0 semantics."""
    cr = jnp.clip(coords[:, 0], 0, h - 1)
    cc = jnp.clip(coords[:, 1], 0, w - 1)
    pw = words[:, cr, cc]                          # (W8, N) u32
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = ((pw[:, :, None] >> shifts[None, None, :]) & 1).astype(jnp.uint8)
    bits = jnp.moveaxis(bits, 1, 0).reshape(coords.shape[0], -1)  # (N, P)
    p = coords[:, None, None, :] + pairs[None]
    lim = jnp.array([h, w], jnp.int32)
    valid = jnp.all((p >= 0) & (p < lim), axis=(2, 3))
    return bits * valid.astype(jnp.uint8)
