"""Pallas TPU kernel: tiled Hamming distance matrix.

The matching hot loop of the reference (N1 x N2 x 256-bit popcount,
KeypointMatching.cs:20-31 / keypoint_matching.py:7-33) mapped onto the MXU:
for 0/1 bit vectors, hamming(a, b) = |a| + |b| - 2 a.b, so each (128, 128)
output tile is one bf16 matmul over the 256-bit descriptor axis plus two
row/column popcount corrections computed in-tile.  Tiles stream through VMEM;
the descriptor axis is small enough (P = 256) to keep whole operand stripes
resident per tile.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _kernel(a_ref, b_ref, out_ref):
    # f32 operands: exact for 0/1 bits, and the one matmul dtype combination
    # the axon AOT Mosaic build accepts (bf16 x bf16 -> f32 is rejected with
    # "Bad lhs type" there; measured 2026-08, docs/tpu_notes.md).
    a = a_ref[:].astype(jnp.float32)           # (TILE, P)
    b = b_ref[:].astype(jnp.float32)           # (P, TILE)
    ab = jnp.dot(a, b, preferred_element_type=jnp.float32)
    na = jnp.sum(a, axis=1, keepdims=True)
    nb = jnp.sum(b, axis=0, keepdims=True)
    out_ref[:] = (na + nb - 2.0 * ab).astype(jnp.int32)


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@partial(jax.jit, static_argnames=("interpret",))
def hamming_distance_matrix_pallas(bits1: jnp.ndarray, bits2: jnp.ndarray,
                                   interpret: bool = False) -> jnp.ndarray:
    """(N1, P) x (N2, P) {0,1} → (N1, N2) int32 Hamming distances.

    Numerically identical to ops.match.hamming_distance_matrix (exact integer
    counts; products of 0/1 are exact in bf16 and P <= 256 sums are exact in
    f32 accumulation).
    """
    n1, p = bits1.shape
    n2 = bits2.shape[0]
    a = _pad_to(bits1.astype(jnp.int8), TILE, 0)
    b = _pad_to(bits2.astype(jnp.int8), TILE, 0).T  # (P, N2p)
    n1p = a.shape[0]
    n2p = b.shape[1]

    grid = (n1p // TILE, n2p // TILE)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n1p, n2p), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, p), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b)
    return out[:n1, :n2]
