"""Pallas TPU kernel: fused Schur reduced-camera-system assembly.

The BA hot op (BASELINE.json north star: "a Schur-complement reduced camera
system for BA" as a Pallas kernel) is the pair

    s_off = einsum("ftik,gtjk->fgij", w_hinv, w_cp)     # (F,F,6,6)
    corr  = einsum("ftik,tk->fi",     w_hinv, b_p)      # (F,6)

from sfm.ba.schur_solve (ba.py:149,152).  Both reduce over the landmark axis
(T tracks x 3 point params); flattening camera blocks to a 6F axis and
landmark blocks to a 3T axis turns them into

    S = A @ B^T            A, B: (6F, 3T)
    corr = A @ bp          bp:   (3T,)

i.e. one MXU matmul per landmark tile.  This kernel streams the two (6F, 3T)
operands through VMEM exactly once, accumulating BOTH outputs per tile —
one pass over HBM instead of the two separate einsum passes, which matters
because at F=16, T=4096 the operands (2 x 6F x 3T x 4 B = 9.4 MB) dwarf the
(6F)^2 output.

The grid's landmark axis is sequential on TPU, so '+=' accumulation into the
output block is race-free.  Like kernels/fast_stencil.py, this kernel is
interpret-verified and opt-in on the axon tunnel (see CLAUDE.md on AOT
hangs); the math is exact f32 so results match the einsum path bit-for-bit
per-tile, up to f32 summation order across tiles.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 512   # landmark-axis tile (multiple of 128 lanes)


def _kernel(a_ref, b_ref, bp_ref, s_ref, corr_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        s_ref[:] = jnp.zeros_like(s_ref)
        corr_ref[:] = jnp.zeros_like(corr_ref)

    a = a_ref[:]                    # (6Fp, TILE_T)
    b = b_ref[:]                    # (6Fp, TILE_T)
    bp = bp_ref[:]                  # (8, TILE_T) broadcast rows of b_p
    s_ref[:] += jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    corr_ref[:] += jax.lax.dot_general(
        a, bp, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _flatten_cam_lm(x):
    """(F, T, 6, 3) -> (6F, 3T) with [(f,i), (t,k)] layout."""
    f, t = x.shape[0], x.shape[1]
    return x.transpose(0, 2, 1, 3).reshape(6 * f, 3 * t)


@partial(jax.jit, static_argnames=("interpret",))
def schur_products_pallas(w_hinv: jnp.ndarray, w_cp: jnp.ndarray,
                          b_p: jnp.ndarray, interpret: bool = False):
    """Fused (s_off, corr) of schur_solve.

    Args:
      w_hinv: (F, T, 6, 3) f32 — W H_pp^{-1}.
      w_cp:   (F, T, 6, 3) f32 — W.
      b_p:    (T, 3) f32 — landmark RHS.
    Returns:
      s_off: (F, F, 6, 6) f32, corr: (F, 6) f32 — identical (up to f32 tile
      summation order) to the einsums at ba.py:149,152.
    """
    f, t = w_hinv.shape[0], w_hinv.shape[1]
    a = _flatten_cam_lm(w_hinv)          # (6F, 3T)
    b = _flatten_cam_lm(w_cp)            # (6F, 3T)
    bp = b_p.reshape(1, 3 * t)           # (1, 3T)

    rows = 6 * f
    rows_p = -(-rows // 8) * 8           # sublane-align camera axis
    cols = 3 * t
    cols_p = -(-cols // TILE_T) * TILE_T
    a = jnp.pad(a, ((0, rows_p - rows), (0, cols_p - cols)))
    b = jnp.pad(b, ((0, rows_p - rows), (0, cols_p - cols)))
    bp = jnp.pad(bp, ((0, 7), (0, cols_p - cols)))  # (8, 3Tp)

    grid = (cols_p // TILE_T,)
    s_mat, corr = pl.pallas_call(
        _kernel,
        out_shape=(jax.ShapeDtypeStruct((rows_p, rows_p), jnp.float32),
                   jax.ShapeDtypeStruct((rows_p, 8), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows_p, TILE_T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_p, TILE_T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((rows_p, rows_p), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((rows_p, 8), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(a, b, bp)

    s_off = (s_mat[:rows, :rows].reshape(f, 6, f, 6)
             .transpose(0, 2, 1, 3))
    return s_off, corr[:rows, 0].reshape(f, 6)
