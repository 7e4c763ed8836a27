"""Pallas TPU kernel: separable two-pass bilinear remap (lens dewarp apply).

The chip loses a direct bilinear remap to its serial element-gather rate
(~80-95 M elem/s: 8.3 M gathered taps = 87 ms at 1080p, BENCH_FULL.md),
while the reference's cv2.remap headline is 8-16 ms
(/root/reference/python_src/photogrammetry/image_processing/warping.py:149-161,
data/dewarp_test/stats.json entries 18-32).  This kernel removes the
gathers entirely by exploiting the smoothness of the distortion map —
the classic two-pass (vertical, then horizontal) mesh-warp decomposition:

  pass 1 (vertical):   tmp[y, c] = V-interp(img[:, c]) at row rho(y, c)
  pass 2 (horizontal): out[y, x] = H-interp(tmp[y, :]) at col sc(y, x)

where rho(y, c) = sr(y, x(y, c)) with x(y, c) the output column whose
horizontal sample position lands on source column c — the exact two-pass
intermediate, built once per distortion map on the host (build_remap_plan).
Pass 2 is pass 1 on transposed arrays, so ONE kernel serves both, with a
dense XLA transpose between.

Inside the kernel nothing is gathered: each output tile's source row band
is DMA'd with a per-tile dynamic base (SMEM table, fast-stencil-style
manual DMA), and the per-element fractional row positions are resolved as
a static loop of shifted slices with hat weights
  w_d = max(0, 1 - |rho_local - (y + d)|),   d = 0..DV-1
which is exact linear interpolation (two adjacent taps nonzero).  All
work is dense VPU multiply-adds at bandwidth-bound sizes.

Accuracy: identical to true bilinear up to the two-pass cross-term — the
intermediate row position is evaluated at integer source columns instead
of at the exact (fractional) horizontal tap, an O(|d sr/d x|) sub-pixel
vertical displacement (~0.04 px for the reference's 1080p coefficients).
Parity vs the exact XLA path is asserted to small tolerance in
tests/test_kernels.py; ops.dewarp.apply_distortion_map remains the exact
reference implementation.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Zero border: map coordinates are clamped to [-_BORDER, size+_BORDER-1]
# and the source is zero-padded so out-of-image taps read real zeros,
# matching apply_distortion_map's per-tap zeroing semantics.
_BORDER = 2


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _roundup(a: int, b: int) -> int:
    return _cdiv(a, b) * b


class _PassPlan(NamedTuple):
    """One vertical-resample pass: statics + device arrays.

    Dynamic per-tile source bases go through a scalar-prefetched SLAB
    INDEX TABLE driving the input BlockSpec's index_map — the one
    dynamic-gather form the axon AOT handles well (2 s compile;
    raw SMEM-scalar DMA offsets crash its compile helper and
    quadratic-in-program-id offsets take minutes —
    scripts/probe_remap_features.py, scripts/probe_remap2.py).  The
    source is consumed in (8, tw) slabs; slab s of tile (i, j) is source
    block (slabs[i, j, s], j), and the kernel accumulates 8 row-broadcast
    hat-weight MACs per slab into the revisited output block."""
    rho: np.ndarray       # (Hp, Wp) f32 source row per output element
    slabs: np.ndarray     # (Ht, Wt, NS) int32 slab row-block indices
    th: int               # output tile rows
    tw: int               # output tile cols (lane multiple)
    dv: int               # extra band rows beyond th (multiple of 8)
    src_rows: int         # padded source row count (multiple of 8)
    out_h: int            # valid output rows (pre-padding)
    out_w: int            # valid output cols


class RemapPlan(NamedTuple):
    pass1: _PassPlan      # vertical: img -> tmp (rows=H_out, cols=src cols)
    pass2: _PassPlan      # horizontal, transposed: tmpT -> outT
    src_h: int
    src_w: int
    pad_top1: int         # zero rows prepended to the image (pass-1 DMA)
    pad_top2: int         # zero rows prepended to tmpT (pass-2 DMA)
    out_h: int
    out_w: int


def _build_pass(rho: np.ndarray, src_rows: int, th: int, tw: int,
                out_h: int, out_w: int):
    """Per-tile DMA bases + static window for one vertical pass.

    rho: (H, W) absolute source-row coordinate per output element (already
    offset into the padded source grid).  Returns (_PassPlan, pad_top,
    pad_bot) where the paddings extend the source so every DMA'd band
    [r0, r0+th+dv) is in range.
    """
    h, w = rho.shape
    ht, wt = _cdiv(h, th), _cdiv(w, tw)
    padded = np.pad(rho, ((0, ht * th - h), (0, wt * tw - w)), mode="edge")
    tiles = padded.reshape(ht, th, wt, tw)
    lo = np.floor(tiles.min(axis=(1, 3)))           # (ht, wt) abs rows
    hi = np.ceil(tiles.max(axis=(1, 3)))
    r0 = (np.floor((lo - 1) / 8.0) * 8.0).astype(np.int64)
    # band rows [r0, r0+br) must contain both interp taps of every
    # element: taps span [lo, hi+1]; r0 >= lo-9 -> br >= (hi-lo)+10
    dv = _roundup(int(np.max(hi - lo)) + 10, 8)
    br = _roundup(dv + 8, 8)                         # band rows per tile
    pad_top = int(max(0, -r0.min()))
    r0 = r0 + pad_top
    total_rows = _roundup(
        max(int(r0.max()) + br, src_rows + pad_top), 8)
    pad_bot = total_rows - (src_rows + pad_top)
    ns = br // 8
    slabs = (r0[..., None] // 8
             + np.arange(ns, dtype=np.int64)).astype(np.int32)
    # device-resident ONCE at build time: re-uploading the (H, W) rho per
    # apply call costs ~45 ms of tunnel RTT + transfer each (measured:
    # 430 ms/apply with per-call uploads vs ~15 ms/pass without)
    plan = _PassPlan(rho=jnp.asarray(padded + pad_top, jnp.float32),
                     slabs=jnp.asarray(slabs),
                     th=th, tw=tw, dv=dv, src_rows=total_rows,
                     out_h=out_h, out_w=out_w)
    return plan, pad_top, pad_bot


def build_remap_plan(dist_map: np.ndarray, src_shape: tuple,
                     tile: tuple = (64, 512)) -> RemapPlan | None:
    """Build the two-pass plan for a fixed (H, W, 2) distortion map.

    src_shape: (H_s, W_s) of the source image the map samples from.
    Returns None when the map's horizontal coordinate is not monotonic in
    the output column (the two-pass inversion needs a per-row invertible
    horizontal map) — callers fall back to the exact gather path.
    """
    th, tw = tile
    src_h, src_w = src_shape
    dist_map = np.asarray(dist_map, np.float64)
    out_h, out_w = dist_map.shape[:2]
    # clamp far-outside coordinates to a 2-px zero-border ring: both interp
    # taps then land in zero padding, matching the exact path's per-tap
    # zeroing (coordinates are raw source pixels; negative values are
    # absorbed by _build_pass's pad_top in each pass)
    sr = np.clip(dist_map[..., 0], -_BORDER, src_h + _BORDER - 1.0)
    sc = np.clip(dist_map[..., 1], -_BORDER, src_w + _BORDER - 1.0)

    d = np.diff(sc, axis=1)
    if not np.all(d > -1e-6):
        return None  # horizontally folded map: keep the exact gather path

    # exact two-pass intermediate: rho1[y, c] = sr(y, x) where sc(y, x) = c
    # (tmp column c = raw source column c; c outside [0, src_w) lives in
    # zero padding, so its rho value is inert)
    xs = np.arange(out_w, dtype=np.float64)
    cgrid = np.arange(src_w, dtype=np.float64)
    rho1 = np.empty((out_h, src_w), np.float64)
    for y in range(out_h):
        xp = sc[y] + 1e-6 * xs             # strictly increasing (ties at
        x_of_c = np.interp(cgrid, xp, xs)  # the clamped border are inert)
        rho1[y] = np.interp(x_of_c, xs, sr[y])

    plan1, pad_top1, _pad_bot1 = _build_pass(
        rho1.astype(np.float32), src_h, th, tw, out_h, src_w)

    # pass 2 on transposed arrays: rows = output columns, source rows =
    # tmp columns (= raw source columns)
    rho2 = np.ascontiguousarray(sc.T).astype(np.float32)  # (out_w, out_h)
    plan2, pad_top2, _pad_bot2 = _build_pass(
        rho2, src_w, th, tw, out_w, out_h)

    return RemapPlan(pass1=plan1, pass2=plan2, src_h=src_h, src_w=src_w,
                     pad_top1=pad_top1, pad_top2=pad_top2,
                     out_h=out_h, out_w=out_w)


def _make_kernel(th: int, tw: int):
    def kernel(slab_tab, slab_ref, rho_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        s = pl.program_id(2)

        @pl.when(s == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        rho = rho_ref[...]
        base = (slab_tab[i, j, s] * 8).astype(jnp.float32)
        acc = out_ref[...]
        for r in range(8):
            w = jnp.maximum(1.0 - jnp.abs(rho - (base + r)), 0.0)
            acc = acc + slab_ref[r:r + 1, :] * w
        out_ref[:] = acc

    return kernel


def _run_pass(src: jnp.ndarray, plan: _PassPlan, pad_top: int,
              interpret: bool) -> jnp.ndarray:
    """src: (S, W_valid) source rows BEFORE padding; returns (out_h, out_w)."""
    hp, wp = plan.rho.shape
    pad_bot = plan.src_rows - pad_top - src.shape[0]
    src_p = jnp.pad(src.astype(jnp.float32),
                    ((pad_top, pad_bot), (0, wp - src.shape[1])))
    ht, wt, ns = plan.slabs.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ht, wt, ns),
        in_specs=[
            # slab s of tile (i, j): source row-block slabs[i, j, s]
            pl.BlockSpec((8, plan.tw),
                         lambda i, j, s, tab: (tab[i, j, s], j)),
            pl.BlockSpec((plan.th, plan.tw),
                         lambda i, j, s, tab: (i, j)),   # rho tile
        ],
        out_specs=pl.BlockSpec((plan.th, plan.tw),
                               lambda i, j, s, tab: (i, j)),
    )
    out = pl.pallas_call(
        _make_kernel(plan.th, plan.tw),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(plan.slabs), src_p, jnp.asarray(plan.rho))
    return out[:plan.out_h, :plan.out_w]


@partial(jax.jit, static_argnames=("statics", "pad_top", "interpret"))
def _pass1_program(image, rho, slabs, statics, pad_top, interpret):
    return _run_pass(image.astype(jnp.float32),
                     _PassPlan(rho, slabs, *statics), pad_top, interpret)


@partial(jax.jit, static_argnames=("statics", "pad_top", "interpret"))
def _pass2_program(tmp, rho, slabs, statics, pad_top, interpret):
    out_t = _run_pass(tmp.T, _PassPlan(rho, slabs, *statics), pad_top,
                      interpret)
    return out_t.T


def apply_remap_pallas(image: jnp.ndarray, plan: RemapPlan,
                       interpret: bool = False) -> jnp.ndarray:
    """Remap ``image`` ((H_s, W_s), any real dtype) through the plan's
    distortion map; matches apply_distortion_map(..., mode='bilinear') up
    to the two-pass cross-term (docstring above).

    Dispatched as TWO programs (one pallas pass each): fusing both passes
    plus the transposes into one program ran ~12x slower on the tunnel
    runtime (the §7 large-program serialization pathology; measured
    370 ms fused vs ~15 ms/pass split, scripts/bench_remap_overhead.py).
    """
    p1, p2 = plan.pass1, plan.pass2
    tmp = _pass1_program(image, p1.rho, p1.slabs,
                         tuple(p1)[2:], plan.pad_top1, interpret)
    out = _pass2_program(tmp, p2.rho, p2.slabs,
                         tuple(p2)[2:], plan.pad_top2, interpret)
    if jnp.issubdtype(image.dtype, jnp.floating):
        return out.astype(image.dtype)
    return jnp.round(out).astype(image.dtype)
