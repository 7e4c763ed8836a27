"""Lens dewarp via the rational radial distortion ("distortion-mat") model.

Model (reference derivation in warping.py:33-76 and notes/de_warping.md):
    rd = r * f(r),  f(r) = (1 + k1 r + k2 r^2) / (1 + k3 r + k4 r^2 + k5 r^3)
Inverting for the undistorted radius r at each output pixel yields the monic
cubic  r^3 + B r^2 + C r + D = 0  with
    B = (rd k4 - k1) / (rd k5 - k2)
    C = (rd k3 - 1)  / (rd k5 - k2)
    D =  rd          / (rd k5 - k2)
(warping.py:116-119, DeWarp.cs:69-73), root selection = middle of three real
roots else the single real root (warping.py:127-130).

TPU-native design: the reference loops pixel-by-pixel with an rd^2 -> root
memo dict (111 s naive / 18 s memoized on 1920x1080, BASELINE.md).  Here every
pixel's cubic is solved in closed form at once (core/cubic.py) — no memo, no
loop — and the remap is a batched bilinear gather (the reference defers to
cv2.remap, warping.py:159).  The polar round-trip via arctan/cos/sin
(warping.py:136-139) reduces algebraically to scaling (x, y) by r/rd, which
avoids the trig entirely.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from photogrammetry_tpu.core.cubic import middle_real_root

_EPS = 1e-12


@jax.jit
def solve_undistorted_radius(rd: jnp.ndarray, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Undistorted radius r for distorted radius rd (elementwise).

    coeffs: (5,) [k1..k5].  Degenerate denominators (rd*k5 == k2) are guarded
    with an epsilon; rd == 0 maps to r == 0.
    """
    k1, k2, k3, k4, k5 = (coeffs[i] for i in range(5))
    # Clearing denominators: (k2 - rd k5) r^3 + (k1 - rd k4) r^2
    #                        + (1 - rd k3) r - rd = 0.
    a_lead = k2 - rd * k5
    b_lead = k1 - rd * k4
    c_lin = 1.0 - rd * k3

    den = -a_lead
    den = jnp.where(jnp.abs(den) < _EPS, jnp.where(den < 0, -_EPS, _EPS), den)
    b = -b_lead / den
    c = -c_lin / den
    d = rd / den
    r_cubic = middle_real_root(b, c, d)

    # Degenerate leading coefficient (e.g. k2 = k5 = 0, a pure-k1 model):
    # the equation is a quadratic/linear in r.  The citardauq form
    # 2 rd / (c_lin + sqrt(c_lin^2 + 4 b_lead rd)) is continuous through
    # BOTH degeneracies (b_lead -> 0 gives rd / c_lin exactly).
    disc_q = jnp.maximum(c_lin * c_lin + 4.0 * b_lead * rd, 0.0)
    qden = c_lin + jnp.sqrt(disc_q)
    qden = jnp.where(jnp.abs(qden) < 1e-9,
                     jnp.where(qden < 0, -1e-9, 1e-9), qden)
    r_quad = 2.0 * rd / qden

    # Use the cubic only where its term actually matters — elsewhere its
    # 1/a_lead coefficient blow-up is pure noise (and NaN at exactly 0).
    cubic_sig = jnp.abs(a_lead) * rd ** 3
    rest_sig = jnp.abs(b_lead) * rd ** 2 + jnp.abs(c_lin) * rd + rd
    r = jnp.where(cubic_sig > 1e-4 * rest_sig, r_cubic, r_quad)
    return jnp.where(rd <= 0.0, 0.0, r)


@jax.jit
def solve_distorted_radius_brown(r0: jnp.ndarray,
                                 coeffs: jnp.ndarray) -> jnp.ndarray:
    """Source (distorted) radius r for output (undistorted) radius r0 under
    the Brown even-power model r0 = r g(r), g = 1 + k1 r^2 + k2 r^4
    + k3 r^6 (notes/de_warping.md "Alternate Method 3").  Newton with a
    static trip count from r = r0 — jittable, no data-dependent loop."""
    coeffs = jnp.asarray(coeffs, jnp.float32)
    k1, k2, k3 = coeffs[0], coeffs[1], coeffs[2]
    r = r0
    for _ in range(12):
        r2 = r * r
        g = 1.0 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
        gp = 2.0 * k1 * r + 4.0 * k2 * r ** 3 + 6.0 * k3 * r ** 5
        h = r * g - r0
        hp = g + r * gp
        hp = jnp.where(jnp.abs(hp) < 1e-6,
                       jnp.where(hp < 0, -1e-6, 1e-6), hp)
        r = r - h / hp
    return jnp.where(r0 <= 0.0, 0.0, r)


@partial(jax.jit, static_argnames=("height", "width"))
def generate_distortion_map_brown(height: int, width: int,
                                  coeffs) -> jnp.ndarray:
    """(H, W, 2) map for the Brown model: output (undistorted) pixel ->
    source (row, col) in the distorted input.  Same layout/conventions as
    generate_distortion_map; consumed by the same apply_distortion_map."""
    coeffs = jnp.asarray(coeffs, jnp.float32)
    x0 = height / 2.0
    y0 = width / 2.0
    u = jnp.arange(height, dtype=jnp.float32)[:, None]
    v = jnp.arange(width, dtype=jnp.float32)[None, :]
    x = (u - x0) * jnp.ones_like(v)
    y = (v - y0) * jnp.ones_like(u)
    r_out = jnp.sqrt(x * x + y * y)
    r_src = solve_distorted_radius_brown(r_out, coeffs)
    scale = jnp.where(r_out > 0.0, r_src / jnp.maximum(r_out, _EPS), 1.0)
    return jnp.stack([x * scale + x0, y * scale + y0], axis=-1)


@partial(jax.jit, static_argnames=("height", "width", "quantize"))
def generate_distortion_map(height: int, width: int, coeffs,
                            quantize: bool = False) -> jnp.ndarray:
    """(H, W, 2) float32 map: output pixel (u, v) -> source (row, col).

    With quantize=True source coordinates are truncated to integers, matching
    the reference's int cast (warping.py:142-144) for parity testing; the
    default keeps sub-pixel precision for the bilinear remap.
    """
    coeffs = jnp.asarray(coeffs, jnp.float32)
    # Center convention per warping.py:84-85: x spans rows, y spans cols.
    x0 = height / 2.0
    y0 = width / 2.0
    u = jnp.arange(height, dtype=jnp.float32)[:, None]
    v = jnp.arange(width, dtype=jnp.float32)[None, :]
    # The reference int-truncates the centered offsets (warping.py:107-108).
    x = jnp.trunc(u - x0) * jnp.ones_like(v)
    y = jnp.trunc(v - y0) * jnp.ones_like(u)

    rd = jnp.sqrt(x * x + y * y)
    r = solve_undistorted_radius(rd, coeffs)
    scale = jnp.where(rd > 0.0, r / jnp.maximum(rd, _EPS), 1.0)

    src_row = x * scale + x0
    src_col = y * scale + y0
    if quantize:
        src_row = jnp.trunc(src_row)
        src_col = jnp.trunc(src_col)
    return jnp.stack([src_row, src_col], axis=-1)


@partial(jax.jit, static_argnames=("height", "width"))
def generate_synthetic_distortion_map(height: int, width: int,
                                      coeffs) -> jnp.ndarray:
    """(H, W, 2) map that SYNTHESIZES a distorted image from a clean one —
    the exact inverse of the dewarp (generate_distortion_map): each output
    (captured-frame) pixel at radius r samples the clean image at radius
    r * f(r), so apply_distortion_map(clean, this) produces the image the
    reference's camera would have captured of `clean`, and dewarping that
    with generate_distortion_map(coeffs) recovers `clean`.  Used to build
    ground-truth-distorted calibration fixtures from real photographs
    (tests/test_real_photos.py)."""
    coeffs = jnp.asarray(coeffs, jnp.float32)
    k1, k2, k3, k4, k5 = (coeffs[i] for i in range(5))
    x0 = height / 2.0
    y0 = width / 2.0
    u = jnp.arange(height, dtype=jnp.float32)[:, None]
    v = jnp.arange(width, dtype=jnp.float32)[None, :]
    x = (u - x0) * jnp.ones_like(v)
    y = (v - y0) * jnp.ones_like(u)
    r = jnp.sqrt(x * x + y * y)
    f = (1.0 + k1 * r + k2 * r ** 2) / (1.0 + k3 * r + k4 * r ** 2
                                        + k5 * r ** 3)
    return jnp.stack([x * f + x0, y * f + y0], axis=-1)


def make_distortion_applier(dist_map, src_shape: tuple,
                            use_pallas: bool | None = None,
                            tile: tuple = (32, 512)):
    """Fastest-available remap closure for a FIXED distortion map.

    On TPU backends this builds the separable two-pass Pallas plan
    (kernels/remap.py: 2-3 ms per 1080p apply vs ~90 ms for the gather
    path — and 3-8x faster than the reference's cv2.remap headline,
    warping.py:149-161); elsewhere — or when the map's horizontal
    coordinate folds and the plan is rejected — it falls back to the
    exact XLA gather path.  The plan is built once (device-resident), so
    per-frame applies carry no host->device plan traffic.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    if use_pallas:
        import numpy as _np

        from photogrammetry_tpu.kernels.remap import (
            apply_remap_pallas, build_remap_plan,
        )

        plan = build_remap_plan(_np.asarray(dist_map), src_shape,
                                tile=tile)
        if plan is not None:
            def fast(image):
                if image.ndim == 2:
                    return apply_remap_pallas(image, plan)
                return jnp.stack([apply_remap_pallas(image[..., c], plan)
                                  for c in range(image.shape[-1])],
                                 axis=-1)

            return fast
    dmap = jnp.asarray(dist_map)
    return lambda image: apply_distortion_map(image, dmap)


@partial(jax.jit, static_argnames=("mode",))
def apply_distortion_map(image: jnp.ndarray, dist_map: jnp.ndarray,
                         mode: str = "bilinear") -> jnp.ndarray:
    """Remap ``image`` through ``dist_map`` ((H, W, 2) source coords).

    mode='bilinear' matches cv2.remap INTER_LINEAR with zero border
    (warping.py:159); mode='nearest' matches the reference's naive integer
    lookup (warping.py:164-177).  Works on (H, W) or (H, W, C) images.
    """
    squeeze = image.ndim == 2
    img = image[..., None] if squeeze else image
    h, w, _ = img.shape
    imgf = img.astype(jnp.float32)
    sr = dist_map[..., 0]
    sc = dist_map[..., 1]

    if mode == "nearest":
        ri = jnp.clip(sr.astype(jnp.int32), 0, h - 1)
        ci = jnp.clip(sc.astype(jnp.int32), 0, w - 1)
        valid = (sr >= 0) & (sr <= h - 1) & (sc >= 0) & (sc <= w - 1)
        out = jnp.where(valid[..., None], imgf[ri, ci], 0.0)
    elif mode == "bilinear":
        r0 = jnp.floor(sr)
        c0 = jnp.floor(sc)
        fr = (sr - r0)[..., None]
        fc = (sc - c0)[..., None]
        r0i = r0.astype(jnp.int32)
        c0i = c0.astype(jnp.int32)

        def tap(dr, dc):
            rr = r0i + dr
            cc = c0i + dc
            inside = (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
            val = imgf[jnp.clip(rr, 0, h - 1), jnp.clip(cc, 0, w - 1)]
            return jnp.where(inside[..., None], val, 0.0)

        out = (tap(0, 0) * (1 - fr) * (1 - fc) + tap(0, 1) * (1 - fr) * fc
               + tap(1, 0) * fr * (1 - fc) + tap(1, 1) * fr * fc)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    out = out.astype(image.dtype) if jnp.issubdtype(image.dtype, jnp.floating) \
        else jnp.round(out).astype(image.dtype)
    return out[..., 0] if squeeze else out
