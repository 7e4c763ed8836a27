"""Pallas kernels vs their XLA reference implementations (interpret mode)."""
import numpy as np
import jax.numpy as jnp

from photogrammetry_tpu.kernels.hamming import hamming_distance_matrix_pallas
from photogrammetry_tpu.kernels.fast_stencil import fast_score_map_pallas
from photogrammetry_tpu.ops.match import hamming_distance_matrix
from photogrammetry_tpu.ops.fast import fast_score_map


def test_hamming_kernel_matches_reference():
    rng = np.random.default_rng(30)
    b1 = rng.integers(0, 2, (200, 256)).astype(np.uint8)
    b2 = rng.integers(0, 2, (150, 256)).astype(np.uint8)
    ref = np.asarray(hamming_distance_matrix(b1, b2))
    got = np.asarray(hamming_distance_matrix_pallas(b1, b2, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_hamming_kernel_tile_aligned():
    rng = np.random.default_rng(31)
    b1 = rng.integers(0, 2, (256, 256)).astype(np.uint8)
    b2 = rng.integers(0, 2, (128, 256)).astype(np.uint8)
    ref = np.asarray(hamming_distance_matrix(b1, b2))
    got = np.asarray(hamming_distance_matrix_pallas(b1, b2, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_fast_stencil_matches_reference():
    rng = np.random.default_rng(32)
    img = rng.integers(0, 255, (200, 180)).astype(np.float32)
    ref = np.asarray(fast_score_map(img, 30.0))
    got = np.asarray(fast_score_map_pallas(img, 30.0, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_fast_stencil_tile_multiple():
    rng = np.random.default_rng(33)
    img = rng.integers(0, 255, (256, 256)).astype(np.float32)
    ref = np.asarray(fast_score_map(img, 50.0))
    got = np.asarray(fast_score_map_pallas(img, 50.0, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_schur_products_kernel_matches_einsum():
    from photogrammetry_tpu.kernels.schur import schur_products_pallas
    rng = np.random.default_rng(3)
    f, t = 5, 700  # non-aligned on purpose (rows 30 -> 32, cols 2100 -> 2560)
    w_hinv = jnp.asarray(rng.normal(size=(f, t, 6, 3)), jnp.float32)
    w_cp = jnp.asarray(rng.normal(size=(f, t, 6, 3)), jnp.float32)
    b_p = jnp.asarray(rng.normal(size=(t, 3)), jnp.float32)
    s_ref = np.einsum("ftik,gtjk->fgij", w_hinv, w_cp)
    c_ref = np.einsum("ftik,tk->fi", w_hinv, b_p)
    s, c = schur_products_pallas(w_hinv, w_cp, b_p, interpret=True)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(c), c_ref, rtol=2e-5, atol=2e-3)


def test_schur_products_kernel_tile_aligned():
    from photogrammetry_tpu.kernels.schur import schur_products_pallas
    rng = np.random.default_rng(4)
    f, t = 16, 1024  # rows 96 -> 96 (8-mult), cols 3072 = 6 tiles
    w_hinv = jnp.asarray(rng.normal(size=(f, t, 6, 3)), jnp.float32)
    w_cp = jnp.asarray(rng.normal(size=(f, t, 6, 3)), jnp.float32)
    b_p = jnp.asarray(rng.normal(size=(t, 3)), jnp.float32)
    s_ref = np.einsum("ftik,gtjk->fgij", w_hinv, w_cp)
    c_ref = np.einsum("ftik,tk->fi", w_hinv, b_p)
    s, c = schur_products_pallas(w_hinv, w_cp, b_p, interpret=True)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=2e-5, atol=5e-3)
    np.testing.assert_allclose(np.asarray(c), c_ref, rtol=2e-5, atol=5e-3)


def test_brief_pack_interpret_parity():
    """kernels/brief_pack dense packed-BRIEF == ops.brief.brief_bits
    bit-for-bit (interpret mode; the kernel is a documented negative perf
    result on the current toolchain but must stay correct)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from photogrammetry_tpu.kernels.brief_pack import brief_bits_packed
    from photogrammetry_tpu.ops.brief import brief_bits, gaussian_pairs

    key = jax.random.PRNGKey(3)
    pairs = gaussian_pairs(key)
    img = jax.random.uniform(key, (240, 320)) * 255
    coords = jnp.stack([jax.random.randint(key, (256,), 0, 240),
                        jax.random.randint(key, (256,), 0, 320)], -1)
    ref = np.asarray(brief_bits(img, coords, pairs))
    got = np.asarray(brief_bits_packed(img, coords, pairs, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_refine_dense_matches_gather():
    """refine_subpixel_dense (box-filter formulation, the production
    default) agrees with the windowed-gather formulation to f32 rounding
    away from borders (measured max 0.004 px on the real 1080p frame)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from photogrammetry_tpu.ops.refine import (
        refine_subpixel, refine_subpixel_dense,
    )

    key = jax.random.PRNGKey(5)
    img = jax.random.uniform(key, (200, 280)) * 255
    coords = jnp.stack([jax.random.randint(key, (512,), 5, 195),
                        jax.random.randint(key, (512,), 5, 275)], -1)
    a = np.asarray(refine_subpixel(img, coords))
    b = np.asarray(refine_subpixel_dense(img, coords))
    np.testing.assert_allclose(a, b, atol=0.02)


def test_remap_kernel_axis_aligned_exact():
    """Separable two-pass remap is EXACT for axis-aligned warps."""
    from photogrammetry_tpu.kernels.remap import (
        apply_remap_pallas, build_remap_plan,
    )
    from photogrammetry_tpu.ops.dewarp import apply_distortion_map

    rng = np.random.default_rng(40)
    h, w = 96, 192
    img = rng.integers(0, 255, (h, w)).astype(np.float32)
    rows = np.arange(h)[:, None] * np.ones((1, w))
    cols = np.arange(w)[None, :] * np.ones((h, 1))
    for sr, sc in [(rows, cols), (rows + 2.5, cols - 3.25),
                   (rows * 0.8 + 5.3, cols * 0.9 + 2.0),
                   (rows - 20.5, cols + 30.2)]:
        dmap = np.stack([sr, sc], axis=-1).astype(np.float32)
        ref = np.asarray(apply_distortion_map(jnp.asarray(img),
                                              jnp.asarray(dmap),
                                              mode="bilinear"))
        plan = build_remap_plan(dmap, (h, w), tile=(32, 128))
        assert plan is not None
        out = np.asarray(apply_remap_pallas(jnp.asarray(img), plan,
                                            interpret=True))
        np.testing.assert_allclose(out, ref, atol=5e-3)


def test_remap_kernel_radial_close():
    """On the rational radial model the two-pass cross-term is sub-percent
    in the mean (worst-case white-noise image; natural images are far
    closer) — and the horizontally-folded rejection path returns None."""
    from photogrammetry_tpu.kernels.remap import (
        apply_remap_pallas, build_remap_plan,
    )
    from photogrammetry_tpu.ops.dewarp import (
        apply_distortion_map, generate_distortion_map,
    )

    rng = np.random.default_rng(41)
    h, w = 135, 240
    img = rng.integers(0, 255, (h, w)).astype(np.float32)
    dmap = np.asarray(generate_distortion_map(h, w, (1.2e-3, 1.6e-6,
                                                     0, 0, 0)))
    ref = np.asarray(apply_distortion_map(jnp.asarray(img),
                                          jnp.asarray(dmap),
                                          mode="bilinear"))
    plan = build_remap_plan(dmap, (h, w), tile=(32, 128))
    assert plan is not None
    out = np.asarray(apply_remap_pallas(jnp.asarray(img), plan,
                                        interpret=True))
    err = np.abs(out - ref)
    assert err.mean() < 2.0 and err.max() < 30.0

    # a fold in the horizontal map must be rejected (fallback path)
    bad = dmap.copy()
    bad[..., 1] = np.abs(np.arange(w)[None, :] - w / 2.0) \
        * np.ones((h, 1))
    assert build_remap_plan(bad, (h, w)) is None


def test_fast_stencil_batch_matches_reference():
    """Grid-batched stencil (frames in the kernel grid) is bit-exact with
    the per-frame XLA stencil (VERDICT r4 item 6)."""
    from photogrammetry_tpu.kernels.fast_stencil import (
        fast_score_map_pallas_batch,
    )

    rng = np.random.default_rng(33)
    imgs = rng.integers(0, 255, (3, 200, 180)).astype(np.float32)
    ref = np.stack([np.asarray(fast_score_map(i, 30.0)) for i in imgs])
    got = np.asarray(fast_score_map_pallas_batch(jnp.asarray(imgs), 30.0,
                                                 interpret=True))
    np.testing.assert_array_equal(got, ref)
