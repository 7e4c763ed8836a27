"""Per-stage warm timings of the incremental-SfM loop on the real chip."""
from __future__ import annotations

import os
import time

import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from photogrammetry_tpu.sfm.ba import BAProblem, BAState, bundle_adjust
from photogrammetry_tpu.sfm.epipolar import ransac_fundamental
from photogrammetry_tpu.sfm.frontend import (
    detect_and_describe_split, make_pairs, match_pair,
)
from photogrammetry_tpu.sfm.incremental import (
    SfmConfig, _prune_observations, _triangulate_tracks_nview,
)
from photogrammetry_tpu.sfm.tracks import make_track_table
from photogrammetry_tpu.sfm.two_view import two_view_pipeline
from photogrammetry_tpu.synth.star_scene import (
    StarSceneConfig, generate_sequence,
)


def _force(out):
    """block_until_ready is a no-op on the tunnel runtime (tpu_notes §0);
    only a value read proves completion."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    import jax.numpy as jnp

    return float(jnp.ravel(jnp.asarray(leaf, jnp.float32))[0])


def timeit(name, fn, *args, iters=10):
    t0 = time.perf_counter()
    _force(fn(*args))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.2f} ms (first {c:.0f}s)", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    scene = generate_sequence(StarSceneConfig(num_frames=8, supersample=2))
    cfg = SfmConfig()
    fc = cfg.frontend
    pairs = make_pairs(fc)
    kmat = jnp.asarray(scene["k"], jnp.float32)
    g0 = jnp.asarray(scene["frames"][0], jnp.float32)
    g1 = jnp.asarray(scene["frames"][1], jnp.float32)

    timeit("frontend split", lambda im: detect_and_describe_split(
        im, pairs, fc), g0)
    f0 = detect_and_describe_split(g0, pairs, fc)
    f1 = detect_and_describe_split(g1, pairs, fc)
    timeit("match_pair", lambda: match_pair(f1, f0, fc))
    m = match_pair(f1, f0, fc)
    key = jax.random.PRNGKey(0)
    timeit("ransac_fundamental (gate, 500 hyp)",
           lambda: ransac_fundamental(key, m.xy1, m.xy2, m.mask,
                                      threshold=cfg.ransac_threshold,
                                      num_samples=cfg.ransac_samples // 2))
    timeit("two_view_pipeline (1000 hyp)",
           lambda: two_view_pipeline(key, m.xy1, m.xy2, m.mask, kmat,
                                     threshold=cfg.ransac_threshold,
                                     num_samples=cfg.ransac_samples))

    nf, cap = 8, cfg.track_capacity
    table = make_track_table(nf, cap, fc.max_keypoints)
    rs = jnp.tile(jnp.eye(3)[None], (nf, 1, 1))
    ts = jnp.zeros((nf, 3))
    state = BAState(rs=rs, ts=ts, points=table.points)
    prob = BAProblem(obs=table.obs, mask=table.obs_mask, k=kmat)
    fixed = jnp.ones((nf,)).at[0].set(0.0)
    timeit("motion-only BA (10 it)", lambda: bundle_adjust(
        state, prob, num_iterations=10, fixed_cameras=fixed,
        optimize_points=False))
    timeit("windowed full BA (15 it)", lambda: bundle_adjust(
        state, prob, num_iterations=15, fixed_cameras=fixed))
    timeit("triangulate nview", lambda: _triangulate_tracks_nview(
        table, rs, ts, kmat, 1e-3, 1e3))
    timeit("prune", lambda: _prune_observations(table, rs, ts, kmat, 3.0))


if __name__ == "__main__":
    main()
