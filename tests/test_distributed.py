"""Distributed BA tests on a virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photogrammetry_tpu.parallel.mesh import make_mesh
from photogrammetry_tpu.parallel.dist_ba import (
    distributed_bundle_adjust, shard_problem,
)
from photogrammetry_tpu.sfm.ba import bundle_adjust
from photogrammetry_tpu.sfm.metrics import absolute_trajectory_error
from tests.test_ba import make_problem, camera_centers


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def pad_tracks(state, prob, multiple=8):
    """Pad track capacity to a multiple of the mesh size."""
    t = state.points.shape[0]
    pad = (-t) % multiple
    if pad == 0:
        return state, prob
    points = jnp.concatenate([state.points, jnp.zeros((pad, 3))])
    obs = jnp.concatenate([prob.obs, jnp.zeros_like(prob.obs[:, :pad])], axis=1)
    mask = jnp.concatenate([prob.mask, jnp.zeros_like(prob.mask[:, :pad])],
                           axis=1)
    return (state._replace(points=points),
            prob._replace(obs=obs, mask=mask))


def test_distributed_matches_single_device():
    state, prob, rs_gt, ts_gt, centers_gt, pts_gt = make_problem()
    state, prob = pad_tracks(state, prob)
    mesh = make_mesh()

    res_single = bundle_adjust(state, prob, num_iterations=15)
    res_dist = distributed_bundle_adjust(state, prob, mesh,
                                         num_iterations=15)
    # Both must reach the same optimum (identical math; psum vs local sum
    # reassociation causes only float-level differences).
    assert float(res_dist.cost) == pytest.approx(float(res_single.cost),
                                                 rel=1e-3)
    np.testing.assert_allclose(np.asarray(res_dist.state.rs),
                               np.asarray(res_single.state.rs), atol=1e-3)
    np.testing.assert_allclose(np.asarray(res_dist.state.ts),
                               np.asarray(res_single.state.ts), atol=1e-3)


def test_distributed_converges():
    state, prob, rs_gt, ts_gt, centers_gt, pts_gt = make_problem()
    state, prob = pad_tracks(state, prob)
    mesh = make_mesh()
    res = distributed_bundle_adjust(state, prob, mesh, num_iterations=25)
    est = camera_centers(res.state.rs, res.state.ts)
    ate = float(absolute_trajectory_error(jnp.asarray(est),
                                          jnp.asarray(centers_gt)))
    assert ate < 0.01, ate


def test_gspmd_sharded_inputs_run():
    """GSPMD path: unmodified bundle_adjust on sharded inputs."""
    state, prob, *_ , centers_gt, _ = make_problem()
    state, prob = pad_tracks(state, prob)
    mesh = make_mesh()
    state_s, prob_s = shard_problem(state, prob, mesh)
    res = bundle_adjust(state_s, prob_s, num_iterations=15)
    res_ref = bundle_adjust(state, prob, num_iterations=15)
    assert float(res.cost) == pytest.approx(float(res_ref.cost), rel=1e-3)


@pytest.mark.slow
def test_incremental_sfm_on_mesh():
    """Full incremental SfM with windowed BA distributed over the mesh."""
    from photogrammetry_tpu.sfm.frontend import FrontendConfig
    from photogrammetry_tpu.sfm.incremental import SfmConfig, run_incremental_sfm
    from photogrammetry_tpu.synth.star_scene import (
        StarSceneConfig, generate_sequence,
    )

    scene = generate_sequence(StarSceneConfig(num_frames=5))
    cfg = SfmConfig(frontend=FrontendConfig(
        detection_threshold=20.0, max_keypoints=256, reduction="nms",
        suppression_radius=4.0, hamming_threshold=80),
        track_capacity=1024, mesh=make_mesh())
    res = run_incremental_sfm(scene["frames"], scene["k"], cfg)
    assert len(res.points) > 20
    assert np.isfinite(res.camera_centers).all()


def test_frame_parallel_frontend_sharded():
    """Data-parallel frontend: the batch axis of
    detect_and_describe_batch_split sharded over the 8-device mesh (each
    device detects its frames; GSPMD inserts no collectives — the op is
    batch-elementwise).  Results match the unsharded run exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from photogrammetry_tpu.sfm.frontend import (
        FrontendConfig, detect_and_describe_batch_split, make_pairs,
    )

    rng = np.random.default_rng(5)
    frames = jnp.asarray(rng.integers(0, 255, (8, 96, 128)), jnp.float32)
    cfg = FrontendConfig(detection_threshold=30.0, max_keypoints=64,
                         reduction="nms", suppression_radius=3.0)
    pairs = make_pairs(cfg)

    ref = detect_and_describe_batch_split(frames, pairs, cfg)

    mesh = make_mesh()
    sharded = jax.device_put(
        frames, NamedSharding(mesh, P("tracks")))  # 1 frame per device
    out = detect_and_describe_batch_split(sharded, pairs, cfg)
    np.testing.assert_array_equal(np.asarray(out.points.coords),
                                  np.asarray(ref.points.coords))
    np.testing.assert_array_equal(np.asarray(out.bits),
                                  np.asarray(ref.bits))
    np.testing.assert_array_equal(np.asarray(out.xy), np.asarray(ref.xy))
