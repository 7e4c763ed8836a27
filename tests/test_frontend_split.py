"""Split-frontend and static-NMS equivalence (the TPU fast-path forms must
be bit-identical to the reference-semantics forms)."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np

from photogrammetry_tpu.ops import bgr_to_gray_cv2
from photogrammetry_tpu.ops.fast import extract_keypoints, fast_score_map
from photogrammetry_tpu.ops.nms import (
    nms_keypoints, nms_keypoints_parallel, nms_keypoints_static,
)
from photogrammetry_tpu.sfm.frontend import (
    FrontendConfig, detect_and_describe, detect_and_describe_split,
    make_pairs,
)

STAR = "/root/reference/data/feature_matching_test/15pt_star.png"


def load(path):
    return jnp.asarray(np.asarray(bgr_to_gray_cv2(cv2.imread(path))),
                       jnp.float32)


def test_static_nms_equals_while_and_sequential():
    g = load(STAR)
    pts = extract_keypoints(fast_score_map(g, 50.0), 512, order="score")
    for radius in (4.0, 25.0, 50.0):
        a = nms_keypoints_parallel(pts, radius)
        b = nms_keypoints_static(pts, radius)
        c = nms_keypoints(pts, radius)
        assert bool(jnp.all(a.mask == b.mask)), radius
        assert bool(jnp.all(a.mask == c.mask)), radius
        assert int(a.count) == int(b.count) == int(c.count)


def test_static_nms_noise_frame():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.integers(0, 255, (240, 320)), jnp.float32)
    pts = extract_keypoints(fast_score_map(g, 50.0), 1024, order="score")
    for radius in (4.0, 50.0):
        a = nms_keypoints_parallel(pts, radius)
        b = nms_keypoints_static(pts, radius)
        assert bool(jnp.all(a.mask == b.mask))


def test_split_equals_fused():
    g = load(STAR)
    for reduction in ("nms", "anms", "cluster", "none"):
        cfg = FrontendConfig(detection_threshold=50.0, max_keypoints=256,
                             reduction=reduction, suppression_radius=4.0)
        pairs = make_pairs(cfg)
        fused = detect_and_describe(g, pairs, cfg)
        split = detect_and_describe_split(g, pairs, cfg)
        assert bool(jnp.all(fused.points.coords == split.points.coords))
        assert bool(jnp.all(fused.points.mask == split.points.mask))
        assert bool(jnp.all(fused.bits == split.bits)), reduction
        np.testing.assert_allclose(np.asarray(fused.xy),
                                   np.asarray(split.xy), atol=0)


def test_batch_split_equals_batch():
    from photogrammetry_tpu.sfm.frontend import (
        detect_and_describe_batch, detect_and_describe_batch_split,
    )
    g = load(STAR)
    grays = jnp.stack([g, g[::-1]])
    cfg = FrontendConfig(detection_threshold=50.0, max_keypoints=128,
                         reduction="nms", suppression_radius=4.0)
    pairs = make_pairs(cfg)
    a = detect_and_describe_batch(grays, pairs, cfg)
    b = detect_and_describe_batch_split(grays, pairs, cfg)
    assert bool(jnp.all(a.points.coords == b.points.coords))
    assert bool(jnp.all(a.bits == b.bits))
    np.testing.assert_array_equal(np.asarray(a.xy), np.asarray(b.xy))


def test_split_no_subpixel():
    g = load(STAR)
    cfg = FrontendConfig(detection_threshold=50.0, max_keypoints=128,
                         reduction="nms", suppression_radius=4.0,
                         subpixel=False)
    pairs = make_pairs(cfg)
    fused = detect_and_describe(g, pairs, cfg)
    split = detect_and_describe_split(g, pairs, cfg)
    np.testing.assert_array_equal(np.asarray(fused.xy), np.asarray(split.xy))
