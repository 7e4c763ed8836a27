"""Full reference-pipeline parity: the staged read->dewarp->gray->detect->
NMS->draw->write chain (TestService.cs:137-152) run end to end on the
committed fixtures, checked against the reference's committed overlay
artifact (data/feature_detection_test/15pt_star_fast_detected.jpg, drawn
as filled green radius-5 circles per keypoint, detect_features.py:15-16).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from photogrammetry_tpu.cli.pipeline_demo import build_pipeline
from photogrammetry_tpu.store.content_store import Variant

DATA = "/root/reference/data/feature_detection_test"
STAR = f"{DATA}/15pt_star.png"


@pytest.fixture(scope="module")
def pipe_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("pipe")
    pipe = build_pipeline(coeffs=[0.0] * 5, threshold=50.0,
                          suppression_radius=3.0, max_keypoints=1024,
                          out_dir=str(out), cache_dir=str(out / "maps"))
    (rid,) = pipe.run([STAR], max_workers=2)
    return pipe, rid


def test_chain_produces_all_variants(pipe_run):
    pipe, rid = pipe_run
    for v in (Variant.RGB, Variant.DEWARPED_RGB,
              Variant.DEWARPED_GRAYSCALE, Variant.KEYPOINTS,
              Variant.DENOISED_KEYPOINTS, Variant.OVERLAY,
              Variant.ARTIFACT):
        assert pipe.store.has(rid, v), v


def test_detect_stage_reproduces_reference_count(pipe_run):
    """Raw detection inside the chain = the 128-keypoint oracle
    (keypoint_detection.py:158)."""
    pipe, rid = pipe_run
    pts = pipe.store.fetch(rid, Variant.KEYPOINTS)
    assert int(np.asarray(pts.mask).sum()) == 128


def test_overlay_written_with_nms_survivors(pipe_run):
    import os

    pipe, rid = pipe_run
    path = pipe.store.fetch(rid, Variant.ARTIFACT)
    assert os.path.isfile(path)
    pts = pipe.store.fetch(rid, Variant.DENOISED_KEYPOINTS)
    n = int(np.asarray(pts.mask).sum())
    assert 0 < n < 128  # NMS reduced the raw set
    overlay = pipe.store.fetch(rid, Variant.OVERLAY)
    # drawn squares are green
    coords = np.asarray(pts.coords)[np.asarray(pts.mask)]
    r, c = coords[0]
    assert tuple(overlay[max(r - 3, 0), c]) == (0, 255, 0)


def test_keypoints_match_reference_overlay_artifact(pipe_run):
    """Every detected keypoint falls inside a green marker of the
    reference's committed overlay, and every green marker blob contains
    one of our keypoints — artifact-level parity in both directions."""
    import cv2

    pipe, rid = pipe_run
    pts = pipe.store.fetch(rid, Variant.KEYPOINTS)
    coords = np.asarray(pts.coords)[np.asarray(pts.mask)]  # (128, 2) r,c

    ref = cv2.imread(f"{DATA}/15pt_star_fast_detected.jpg")  # BGR, lossy
    green = (ref[..., 1].astype(int) - ref[..., 0] > 60) & \
            (ref[..., 1].astype(int) - ref[..., 2] > 60)
    assert green.any()

    # (a) our keypoints sit on green markers (disc radius 5 + jpg blur)
    on_marker = green[coords[:, 0], coords[:, 1]]
    assert on_marker.mean() > 0.95
    # (b) green blobs are covered by our keypoints: dilate our keypoint
    # set by the disc radius and require ~all green pixels covered
    cover = np.zeros(green.shape, bool)
    for r, c in coords:
        cover[max(r - 7, 0):r + 8, max(c - 7, 0):c + 8] = True
    assert (green & cover).sum() / green.sum() > 0.95


def test_dewarp_active_in_chain(tmp_path):
    """With the appsettings coefficients the dewarp stage resamples the
    image (output differs from input) before detection, and the distortion
    map lands in the on-disk cache."""
    import os

    pipe = build_pipeline(coeffs=[3e-4, 1e-7, 0, 0, 0], threshold=50.0,
                          suppression_radius=3.0, max_keypoints=1024,
                          out_dir=str(tmp_path), cache_dir=str(tmp_path))
    (rid,) = pipe.run([STAR])
    rgb = pipe.store.fetch(rid, Variant.RGB)
    dew = pipe.store.fetch(rid, Variant.DEWARPED_RGB)
    assert not np.array_equal(np.asarray(rgb), np.asarray(dew))
    assert any(f.endswith(".npz") for f in os.listdir(tmp_path))
    pts = pipe.store.fetch(rid, Variant.DENOISED_KEYPOINTS)
    assert int(np.asarray(pts.mask).sum()) > 0
