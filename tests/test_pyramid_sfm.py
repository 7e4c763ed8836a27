"""Scale/rotation invariance of the FLAGSHIP tracking frontend
(VERDICT r4 item 2): the pyramid and steered-BRIEF frontends must be
usable from run_incremental_sfm/SfmConfig, and must survive sequences
where the single-scale/unoriented reference-parity descriptor
(Keypoint.cs:29-57) demonstrably degrades.
"""
import numpy as np
import pytest

from photogrammetry_tpu.sfm.frontend import FrontendConfig
from photogrammetry_tpu.sfm.incremental import (
    SfmConfig, reconstruction_quality, run_incremental_sfm,
)
from photogrammetry_tpu.sfm.metrics import absolute_trajectory_error
from photogrammetry_tpu.synth.star_scene import (
    StarSceneConfig, dolly_trajectory, generate_custom_sequence,
    roll_trajectory,
)


def _run(scene, **cfg_kw):
    base = dict(frontend=FrontendConfig(
        suppression_radius=4.0, hamming_threshold=80, max_keypoints=256,
        detection_threshold=20.0,
        oriented_brief=cfg_kw.pop("oriented_brief", False)))
    base.update(cfg_kw)
    res = run_incremental_sfm(scene["frames"], scene["k"],
                              SfmConfig(**base))
    gt = scene["centers"].astype(np.float32)
    ate = float(absolute_trajectory_error(
        np.asarray(res.camera_centers, np.float32), gt))
    support, med = reconstruction_quality(res, scene["k"])
    return ate, support, med


@pytest.mark.slow
def test_pyramid_survives_dolly_scale_change():
    """~1.9x apparent-scale growth over 8 frames: the merged-octave
    frontend must keep the reconstruction together; single-scale support
    must be measurably worse (it loses the cross-scale matches)."""
    cfg = StarSceneConfig(num_frames=8, image_size=(240, 320),
                          focal=260.0, supersample=2)
    rs, ts, centers = dolly_trajectory(cfg, z_travel=2.8, lateral=0.5)
    scene = generate_custom_sequence(cfg, rs, ts, centers)

    ate1, sup1, _ = _run(scene)
    ate2, sup2, _ = _run(scene, pyramid_octaves=2, track_capacity=2048)
    # pyramid must reconstruct the dolly well and hold more of the map
    assert ate2 < 0.12, (ate1, ate2, sup1, sup2)
    assert sup2 > sup1 * 1.15, (sup1, sup2)


@pytest.mark.slow
def test_oriented_brief_matching_survives_roll():
    """The steered-BRIEF flagship frontend keeps gated match chains alive
    across large in-plane roll where plain BRIEF collapses — asserted at
    the tracking-frontend level, through the SAME batched
    precompute_frontend/precompute_matching path run_incremental_sfm uses
    (full-sequence roll SfM additionally fights bootstrap geometry, so
    matching is the right level to pin the invariance)."""
    import cv2
    import jax
    import jax.numpy as jnp

    from photogrammetry_tpu.cli.common import load_gray
    from photogrammetry_tpu.sfm.frontend import (
        make_pairs, precompute_frontend, precompute_matching,
    )

    # real photo texture: intensity-centroid orientations are undefined
    # on the synthetic scene's circularly-symmetric dots
    g = load_gray("/root/reference/data/feature_matching_test/"
                  "lego_space_1_from_left.jpg")
    g = cv2.resize(np.asarray(g), (800, 600))
    h, w = g.shape
    def rot(deg):
        m = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0)
        return cv2.warpAffine(g, m, (w, h))
    frames = jnp.asarray(np.stack([g, rot(15.0), rot(30.0)]), jnp.float32)

    def gated(oriented):
        fc = FrontendConfig(suppression_radius=4.0, hamming_threshold=75,
                            max_keypoints=512, detection_threshold=50.0,
                            subpixel=False, oriented_brief=oriented)
        feats = precompute_frontend(frames, make_pairs(fc), fc)
        pm = precompute_matching(feats, fc, jax.random.PRNGKey(0),
                                 len(frames), 1.5, 500)
        # skip-frame pair (2, 0): 30 degrees of roll
        return int(np.asarray(jnp.sum(pm.good2[2])))

    n_plain = gated(False)
    n_orb = gated(True)
    assert n_orb >= 2 * max(n_plain, 1), (n_plain, n_orb)
    assert n_orb >= 20, (n_plain, n_orb)
