from photogrammetry_tpu.ops.grayscale import bgr_to_gray_cv2, rgb_to_gray_mean
from photogrammetry_tpu.ops.fast import fast_score_map, extract_keypoints
from photogrammetry_tpu.ops.brief import gaussian_pairs, brief_descriptors
from photogrammetry_tpu.ops.match import (
    hamming_distance_matrix,
    mutual_nearest_matches,
    greedy_global_matches,
    sorted_candidate_matches,
    motion_consistency_mask,
)
from photogrammetry_tpu.ops.nms import anms_keypoints, nms_keypoints
from photogrammetry_tpu.ops.dewarp import (
    generate_distortion_map,
    apply_distortion_map,
    make_distortion_applier,
    solve_undistorted_radius,
)
from photogrammetry_tpu.ops.cluster import grid_cluster_keypoints
from photogrammetry_tpu.ops.calibrate import (
    calibrate_distortion,
    calibrate_from_image,
    distort_points,
    distort_points_brown,
    undistort_points,
    undistort_points_brown,
)
from photogrammetry_tpu.ops.refine import (
    refine_subpixel,
    refine_subpixel_dense,
)
