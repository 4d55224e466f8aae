"""Pure-JAX geometry core: Lie groups, epipolar geometry, weighted 8-point, metrics.

Everything here is jit/vmap-able, works on static shapes with validity masks, and
carries differentiable (stably regularized) gradients. Replaces the reference's
kornia / pytorch3d / OpenCV surface (SURVEY.md section 2.8).
"""

from e2e_multi_view_matching_tpu.geom.lie import (
    hat,
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
)
from e2e_multi_view_matching_tpu.geom.linalg import (
    eig_thresholded_solve,
    inv3x3,
    inv4x4,
    jacobi_eigh,
    safe_eigh,
    smallest_eigvec,
    smallest_eigvec_ii,
    weighted_nullvec,
)
from e2e_multi_view_matching_tpu.geom.epipolar import (
    normalize_keypoints,
    hartley_normalize,
    triangulate_points,
    depth_from_point,
    sym_epipolar_distance,
    motion_from_essential,
)
from e2e_multi_view_matching_tpu.geom.eightpoint import (
    find_fundamental_weighted,
    estimate_relative_pose_w8pt,
)
from e2e_multi_view_matching_tpu.geom.metrics import (
    rotation_angle_error,
    translation_angle_error,
    pose_auc,
)
