"""Host-side OpenCV essential-matrix RANSAC (the upstream `estimate_pose`).

Role of the reference's `models/utils.estimate_pose` (consumed by
`eval_pairs.py:230` and the multi-view init modes `ransac`/`ransac_ba`,
`/root/reference/pose_optimization/multi_view/bundle_adjust_io.py:12-54`):
cv2.findEssentialMat(RANSAC, prob 0.99999) + cv2.recoverPose over all
candidate essentials, keeping the solution with the most points in front.

This is deliberately NOT a device path: RANSAC's data-dependent control flow
is host-shaped; the TPU-native robust alternative is the IRLS-gated w8pt in
`mvba/pipeline.py::robust_relative_poses`.
"""

import numpy as np


def mean_focal(K0, K1):
    """Mean of all four focal lengths (fx0, fy0, fx1, fy1).

    The upstream estimate_pose's expression double-counts fx0/fy1
    (np.mean([K0[0,0], K1[1,1], K0[0,0], K1[1,1]])); averaging all four is the
    correct RANSAC-threshold normalization whenever fx != fy or K0 != K1
    (the MegaDepth/YFCC eval cases).
    """
    return np.mean([K0[0, 0], K0[1, 1], K1[0, 0], K1[1, 1]])


def estimate_pose_ransac(mkpts0, mkpts1, K0, K1, thresh=1.0):
    """RANSAC relative pose from matched pixel keypoints.

    Args:
        mkpts0, mkpts1: (N, 2) matched pixel coordinates.
        K0, K1: (3, 3) intrinsics.
        thresh: inlier threshold in pixels (normalized by mean focal length).
    Returns:
        (R (3, 3), t (3,), inlier_mask (N,) bool) or None on failure.
    """
    import cv2

    if len(mkpts0) < 5:
        return None
    norm_thresh = thresh / mean_focal(K0, K1)
    k0 = (mkpts0 - K0[[0, 1], [2, 2]][None]) / K0[[0, 1], [0, 1]][None]
    k1 = (mkpts1 - K1[[0, 1], [2, 2]][None]) / K1[[0, 1], [0, 1]][None]
    E, mask = cv2.findEssentialMat(
        k0, k1, np.eye(3), threshold=norm_thresh, prob=0.99999, method=cv2.RANSAC
    )
    if E is None:
        return None
    best = None
    for _E in np.split(E, len(E) // 3):
        n, R, t, _ = cv2.recoverPose(_E, k0, k1, np.eye(3), 1e9, mask=mask)
        if best is None or n > best[0]:
            best = (n, R, t[:, 0], mask.ravel() > 0)
    return best[1], best[2], best[3]
