"""Differentiable confidence-weighted eight-point relative pose estimation.

Re-designs `/root/reference/pose_optimization/two_view/estimate_relative_pose.py`
(`find_fundamental` :34-82, `estimate_relative_pose_w8pt` :84-128) TPU-first:

- The weighted DLT null vector comes from a 9x9 Gram eigendecomposition
  (`weighted_nullvec`) instead of a tall-matrix SVD: one MXU matmul + tiny eigh,
  with gap-clamped gradients (see geom/linalg.py).
- The rank-2 projection of F is `F - sigma3 * u3 v3^T` with u3/v3 from 3x3 Gram
  eigh -- again no SVD in the differentiable path.
- `choose_closest` (training) and cheirality selection (eval) are both branchless
  `argmin`/`argmax` gathers so the whole function jits to a single XLA program.
- Invalid matches are expressed through zero confidence weights, never ragged
  shapes; the reference's `< 8 matches -> None` early-out becomes a validity flag.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp

from e2e_multi_view_matching_tpu.geom.epipolar import (
    cheirality_scores,
    hartley_normalize,
    motion_from_essential,
    normalize_keypoints,
    sym_epipolar_distance,
    two_ray_depths,
)
from e2e_multi_view_matching_tpu.geom.lie import make_transform
from e2e_multi_view_matching_tpu.geom.linalg import smallest_eigvec_ii, weighted_nullvec
from e2e_multi_view_matching_tpu.geom.metrics import (
    rotation_angle_error,
    translation_angle_error,
)

_EPS = 1e-8


class W8ptInfo(NamedTuple):
    """Side outputs matching the reference's `info` dict
    (`estimate_relative_pose.py:126-127`)."""

    kpts0_norm: jnp.ndarray  # (B, N, 2)
    kpts1_norm: jnp.ndarray  # (B, N, 2)
    confidence: jnp.ndarray  # (B, N) normalized weights
    inliers: Optional[jnp.ndarray]  # (B, N) bool or None
    pos_depth_mask: jnp.ndarray  # (B, N) bool
    F: jnp.ndarray  # (B, 3, 3) fundamental (in normalized coords = essential)
    valid: jnp.ndarray  # (B,) bool: enough effective matches


def _rank2_project(F):
    """Project (..., 3, 3) onto the rank-2 manifold: F - sigma3 u3 v3^T."""
    v3 = smallest_eigvec_ii(jnp.swapaxes(F, -1, -2) @ F, n_iters=4)
    u3 = smallest_eigvec_ii(F @ jnp.swapaxes(F, -1, -2), n_iters=4)
    sigma3 = jnp.einsum("...i,...ij,...j->...", u3, F, v3)
    return F - sigma3[..., None, None] * (u3[..., :, None] * v3[..., None, :])


def find_fundamental_weighted(x0, x1, w):
    """Weighted 8-point DLT on (already camera-normalized) correspondences.

    Args:
        x0, x1: (B, N, 2); w: (B, N) non-negative weights (need not be normalized).
    Returns:
        (B, 3, 3) rank-2 fundamental matrix, Frobenius-normalized.
    """
    x0n, T0 = hartley_normalize(x0, w)
    x1n, T1 = hartley_normalize(x1, w)
    xa, ya = x0n[..., 0], x0n[..., 1]
    xb, yb = x1n[..., 0], x1n[..., 1]
    ones = jnp.ones_like(xa)
    # Row layout matches the reference (`estimate_relative_pose.py:65`):
    # [x'x, x'y, x', y'x, y'y, y', x, y, 1] with (x, y) in image 0, (x', y') image 1.
    X = jnp.stack(
        [xb * xa, xb * ya, xb, yb * xa, yb * ya, yb, xa, ya, ones], axis=-1
    )  # (B, N, 9)
    # The reference multiplies rows by w then does SVD, so effective Gram weights are w^2.
    f = weighted_nullvec(X, w * w)
    F = f.reshape(f.shape[:-1] + (3, 3))
    F = _rank2_project(F)
    F = jnp.swapaxes(T1, -1, -2) @ F @ T0
    # Scale-invariant normalization (sym. epipolar distance and decomposition are
    # both invariant to it; avoids the reference's divide-by-F[2,2] instability).
    F = F / (jnp.linalg.norm(F, axis=(-2, -1), keepdims=True) + _EPS)
    return F


def estimate_relative_pose_w8pt(
    kpts0,
    kpts1,
    intr0,
    intr1,
    confidence,
    choose_closest=False,
    target_T021=None,
    determine_inliers=False,
):
    """Confidence-weighted eight-point relative pose, batched & fully jittable.

    Behavioral contract of `estimate_relative_pose_w8pt`
    (`/root/reference/pose_optimization/two_view/estimate_relative_pose.py:84-128`).

    Args:
        kpts0, kpts1: (B, N, 2) pixel coordinates (matched pairs, invalid entries
            carried with confidence 0).
        intr0, intr1: (B, 3, 3) or (B, 4, 4) intrinsics.
        confidence: (B, N) or (B, N, 1) non-negative match confidences.
        choose_closest: if True, pick the decomposition candidate closest to
            `target_T021` (training mode); else pick by cheirality (eval mode).
        target_T021: (B, 4, 4) ground-truth relative transform (required when
            `choose_closest`).
        determine_inliers: also compute the symmetric-epipolar-distance inlier mask.

    Returns:
        (T021 (B, 4, 4), W8ptInfo).
    """
    if confidence.ndim == kpts0.ndim:
        confidence = confidence[..., 0]
    w_sum = jnp.sum(confidence, axis=-1, keepdims=True) + 1e-6
    conf = confidence / w_sum
    x0 = normalize_keypoints(kpts0, intr0)
    x1 = normalize_keypoints(kpts1, intr1)
    F = find_fundamental_weighted(x0, x1, conf)

    Rs, ts = motion_from_essential(F)  # (B, 4, 3, 3), (B, 4, 3)
    if choose_closest:
        if target_T021 is None:
            raise ValueError("choose_closest requires target_T021")
        cand_T = make_transform(Rs, ts)  # (B, 4, 4, 4)
        tgt = target_T021[..., None, :, :]
        err = rotation_angle_error(cand_T, tgt, reduce=False) + translation_angle_error(
            cand_T, tgt, reduce=False
        )  # (B, 4)
        best = jnp.argmin(err, axis=-1)
    else:
        scores = cheirality_scores(Rs, ts, x0, x1, conf)
        best = jnp.argmax(scores, axis=-1)
    take = jnp.take_along_axis
    R = take(Rs, best[..., None, None, None], axis=-3)[..., 0, :, :]
    t = take(ts, best[..., None, None], axis=-2)[..., 0, :]
    T021 = make_transform(R, t)

    # Positive-depth mask (`estimate_relative_pose.py:113-118` triangulates;
    # the closed-form ray depths are sign-equivalent and skip the per-point
    # DLT chain -- see `two_ray_depths`).
    depth0, depth1 = two_ray_depths(R, t, x0, x1)
    pos_depth = jnp.logical_and(depth0 > 0.0, depth1 > 0.0)

    inliers = None
    if determine_inliers:
        epi = sym_epipolar_distance(x0, x1, F, squared=True)
        fbar = (
            intr0[..., 0, 0] + intr0[..., 1, 1] + intr1[..., 0, 0] + intr1[..., 1, 1]
        ) / 4.0
        thresh = 3.0 / fbar
        inliers = jnp.logical_and(pos_depth, jnp.sqrt(epi + _EPS) <= thresh[..., None])

    # Enough effective matches (the reference bails at < 8 rows; with masks the
    # analogous condition is >= 8 non-zero weights).
    valid = jnp.sum((confidence > 0).astype(jnp.int32), axis=-1) >= 8
    info = W8ptInfo(
        kpts0_norm=x0,
        kpts1_norm=x1,
        confidence=conf,
        inliers=inliers,
        pos_depth_mask=pos_depth,
        F=F,
        valid=valid,
    )
    return T021, info
