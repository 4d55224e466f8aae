"""Loss assembly: Sinkhorn match NLL, pose loss through the weighted 8-point solve,
and the two-stage blend.

Behavioral contracts:
- `match_loss`: `compute_match_loss` (`/root/reference/helpers.py:228-241`) --
  weighted NLL of the log assignment at GT indices, row- and column-wise, / batch.
- `matcher_losses`: `run_matcher` (`helpers.py:243-260`) -- sum over all pairs;
  pose loss = rotation + translation angle errors of the w8pt estimate against
  inv(pose_j) @ pose_i with choose_closest candidate selection.
- `combine_losses`: `train.py:36-40` -- (1 - ratio) * match + ratio * pose with
  per-pair normalization and dataset-specific rot/trans weights.
"""

import jax.numpy as jnp

from e2e_multi_view_matching_tpu.geom.eightpoint import estimate_relative_pose_w8pt
from e2e_multi_view_matching_tpu.geom.metrics import (
    rotation_angle_error,
    translation_angle_error,
)


def match_loss_of_pair(log_p, gt_indices, gt_weights):
    """Weighted NLL of one pair's log assignment.

    Args:
        log_p: (B, K+1, K+1); gt_indices: (B, 2, K+1) with -1 = dustbin;
        gt_weights: (B, 2, K+1).
    Returns:
        scalar loss (summed over batch / B, like the reference).
    """
    B, F, _ = log_p.shape
    idx0 = gt_indices[:, 0]
    idx1 = gt_indices[:, 1]
    # -1 means dustbin = last column/row (the reference exploits torch negative
    # indexing; we map explicitly).
    idx0 = jnp.where(idx0 < 0, F - 1, idx0)
    idx1 = jnp.where(idx1 < 0, F - 1, idx1)
    l0 = -jnp.take_along_axis(log_p, idx0[..., None], axis=2)[..., 0]  # (B, K+1)
    l1 = -jnp.take_along_axis(
        jnp.swapaxes(log_p, 1, 2), idx1[..., None], axis=2
    )[..., 0]
    loss = jnp.sum(l0 * gt_weights[:, 0]) + jnp.sum(l1 * gt_weights[:, 1])
    return loss / B


def matcher_losses(
    result,
    gt_indices,
    gt_weights,
    kpts,
    intr,
    poses,
    pose_loss: bool,
):
    """Total match / rot / transl losses over all pairs of the tuple.

    Args:
        result: matcher output dict (stacked pair tensors).
        gt_indices, gt_weights: (B, P, 2, K+1) from `gt_matches_all_pairs`.
        kpts: (B, V, K, 2); intr: (B, V, 3|4, 3|4); poses: (B, V, 4, 4) cam->world.
        pose_loss: include the differentiable pose loss (stage 2).
    Returns:
        dict(match_loss, rot_loss, transl_loss) of scalars.
    """
    log_p = result["log_assignment"]  # (B, P, K+1, K+1)
    B, P = log_p.shape[:2]
    match_loss = 0.0
    for p in range(P):
        match_loss = match_loss + match_loss_of_pair(
            log_p[:, p], gt_indices[:, p], gt_weights[:, p]
        )
    rot_loss = jnp.zeros(())
    transl_loss = jnp.zeros(())
    if pose_loss:
        V = kpts.shape[1]
        pairs = [(i, j) for j in range(V) for i in range(j)]  # matcher's pair order
        K = kpts.shape[2]
        for p in range(P):
            i, j = pairs[p]
            target = jnp.linalg.inv(poses[:, j]) @ poses[:, i]
            matches0 = result["matches0"][:, p]  # (B, K)
            conf = result["conf_scores"][:, p]  # (B, K)
            conf = jnp.where(matches0 >= 0, conf, 0.0)
            gather = jnp.clip(matches0, 0, K - 1)
            kpts_j = jnp.take_along_axis(kpts[:, j], gather[..., None], axis=1)
            T_pred, _ = estimate_relative_pose_w8pt(
                kpts[:, i], kpts_j, intr[:, i], intr[:, j], conf,
                choose_closest=True, target_T021=target,
            )
            rot_loss = rot_loss + rotation_angle_error(T_pred, target)
            transl_loss = transl_loss + translation_angle_error(T_pred, target)
    return {
        "match_loss": match_loss,
        "rot_loss": rot_loss,
        "transl_loss": transl_loss,
    }


def combine_losses(losses, n_pairs, pose_match_ratio, rot_weight, trans_weight):
    """Two-stage blend (`/root/reference/train.py:36-40`)."""
    scaled = {k: v / float(n_pairs) for k, v in losses.items()}
    pose_loss = rot_weight * scaled["rot_loss"] + trans_weight * scaled["transl_loss"]
    total = (1.0 - pose_match_ratio) * scaled["match_loss"] + pose_match_ratio * pose_loss
    return total, scaled
