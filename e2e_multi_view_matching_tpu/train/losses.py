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
        # All P pairs solved as ONE (B*P)-batched w8pt instead of a Python
        # loop of P sequential B-sized solves: the small-solver chains
        # (inverse iteration, two-ray depths) are latency-bound at B=8, so
        # widening the batch 10x runs them at full VPU width -- the same
        # batching the fused eval pipeline uses (mvba/pipeline.py stage A).
        # Reductions reproduce the loop exactly: rot = sum_p mean_B;
        # transl = sum_p [sum_B(err*valid) / max(sum_B valid, 1)]
        # (`/root/reference/helpers.py:243-260` semantics).
        V, K = kpts.shape[1], kpts.shape[2]
        pairs = result["pairs"]  # (P, 2) int32, i < j, matcher's pair order
        i_idx, j_idx = pairs[:, 0], pairs[:, 1]
        target = jnp.linalg.inv(poses[:, j_idx]) @ poses[:, i_idx]  # (B,P,4,4)
        matches0 = result["matches0"]  # (B, P, K)
        conf = jnp.where(matches0 >= 0, result["conf_scores"], 0.0)
        gather = jnp.clip(matches0, 0, K - 1)
        kpts_j = jnp.take_along_axis(kpts[:, j_idx], gather[..., None], axis=2)
        BP = B * P
        isz = intr.shape[2:]
        target_flat = target.reshape(BP, 4, 4)
        T_pred, _ = estimate_relative_pose_w8pt(
            kpts[:, i_idx].reshape(BP, K, 2), kpts_j.reshape(BP, K, 2),
            intr[:, i_idx].reshape((BP,) + isz),
            intr[:, j_idx].reshape((BP,) + isz),
            conf.reshape(BP, K), choose_closest=True, target_T021=target_flat,
        )
        rot_err = rotation_angle_error(T_pred, target_flat, reduce=False)
        rot_loss = jnp.sum(jnp.mean(rot_err.reshape(B, P), axis=0))
        tr_err = translation_angle_error(T_pred, target_flat, reduce=False)
        n = jnp.linalg.norm(T_pred[..., :3, 3], axis=-1) * jnp.linalg.norm(
            target_flat[..., :3, 3], axis=-1)
        valid = (n > 1e-6).reshape(B, P).astype(tr_err.dtype)
        denom = jnp.maximum(jnp.sum(valid, axis=0), 1.0)  # per-pair
        transl_loss = jnp.sum(jnp.sum(tr_err.reshape(B, P), axis=0) / denom)
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
