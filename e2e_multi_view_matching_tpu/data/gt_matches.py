"""Ground-truth correspondence generation from depth + pose, as one jitted function.

Behavioral re-implementation of `compute_gt_matches_of_image_pair` /
`compute_gt_matches` (`/root/reference/helpers.py:108-226`) with TPU-first dense
formulations:

- The (K, K) reprojection-error matrix is built from the ||a||^2 + ||b||^2 - 2ab
  expansion (one MXU matmul) instead of a broadcasted (K, K, 2) difference tensor.
- Boolean indexing becomes masks; the scatter that fills view-1's match indices
  routes invalid entries to a discard slot (mutual-argmin guarantees injectivity
  of the real writes).
- All pairs of a tuple are processed as one vmapped (P, ...) batch.

Output contract matches the reference: per pair (k, m), `gt_indices` (B, 2, K+1)
with -1 meaning dustbin, and `gt_weights` (B, 2, K+1) carrying class-balancing
weights (0 = dropped "uncertain non-match").
"""

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _pairwise_dist(a, b):
    """(..., K, 2), (..., K, 2) -> (..., K, K) Euclidean distances via Gram expansion."""
    aa = jnp.sum(a * a, axis=-1)
    bb = jnp.sum(b * b, axis=-1)
    ab = jnp.einsum("...kc,...lc->...kl", a, b, preferred_element_type=jnp.float32)
    d2 = aa[..., :, None] + bb[..., None, :] - 2.0 * ab
    return jnp.sqrt(jnp.maximum(d2, _EPS))


def _lookup_depth(depth, kpts):
    """depth (..., H, W), kpts (..., K, 2) xy -> (..., K) nearest-pixel depth."""
    H, W = depth.shape[-2:]
    x = jnp.clip(kpts[..., 0].astype(jnp.int32), 0, W - 1)
    y = jnp.clip(kpts[..., 1].astype(jnp.int32), 0, H - 1)
    flat = depth.reshape(depth.shape[:-2] + (H * W,))
    return jnp.take_along_axis(flat, y * W + x, axis=-1)


def _transform_kpts(kpts, d, K_src, K_dst, T):
    """Project pixels+depth of source view into the destination view.

    Mirrors `transform_kpts` (`helpers.py:115-119`).

    Args:
        kpts: (..., K, 2) integer-valued pixel xy (as float); d: (..., K) depth;
        K_src, K_dst: (..., 3, 3); T: (..., 4, 4) src->dst.
    Returns:
        (depths_dst (..., K), kpts_dst (..., K, 2)).
    """
    ones = jnp.ones_like(d)
    pix_h = jnp.stack([kpts[..., 0] * d, kpts[..., 1] * d, d], axis=-1)
    X_src = jnp.einsum("...ij,...kj->...ki", jnp.linalg.inv(K_src), pix_h)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    X_dst = jnp.einsum("...ij,...kj->...ki", R, X_src) + t[..., None, :]
    p_dst = jnp.einsum("...ij,...kj->...ki", K_dst, X_dst)
    z = p_dst[..., 2]
    sign = jnp.where(z >= 0, 1.0, -1.0)
    z_safe = sign * jnp.maximum(jnp.abs(z), 1e-9)
    return z, p_dst[..., :2] / z_safe[..., None] * ones[..., None]


def gt_matches_of_pair(
    kpts0,
    kpts1,
    K0,
    K1,
    T021,
    depth0,
    depth1,
    max_matched_reproj_err=5.0,
    min_unmatched_reproj_err=15.0,
):
    """GT match indices + class-balanced weights for one view pair.

    Args:
        kpts0, kpts1: (B, K, 2) pixel xy; K0, K1: (B, 3, 3) or (B, 4, 4);
        T021: (B, 4, 4) view0 -> view1; depth0, depth1: (B, H, W) meters.
    Returns:
        gt_indices (B, 2, K+1) int32, gt_weights (B, 2, K+1) float32.
    """
    K0 = K0[..., :3, :3]
    K1 = K1[..., :3, :3]
    kpts0 = jnp.floor(kpts0)  # integer-pixel semantics (`helpers.py:125-126` .long())
    kpts1 = jnp.floor(kpts1)
    B, K, _ = kpts0.shape
    d0 = _lookup_depth(depth0, kpts0)  # (B, K)
    d1 = _lookup_depth(depth1, kpts1)
    T120 = jnp.linalg.inv(T021)
    depths0to1, kpts0to1 = _transform_kpts(kpts0, d0, K0, K1, T021)
    depths1to0, kpts1to0 = _transform_kpts(kpts1, d1, K1, K0, T120)

    # Symmetric mean reprojection error matrix: rows = kpts0, cols = kpts1.
    errors = 0.5 * (_pairwise_dist(kpts0, kpts1to0) + _pairwise_dist(kpts0to1, kpts1))

    row_mins = jnp.argmin(errors, axis=2)  # (B, K) best kpt1 for each kpt0
    col_mins = jnp.argmin(errors, axis=1)  # (B, K) best kpt0 for each kpt1

    i0s = jnp.broadcast_to(jnp.arange(K)[None], (B, K))
    i1s = row_mins
    take_b = lambda arr, idx: jnp.take_along_axis(arr, idx, axis=1)
    mutual = take_b(col_mins, i1s) == i0s
    err_at_min = jnp.take_along_axis(errors, i1s[..., None], axis=2)[..., 0]
    small_err = err_at_min <= max_matched_reproj_err
    valid_d0 = d0 > 1e-6
    match_d1 = take_b(d1, i1s)
    valid_d1 = match_d1 > 1e-6
    match_mask = mutual & small_err & valid_d0 & valid_d1
    # relative depth consistency in both directions (`helpers.py:166-168`)
    rel0 = jnp.abs(depths0to1 - match_d1) / jnp.maximum(match_d1, 1e-6)
    rel1 = jnp.abs(take_b(depths1to0, i1s) - d0) / jnp.maximum(d0, 1e-6)
    match_mask = match_mask & (rel0 < 0.1) & (rel1 < 0.1)
    match_count = jnp.sum(match_mask, axis=1)

    # match indices (dustbin slot K stays -1)
    mi0 = jnp.where(match_mask, i1s, -1)
    match_indices0 = jnp.concatenate([mi0, jnp.full((B, 1), -1, mi0.dtype)], axis=1)
    # scatter view-1 side: write i0 at position i1s where matched, discard others
    scatter_idx = jnp.where(match_mask, i1s, K + 1)
    mi1_ext = jnp.full((B, K + 2), -1, dtype=jnp.int32)
    mi1_ext = mi1_ext.at[jnp.arange(B)[:, None], scatter_idx].set(i0s.astype(jnp.int32))
    match_indices1 = mi1_ext[:, : K + 1]
    matched1 = match_indices1[:, :K] >= 0

    # Uncertain non-matches on the kpt0 side (`helpers.py:173-179`).
    no_match0 = ~match_mask
    invalid_depth0 = (~valid_d0) | (~valid_d1)
    near0 = err_at_min <= min_unmatched_reproj_err
    drop0 = no_match0 & (invalid_depth0 | near0)
    drop_count = jnp.sum(drop0, axis=1)

    # Uncertain non-matches on the kpt1 side (`helpers.py:181-192`).
    j1s = jnp.broadcast_to(jnp.arange(K)[None], (B, K))
    j0s = col_mins
    no_match1 = ~matched1
    valid_d1b = d1 > 1e-6
    match_d0 = take_b(d0, j0s)
    valid_d0b = match_d0 > 1e-6
    invalid_depth1 = (~valid_d0b) | (~valid_d1b)
    # errors[b, j0s[b,k], k]: gather along axis 1
    err_at_min1 = jnp.take_along_axis(errors, j0s[:, None, :], axis=1)[:, 0, :]
    near1 = err_at_min1 <= min_unmatched_reproj_err
    drop1 = no_match1 & (invalid_depth1 | near1)
    drop_count = drop_count + jnp.sum(drop1, axis=1)

    # Class-balancing weights (`helpers.py:194-199`).
    match_frac = 2.0 * match_count / jnp.maximum(2.0 * K - drop_count, 1.0)
    unmatch_weight = 0.5 / jnp.maximum(1.0 - match_frac, 1e-6)
    match_weight = 0.5 / jnp.maximum(match_frac, 1e-6)
    invalid_w = (match_frac <= 1e-6) | (match_frac >= 1.0 - 1e-6)
    match_weight = jnp.where(invalid_w, 0.0, match_weight)
    unmatch_weight = jnp.where(invalid_w, 0.0, unmatch_weight)

    def weights_for(drop, matched):
        # drop, matched: (B, K); dustbin entry: never dropped, never matched.
        drop_f = jnp.concatenate([drop, jnp.zeros((B, 1), bool)], axis=1)
        match_f = jnp.concatenate([matched, jnp.zeros((B, 1), bool)], axis=1)
        w = jnp.where(match_f, match_weight[:, None], unmatch_weight[:, None])
        return jnp.where(drop_f, 0.0, w)

    w0 = weights_for(drop0, match_mask)
    w1 = weights_for(drop1, matched1)
    gt_indices = jnp.stack([match_indices0, match_indices1.astype(match_indices0.dtype)], axis=1)
    gt_weights = jnp.stack([w0, w1], axis=1).astype(jnp.float32)
    return gt_indices.astype(jnp.int32), gt_weights


@partial(jax.jit, static_argnames=("max_matched_reproj_err", "min_unmatched_reproj_err"))
def gt_matches_all_pairs(
    kpts, intr, poses, depths, max_matched_reproj_err=5.0, min_unmatched_reproj_err=15.0
):
    """GT matches for all C(V,2) pairs of a tuple, stacked on a pair axis.

    Mirrors the loop of `compute_gt_matches` (`helpers.py:215-226`): for each pair
    (k, m), T_k2m = inv(pose_m) @ pose_k.

    Args:
        kpts: (B, V, K, 2); intr: (B, V, 3, 3) or (B, V, 4, 4);
        poses: (B, V, 4, 4) cam->world; depths: (B, V, H, W).
    Returns:
        gt_indices (B, P, 2, K+1), gt_weights (B, P, 2, K+1) with pairs ordered
        [(k, m) for m in range(V) for k in range(m)].
    """
    V = kpts.shape[1]
    pairs = [(k, m) for m in range(V) for k in range(m)]
    idx_k = jnp.asarray([p[0] for p in pairs])
    idx_m = jnp.asarray([p[1] for p in pairs])

    def one_pair(k, m):
        T = jnp.linalg.inv(poses[:, m]) @ poses[:, k]
        return gt_matches_of_pair(
            kpts[:, k], kpts[:, m], intr[:, k], intr[:, m], T,
            depths[:, k], depths[:, m],
            max_matched_reproj_err, min_unmatched_reproj_err,
        )

    gi, gw = jax.vmap(one_pair, out_axes=(1, 1))(idx_k, idx_m)
    return gi, gw
