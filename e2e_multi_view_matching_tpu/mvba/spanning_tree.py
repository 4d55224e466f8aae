"""Maximum-spanning-tree absolute-pose initialization.

Mirrors `initialize_bundle_adjust`'s graph stage
(`/root/reference/pose_optimization/multi_view/bundle_adjust_io.py:135-172`):
build a match graph weighted by pairwise inlier counts, take the maximum
spanning tree, and chain relative poses along it into absolute extrinsics
(camera 0 = identity). Two implementations:

- `spanning_tree_poses`: host-side numpy (dict in / dict out), kept as the
  readable reference and for the host-RANSAC init modes;
- `spanning_tree_poses_device`: traceable JAX Prim's with the V-1 growth
  steps unrolled (V is tiny and static), so the WHOLE multi-view pose
  pipeline -- SuperPoint -> matcher -> per-pair poses -> tree -> averaging ->
  Schur BA -- compiles into one program with zero host hops. Tie-breaking
  matches the host scan order exactly (see the rank epsilon below).
"""

import jax.numpy as jnp
import numpy as np

from e2e_multi_view_matching_tpu.geom.lie import invert_transform


def maximum_spanning_tree(weights):
    """Prim's maximum spanning tree on a dense symmetric weight matrix.

    Args:
        weights: (N, N) nonnegative; 0 = no edge. Only i<j entries are read.
    Returns:
        list of (i, j) tree edges (i < j), in insertion order from node 0.
    """
    N = weights.shape[0]
    W = np.maximum(weights, weights.T).astype(np.float64)
    in_tree = np.zeros(N, bool)
    in_tree[0] = True
    edges = []
    for _ in range(N - 1):
        best = (-1.0, None)
        for a in np.where(in_tree)[0]:
            for b in np.where(~in_tree)[0]:
                if W[a, b] > best[0]:
                    best = (W[a, b], (a, b))
        if best[1] is None or best[0] <= 0:
            break
        a, b = best[1]
        in_tree[b] = True
        edges.append((min(a, b), max(a, b)))
    return edges


def spanning_tree_poses(n_images, rel_poses, inlier_counts):
    """Chain relative poses along the maximum spanning tree into extrinsics.

    Pose conventions follow the reference: `rel_poses[(i, j)]` is T_i2j (points
    in cam_i -> cam_j); returned extrinsics are world->cam with camera 0 as the
    world frame (`bundle_adjust_io.py:140-172`).

    Args:
        n_images: N.
        rel_poses: dict {(i, j): (4, 4) ndarray} for i < j.
        inlier_counts: dict {(i, j): int}.
    Returns:
        (extr (N, 4, 4) float32, tree_edges list of (i, j)).
    """
    W = np.zeros((n_images, n_images))
    for (i, j), c in inlier_counts.items():
        if (i, j) in rel_poses:
            W[i, j] = max(c, 0)
    tree = maximum_spanning_tree(W)

    # abs_pose_i = cam_i -> world (reference chains cam->world then inverts)
    abs_pose = {0: np.eye(4)}
    for _ in range(n_images):
        for i, j in tree:
            if j not in abs_pose and i in abs_pose:
                abs_pose[j] = abs_pose[i] @ np.linalg.inv(rel_poses[(i, j)])
            elif i not in abs_pose and j in abs_pose:
                abs_pose[i] = abs_pose[j] @ rel_poses[(i, j)]
        if len(abs_pose) == n_images:
            break

    extr = np.stack(
        [
            np.linalg.inv(abs_pose[i]) if i in abs_pose else np.eye(4)
            for i in range(n_images)
        ]
    ).astype(np.float32)
    return extr, tree


def spanning_tree_poses_device(T_rel, counts, valid, idx_i, idx_j, n_views):
    """Traceable Prim's MST + pose chaining for ONE tuple (vmap over batch).

    Functionally identical to `spanning_tree_poses` (verified element-wise in
    tests), but pure JAX with static shapes: the V-1 growth steps are unrolled,
    each picking the max-weight edge between the tree and its complement via a
    masked argmax over the P pair slots.

    Tie-breaking: the host version scans tree nodes `a` ascending, non-tree
    nodes `b` ascending, keeping the first strict maximum -- i.e. among
    equal-weight edges the smallest (a, b) wins. Inlier counts are integers,
    so subtracting rank/(V^2+1) < 1 from each weight reproduces that order
    exactly without ever reordering unequal weights.

    Args:
        T_rel: (P, 4, 4) relative poses T_i2j per pair.
        counts: (P,) inlier counts; valid: (P,) bool pose validity.
        idx_i, idx_j: static (P,) numpy arrays, pair order `_pair_list(V)`.
        n_views: static V.
    Returns:
        (extr (V, 4, 4) world->cam f32 with camera 0 = identity and
        unreachable cameras = identity, on_tree (P,) bool tree membership).
    """
    P = len(idx_i)
    V = n_views
    gi = jnp.asarray(np.asarray(idx_i, np.int32))
    gj = jnp.asarray(np.asarray(idx_j, np.int32))
    W = jnp.where(valid, jnp.maximum(counts.astype(jnp.float32), 0.0), 0.0)

    in_tree = jnp.zeros((V,), bool).at[0].set(True)
    abs_pose = jnp.broadcast_to(jnp.eye(4, dtype=T_rel.dtype), (V, 4, 4))
    on_tree = jnp.zeros((P,), bool)
    T_inv = invert_transform(T_rel)

    for _ in range(V - 1):
        ti = in_tree[gi]
        tj = in_tree[gj]
        elig = (ti ^ tj) & (W > 0)
        a = jnp.where(ti, gi, gj)  # in-tree endpoint
        b = jnp.where(ti, gj, gi)  # endpoint being added
        w_eff = jnp.where(
            elig, W - (a * V + b).astype(jnp.float32) / (V * V + 1.0), -1.0
        )
        p = jnp.argmax(w_eff)
        take = w_eff[p] > 0.0
        new_node = b[p]
        # abs_pose maps cam -> world: anchor i => abs[j] = abs[i] @ inv(T),
        # anchor j => abs[i] = abs[j] @ T  (`bundle_adjust_io.py:152-166`)
        new_pose = abs_pose[a[p]] @ jnp.where(ti[p], T_inv[p], T_rel[p])
        abs_pose = abs_pose.at[new_node].set(
            jnp.where(take, new_pose, abs_pose[new_node])
        )
        in_tree = in_tree.at[new_node].set(in_tree[new_node] | take)
        on_tree = on_tree.at[p].set(on_tree[p] | take)

    extr = jnp.where(
        in_tree[:, None, None], invert_transform(abs_pose),
        jnp.eye(4, dtype=T_rel.dtype),
    )
    return extr.astype(jnp.float32), on_tree
