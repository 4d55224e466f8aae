"""Maximum-spanning-tree absolute-pose initialization (host-side numpy).

Mirrors `initialize_bundle_adjust`'s graph stage
(`/root/reference/pose_optimization/multi_view/bundle_adjust_io.py:135-172`):
build a match graph weighted by pairwise inlier counts, take the maximum
spanning tree, and chain relative poses along it into absolute extrinsics
(camera 0 = identity). N is tiny (5-tuples), so this runs as plain Prim's
algorithm on the host; the output feeds the jitted averaging/BA stages.
"""

import numpy as np


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
