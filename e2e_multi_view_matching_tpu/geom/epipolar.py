"""Epipolar geometry primitives in pure JAX: normalization, triangulation, essential
matrix decomposition, epipolar distances.

TPU-native replacement of the kornia surface used by the reference
(`/root/reference/pose_optimization/two_view/estimate_relative_pose.py:2-4`:
`normalize_points`, `motion_from_essential`, `motion_from_essential_choose_solution`,
`triangulate_points`, `symmetrical_epipolar_distance`, `depth_from_point`).

Design notes (TPU-first):
- All decompositions route through closed-form small-matrix kernels
  (adjugate inverse iteration, polar orthogonalization -- see geom/linalg.py)
  on tiny Gram matrices instead of tall SVDs or XLA's iterative eigh: stable
  smooth gradients, MXU/VPU-friendly straight-line code.
- Validity is expressed through weights/masks, never ragged shapes.
"""

import jax
import jax.numpy as jnp

from e2e_multi_view_matching_tpu.geom.linalg import smallest_eigvec_ii

_EPS = 1e-8


def safe_norm(x, axis=-1, keepdims=False, eps=1e-12):
    """L2 norm with a NaN-free gradient at the origin.

    `jnp.linalg.norm` has a NaN gradient at exactly zero, and JAX's
    `where`-style maskouts still propagate it (0 * nan = nan); `sqrt(max(s, eps))`
    with `maximum` zeroes the tangent below eps instead.
    """
    s = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(s, eps))


def normalize_keypoints(kpts, intr):
    """Pixel coordinates -> normalized camera coordinates.

    Mirrors `normalize` (`/root/reference/pose_optimization/two_view/estimate_relative_pose.py:9-14`).

    Args:
        kpts: (..., N, 2) pixel xy.
        intr: (..., 3, 3) or (..., 4, 4) intrinsics.
    Returns:
        (..., N, 2) normalized coordinates.
    """
    fx = intr[..., 0, 0][..., None]
    fy = intr[..., 1, 1][..., None]
    cx = intr[..., 0, 2][..., None]
    cy = intr[..., 1, 2][..., None]
    x = (kpts[..., 0] - cx) / fx
    y = (kpts[..., 1] - cy) / fy
    return jnp.stack([x, y], axis=-1)


def hartley_normalize(pts, w=None):
    """Weighted Hartley normalization: zero (weighted) mean, mean distance sqrt(2).

    Args:
        pts: (..., N, 2); w: optional (..., N) non-negative weights (zero rows are
        excluded from the statistics, which is how masked invalid matches stay inert).
    Returns:
        (pts_norm (..., N, 2), T (..., 3, 3)) with pts_norm_h = T @ pts_h.
    """
    if w is None:
        w = jnp.ones(pts.shape[:-1], dtype=pts.dtype)
    w_sum = jnp.sum(w, axis=-1, keepdims=True) + _EPS
    mean = jnp.sum(pts * w[..., None], axis=-2, keepdims=True) / w_sum[..., None]
    centered = pts - mean
    dist = safe_norm(centered, axis=-1)
    mean_dist = jnp.sum(dist * w, axis=-1, keepdims=True) / w_sum
    scale = jnp.sqrt(2.0) / (mean_dist + _EPS)
    pts_norm = centered * scale[..., None]
    s = scale[..., 0]
    mx = mean[..., 0, 0]
    my = mean[..., 0, 1]
    zeros = jnp.zeros_like(s)
    ones = jnp.ones_like(s)
    T = jnp.stack(
        [
            jnp.stack([s, zeros, -s * mx], axis=-1),
            jnp.stack([zeros, s, -s * my], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return pts_norm, T


def triangulate_points(P0, P1, x0, x1):
    """Batched DLT triangulation.

    Mirrors kornia `triangulate_points` as used at
    `/root/reference/pose_optimization/two_view/estimate_relative_pose.py:115`.

    Args:
        P0, P1: (..., 3, 4) projection matrices (normalized coords -> intrinsics folded in).
        x0, x1: (..., N, 2) normalized image points.
    Returns:
        (..., N, 3) 3D points.
    """
    # Rows of the DLT system per point: x*P2 - P0, y*P2 - P1, for both views.
    def rows(P, x):
        # P: (..., 3, 4), x: (..., N, 2) -> (..., N, 2, 4)
        P0r = P[..., None, 0, :]
        P1r = P[..., None, 1, :]
        P2r = P[..., None, 2, :]
        r0 = x[..., 0:1] * P2r - P0r
        r1 = x[..., 1:2] * P2r - P1r
        return jnp.stack([r0, r1], axis=-2)

    A = jnp.concatenate([rows(P0, x0), rows(P1, x1)], axis=-2)  # (..., N, 4, 4)
    G = jnp.einsum("...ij,...ik->...jk", A, A)  # (..., N, 4, 4)
    # per-point 4x4 smallest eigenvector: closed-form damped inverse iteration
    # (an XLA eigh here costs ~the entire pose pipeline; see geom/linalg.py)
    h = smallest_eigvec_ii(G, n_iters=4)  # (..., N, 4)
    wcomp = h[..., 3]
    sign = jnp.where(wcomp >= 0, 1.0, -1.0)
    denom = sign * jnp.maximum(jnp.abs(wcomp), _EPS)
    return h[..., :3] / denom[..., None]


def two_ray_depths(R, t, x0, x1):
    """Closed-form depths of a two-view correspondence (no triangulation).

    For normalized rays x0h = [x0, 1], x1h = [x1, 1] and cam1 = (R, t), the
    exact-geometry constraint z1 x1h = R (z0 x0h) + t crossed with x1h gives
    z0 = -<x1h x t, c> / <c, c> with c = x1h x (R x0h), and z1 follows from
    the third row. This is the cheirality-test workhorse: sign-equivalent to
    DLT triangulation at a tiny fraction of the cost (the per-point 4x4
    inverse-iteration chain of `triangulate_points` dominated the whole pose
    pipeline's stage A on chip -- ~57 of ~70 ms per w8pt call at 80x1024).

    Args:
        R: (..., 3, 3); t: (..., 3); x0, x1: (..., N, 2) normalized coords.
    Returns:
        (z0 (..., N), z1 (..., N)) depths in cam0 / cam1.
    """
    ones = jnp.ones(x0.shape[:-1] + (1,), dtype=x0.dtype)
    x0h = jnp.concatenate([x0, ones], axis=-1)  # (..., N, 3)
    x1h = jnp.concatenate([x1, ones], axis=-1)
    Rx0 = jnp.einsum("...ij,...nj->...ni", R, x0h)
    c = jnp.cross(x1h, Rx0)
    x1t = jnp.cross(x1h, jnp.broadcast_to(t[..., None, :], x1h.shape))
    denom = jnp.sum(c * c, axis=-1)
    z0 = -jnp.sum(x1t * c, axis=-1) / jnp.maximum(denom, _EPS)
    z1 = z0 * Rx0[..., 2] + t[..., None, 2]
    return z0, z1


def midpoint_triangulate_rel(R, t, x0, x1):
    """Closed-form midpoint triangulation for a relative pair (cam0 = identity).

    The midpoint of the shortest segment between the two viewing rays -- the
    classic closed-form alternative to DLT. Used as the structure INIT of the
    LM bundle adjusters, where the refinement target is identical and the
    per-point 4x4 inverse-iteration chain of the DLT is pure overhead.

    Args:
        R: (..., 3, 3); t: (..., 3) cam1 extrinsics; x0, x1: (..., N, 2).
    Returns:
        (..., N, 3) points in the cam0 frame.
    """
    z0, z1 = two_ray_depths(R, t, x0, x1)
    ones = jnp.ones(x0.shape[:-1] + (1,), dtype=x0.dtype)
    x0h = jnp.concatenate([x0, ones], axis=-1)
    x1h = jnp.concatenate([x1, ones], axis=-1)
    X0 = z0[..., None] * x0h
    # back-project the cam1-frame point into cam0: R^T (z1 x1h - t)
    X1 = jnp.einsum("...ji,...nj->...ni", R, z1[..., None] * x1h - t[..., None, :])
    return 0.5 * (X0 + X1)


def depth_from_point(R, t, X):
    """Depth of 3D points X (..., N, 3) in the camera with extrinsics (R (...,3,3), t (...,3))."""
    return jnp.einsum("...ij,...nj->...ni", R, X)[..., 2] + t[..., None, 2]


def sym_epipolar_distance(x0, x1, F, squared=True):
    """Symmetric epipolar distance of correspondences under F.

    Mirrors kornia `symmetrical_epipolar_distance`
    (used at `/root/reference/pose_optimization/two_view/estimate_relative_pose.py:122`).

    Args:
        x0, x1: (..., N, 2); F: (..., 3, 3).
    Returns:
        (..., N) distances (squared by default, like kornia).
    """
    ones = jnp.ones(x0.shape[:-1] + (1,), dtype=x0.dtype)
    x0h = jnp.concatenate([x0, ones], axis=-1)
    x1h = jnp.concatenate([x1, ones], axis=-1)
    Fx0 = jnp.einsum("...ij,...nj->...ni", F, x0h)
    FTx1 = jnp.einsum("...ji,...nj->...ni", F, x1h)
    num = jnp.sum(x1h * Fx0, axis=-1) ** 2
    denom = (
        1.0 / (Fx0[..., 0] ** 2 + Fx0[..., 1] ** 2 + _EPS)
        + 1.0 / (FTx1[..., 0] ** 2 + FTx1[..., 1] ** 2 + _EPS)
    )
    d = num * denom
    if squared:
        return d
    return jnp.sqrt(d + _EPS)


def _essential_uv(E):
    """Consistent (U, V) with E ~ U diag(s) V^T, eigh-free and SVD-equivalent.

    TPU-first design (no XLA eigh/SVD kernel, pure elementwise + tiny matmuls,
    smooth gradients even at the repeated singular values sigma1 = sigma2 of a
    true essential matrix where SVD/eigh gradients blow up):

    1. v3 = null direction of E (damped inverse iteration on E^T E).
    2. {v1, v2} = ANY orthonormal completion of v3.
    3. U's top-2 frame from the POLAR decomposition of M = [E v1, E v2]:
       U12 = M (M^T M)^{-1/2} (closed-form 2x2 inverse sqrt). Polar
       orthogonalization is equivariant under rotations of the {v1, v2} basis
       -- M -> M Q gives U12 -> U12 Q -- so the resulting candidate motions are
       EXACTLY those of the true SVD basis, for any rank-2 E, without ever
       resolving the (possibly degenerate) top-2 eigenpair. (A Gram-Schmidt
       here instead would bias toward v1 and deviate by O(sigma1 - sigma2).)
    """
    G = jnp.swapaxes(E, -1, -2) @ E
    v3 = smallest_eigvec_ii(G, n_iters=4)
    # deterministic orthonormal completion: project out v3 from the basis
    # vector least aligned with it (branchless one-hot pick)
    k = jnp.argmin(jnp.abs(v3), axis=-1)
    e_k = jax.nn.one_hot(k, 3, dtype=E.dtype)
    v1 = e_k - jnp.sum(e_k * v3, axis=-1, keepdims=True) * v3
    v1 = v1 / safe_norm(v1, axis=-1, keepdims=True)
    v2 = jnp.cross(v3, v1)
    V = jnp.stack([v1, v2, v3], axis=-1)  # columns; null direction last

    m1 = jnp.einsum("...ij,...j->...i", E, v1)
    m2 = jnp.einsum("...ij,...j->...i", E, v2)
    a11 = jnp.sum(m1 * m1, axis=-1)
    a12 = jnp.sum(m1 * m2, axis=-1)
    a22 = jnp.sum(m2 * m2, axis=-1)
    # closed-form inverse square root of the 2x2 SPD Gram A = M^T M:
    # A^{1/2} = (A + sqrt(det) I) / sqrt(tr + 2 sqrt(det))
    d = jnp.sqrt(jnp.maximum(a11 * a22 - a12 * a12, 0.0))
    t = jnp.sqrt(jnp.maximum(a11 + a22 + 2.0 * d, _EPS))
    den = jnp.maximum((a11 + d) * (a22 + d) - a12 * a12, _EPS)
    f = t / den
    b11 = f * (a22 + d)
    b12 = -f * a12
    b22 = f * (a11 + d)
    u1 = m1 * b11[..., None] + m2 * b12[..., None]
    u2 = m1 * b12[..., None] + m2 * b22[..., None]
    u3 = jnp.cross(u1, u2)
    U = jnp.stack([u1, u2, u3], axis=-1)
    s = jnp.stack([jnp.sqrt(jnp.maximum(a11, 0.0)),
                   jnp.sqrt(jnp.maximum(a22, 0.0)),
                   jnp.zeros_like(a11)], axis=-1)
    return U, s, V


def motion_from_essential(E):
    """Four (R, t) candidates from an essential matrix.

    Mirrors kornia `motion_from_essential`
    (`/root/reference/pose_optimization/two_view/estimate_relative_pose.py:96`).

    Args:
        E: (..., 3, 3).
    Returns:
        Rs: (..., 4, 3, 3), ts: (..., 4, 3) with unit-norm translations.
    """
    U, _, V = _essential_uv(E)
    # Enforce det(U) = det(V) = +1 so the candidates are rotations.
    detU = jnp.linalg.det(U)
    detV = jnp.linalg.det(V)
    U = U * jnp.stack([jnp.ones_like(detU), jnp.ones_like(detU), detU], axis=-1)[..., None, :]
    V = V * jnp.stack([jnp.ones_like(detV), jnp.ones_like(detV), detV], axis=-1)[..., None, :]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    VT = jnp.swapaxes(V, -1, -2)
    R1 = U @ W @ VT
    R2 = U @ jnp.swapaxes(W, -1, -2) @ VT
    t = U[..., :, 2]
    t = t / safe_norm(t, axis=-1, keepdims=True)
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


def cheirality_scores(Rs, ts, x0, x1, w=None):
    """Weighted count of points with positive depth in both views per candidate.

    Args:
        Rs: (..., C, 3, 3), ts: (..., C, 3); x0, x1: (..., N, 2) normalized coords;
        w: optional (..., N) weights.
    Returns:
        (..., C) scores (higher is better).
    """
    if w is None:
        w = jnp.ones(x0.shape[:-1], dtype=x0.dtype)
    x0c = jnp.broadcast_to(x0[..., None, :, :], Rs.shape[:-2] + x0.shape[-2:])
    x1c = jnp.broadcast_to(x1[..., None, :, :], Rs.shape[:-2] + x1.shape[-2:])
    # closed-form ray depths: sign-equivalent to the reference's triangulation
    # (kornia `motion_from_essential_choose_solution` path) without the
    # per-point DLT solve
    d0, d1 = two_ray_depths(Rs, ts, x0c, x1c)
    pos = jnp.logical_and(d0 > 0.0, d1 > 0.0).astype(x0.dtype)
    return jnp.sum(pos * w[..., None, :], axis=-1)
