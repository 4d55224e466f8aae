"""Structure-of-arrays small-matrix helpers for TPU-friendly batched solvers.

Operands are (m, k, *batch) with the SMALL matrix dimensions leading and the
large batch axes trailing (TPU lanes). The naive array-of-structures
formulation -- (P, 2..6, 2..6) einsums -- tiles each tiny trailing pair to
(8, 128) and becomes HBM-layout-bound (measured ~21 ms per LM iteration for
P=10240 in the multi-camera BA, tools/ba_bisect.py); in SoA form the same
math is an unrolled sum of fully-packed vector multiplies that XLA fuses on
the VPU. Every product below unrolls statically (m, k, n <= 6).

Used by `mvba/bundle_adjust.py` (multi-camera Schur LM engine) and
`pose/two_view_ba.py` (two-view Schur LM engine).
"""

import jax.numpy as jnp


def mm_soa(A, B):
    """(m, k, *b) @ (k, n, *b) -> (m, n, *b), elementwise over the batch."""
    m, k = A.shape[0], A.shape[1]
    n = B.shape[1]
    return jnp.stack([
        jnp.stack([
            sum(A[i, q] * B[q, j] for q in range(k)) for j in range(n)
        ], axis=0)
        for i in range(m)
    ], axis=0)


def mtm_soa(A, B):
    """sum_r A[r, i] B[r, j]: (r, m, *b), (r, n, *b) -> (m, n, *b)."""
    r, m = A.shape[0], A.shape[1]
    n = B.shape[1]
    return jnp.stack([
        jnp.stack([
            sum(A[q, i] * B[q, j] for q in range(r)) for j in range(n)
        ], axis=0)
        for i in range(m)
    ], axis=0)


def abT_soa(A, B):
    """sum_k A[i, k] B[j, k]: (m, k, *b), (n, k, *b) -> (m, n, *b)."""
    m, k = A.shape[0], A.shape[1]
    n = B.shape[0]
    return jnp.stack([
        jnp.stack([
            sum(A[i, q] * B[j, q] for q in range(k)) for j in range(n)
        ], axis=0)
        for i in range(m)
    ], axis=0)


def mv_soa(A, v):
    """(m, k, *b) @ (k, *b) -> (m, *b)."""
    m, k = A.shape[0], A.shape[1]
    return jnp.stack(
        [sum(A[i, q] * v[q] for q in range(k)) for i in range(m)], axis=0
    )


def mtv_soa(A, v):
    """sum_r A[r, m] v[r]: (r, m, *b), (r, *b) -> (m, *b)."""
    r, m = A.shape[0], A.shape[1]
    return jnp.stack(
        [sum(A[q, i] * v[q] for q in range(r)) for i in range(m)], axis=0
    )


def hat_soa(a):
    """(3, *b) -> (3, 3, *b) skew-symmetric."""
    z = jnp.zeros_like(a[0])
    return jnp.stack([
        jnp.stack([z, -a[2], a[1]], axis=0),
        jnp.stack([a[2], z, -a[0]], axis=0),
        jnp.stack([-a[1], a[0], z], axis=0),
    ], axis=0)


def inv3x3_soa(H, det_eps=1e-30):
    """Closed-form adjugate inverse of (3, 3, *b) matrices.

    `det_eps` floors |det| (sign preserved). The 1e-30 default keeps masked
    blocks (which only ever multiply zero vectors) exact; callers whose
    near-singular blocks feed real arithmetic (e.g. the two-view LM point
    Hessians, where an overflowing inverse poisons gradients through the
    step-health `where`) should pass a coarser floor like 1e-12.
    """
    a, b, c = H[0, 0], H[0, 1], H[0, 2]
    d, e, f = H[1, 0], H[1, 1], H[1, 2]
    g, h, i = H[2, 0], H[2, 1], H[2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    sign = jnp.where(det >= 0, 1.0, -1.0)
    inv_det = sign / jnp.maximum(jnp.abs(det), det_eps)
    return inv_det[None, None] * jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=0),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=0),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=0),
    ], axis=0)
