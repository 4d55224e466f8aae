"""Stably differentiable symmetric eigendecomposition and null-space extraction.

The reference backpropagates through `torch.svd` of the weighted 8-point system
(`/root/reference/pose_optimization/two_view/estimate_relative_pose.py:73,76`) and
relies on a non-finite-gradient skip guard. On TPU we re-design this: instead of an
SVD of the tall (B, N, 9) system -- whose gradient degenerates on close singular
values -- we form the 9x9 Gram matrix X^T diag(w) X with a single MXU matmul and
take the eigenvector of its smallest eigenvalue via `safe_eigh`, a symmetric eigh
with a gap-clamped custom JVP. This is both faster (one small eigh instead of a
tall SVD) and gradient-stable by construction.
"""

from functools import partial

import jax
import jax.numpy as jnp

# Gradient gap clamp: 1/(lam_j - lam_i) is clipped to magnitude <= 1/_GAP_EPS.
_GAP_EPS = 1e-6


@partial(jax.custom_jvp, nondiff_argnums=())
def safe_eigh(A):
    """Eigendecomposition of a symmetric matrix with gap-clamped gradients.

    Args:
        A: (..., n, n) symmetric.

    Returns:
        (eigenvalues (..., n) ascending, eigenvectors (..., n, n) columns).
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    return jnp.linalg.eigh(A)


@safe_eigh.defjvp
def _safe_eigh_jvp(primals, tangents):
    (A,) = primals
    (dA,) = tangents
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    dA = 0.5 * (dA + jnp.swapaxes(dA, -1, -2))
    w, V = jnp.linalg.eigh(A)
    VT_dA_V = jnp.swapaxes(V, -1, -2) @ dA @ V
    dw = jnp.diagonal(VT_dA_V, axis1=-2, axis2=-1)
    # F_ij = 1/(w_j - w_i) off-diagonal, clamped so degenerate spectra give
    # bounded (not infinite) eigenvector tangents.
    gap = w[..., None, :] - w[..., :, None]
    sign = jnp.where(gap >= 0, 1.0, -1.0)
    gap_clamped = sign * jnp.maximum(jnp.abs(gap), _GAP_EPS)
    F = 1.0 / gap_clamped
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    F = F * (1.0 - eye)
    dV = V @ (F * VT_dA_V)
    return (w, V), (dw, dV)


def smallest_eigvec(A):
    """Unit eigenvector of the smallest eigenvalue of symmetric A (..., n, n) -> (..., n)."""
    _, V = safe_eigh(A)
    return V[..., :, 0]


def weighted_nullvec(X, w):
    """Null vector of a weighted linear system via the Gram trick.

    Equivalent to the last right-singular vector of diag(sqrt(w)) @ X, i.e. the
    minimizer of || diag(sqrt(w)) X v || with ||v|| = 1.

    Args:
        X: (..., N, D) stacked constraint rows.
        w: (..., N) non-negative row weights.

    Returns:
        (..., D) unit null vector.
    """
    G = jnp.einsum("...nd,...n,...ne->...de", X, w, X)
    return smallest_eigvec(G)


def solve_psd(A, b, damping=0.0):
    """Solve A x = b for symmetric positive (semi-)definite A with optional Tikhonov damping.

    Uses Cholesky; callers add LM damping which keeps A well-conditioned.

    Args:
        A: (..., n, n); b: (..., n); damping: scalar or (...,) added to the diagonal.
    Returns:
        x: (..., n)
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    damping = jnp.asarray(damping, dtype=A.dtype)
    A = A + damping[..., None, None] * eye
    chol, low = jax.scipy.linalg.cho_factor(A, lower=True)
    return jax.scipy.linalg.cho_solve((chol, low), b)
