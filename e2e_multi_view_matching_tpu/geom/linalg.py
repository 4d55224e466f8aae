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
import numpy as np

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
    minimizer of || diag(sqrt(w)) X v || with ||v|| = 1. Solved by the
    gap-clamped `safe_eigh` on the 9x9 Gram: this runs once per PAIR (dozens of
    matrices per dispatch -- cheap), and the w8pt system's bottom eigenpair can
    be ill-conditioned enough that a truncated inverse iteration is sensitive
    to batch-shape-dependent rounding; the fully-converged eigh keeps eval
    results invariant to `--eval_batch`. (The per-POINT 3x3/4x4 paths, which
    dominate runtime, use `smallest_eigvec_ii` instead.)

    Args:
        X: (..., N, D) stacked constraint rows.
        w: (..., N) non-negative row weights.

    Returns:
        (..., D) unit null vector.
    """
    G = jnp.einsum("...nd,...n,...ne->...de", X, w, X)
    return smallest_eigvec(G)


# ---------------------------------------------------------------------------
# Closed-form small-matrix kernels.
#
# XLA lowers `jnp.linalg.eigh` to an iterative (QDWH/Jacobi) solver with
# sequential control flow -- catastrophic for millions of batched 3x3/4x4
# problems (round-2 bench: the pose pipeline spent ~800 ms/tuple, dominated by
# per-point eigh in triangulation and the BA loops). The primitives below are
# pure elementwise/matmul code: adjugate inverses, damped inverse iteration
# for smallest eigenvectors, and an unrolled parallel-cyclic Jacobi for the
# thresholded reduced-system solves. All are differentiable compositions of
# smooth guarded ops -- no custom VJPs needed.
# ---------------------------------------------------------------------------


def adj3x3(M):
    """Batched closed-form 3x3 adjugate and determinant.

    adj(M) = det(M) * inv(M); applying the adjugate instead of the inverse
    avoids the det division entirely -- the key to overflow-free inverse
    iteration on (near-)singular shifted matrices, where adj entries stay
    O(|M|^2) while inv entries blow up as 1/det.
    """
    a = M[..., 0, 0]; b = M[..., 0, 1]; c = M[..., 0, 2]
    d = M[..., 1, 0]; e = M[..., 1, 1]; f = M[..., 1, 2]
    g = M[..., 2, 0]; h = M[..., 2, 1]; i = M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), (b * f - c * e)], axis=-1),
            jnp.stack([B, (a * i - c * g), -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), (a * e - b * d)], axis=-1),
        ],
        axis=-2,
    )
    return adj, det


def inv3x3(M, det_eps=1e-30):
    """Batched closed-form 3x3 inverse via the adjugate.

    `det_eps` floors |det| (sign preserved) so singular inputs give large but
    finite results; callers whose singular blocks only ever multiply zero
    vectors (masked observations) stay exact.
    """
    adj, det = adj3x3(M)
    sign = jnp.where(det >= 0, 1.0, -1.0)
    det_safe = sign * jnp.maximum(jnp.abs(det), det_eps)
    return adj / det_safe[..., None, None]


def adj4x4(M):
    """Batched closed-form 4x4 adjugate and determinant (2x2-minor cofactors)."""
    m = M
    # 2x2 minors of the top two rows (s) and bottom two rows (c)
    s0 = m[..., 0, 0] * m[..., 1, 1] - m[..., 1, 0] * m[..., 0, 1]
    s1 = m[..., 0, 0] * m[..., 1, 2] - m[..., 1, 0] * m[..., 0, 2]
    s2 = m[..., 0, 0] * m[..., 1, 3] - m[..., 1, 0] * m[..., 0, 3]
    s3 = m[..., 0, 1] * m[..., 1, 2] - m[..., 1, 1] * m[..., 0, 2]
    s4 = m[..., 0, 1] * m[..., 1, 3] - m[..., 1, 1] * m[..., 0, 3]
    s5 = m[..., 0, 2] * m[..., 1, 3] - m[..., 1, 2] * m[..., 0, 3]
    c5 = m[..., 2, 2] * m[..., 3, 3] - m[..., 3, 2] * m[..., 2, 3]
    c4 = m[..., 2, 1] * m[..., 3, 3] - m[..., 3, 1] * m[..., 2, 3]
    c3 = m[..., 2, 1] * m[..., 3, 2] - m[..., 3, 1] * m[..., 2, 2]
    c2 = m[..., 2, 0] * m[..., 3, 3] - m[..., 3, 0] * m[..., 2, 3]
    c1 = m[..., 2, 0] * m[..., 3, 2] - m[..., 3, 0] * m[..., 2, 2]
    c0 = m[..., 2, 0] * m[..., 3, 1] - m[..., 3, 0] * m[..., 2, 1]
    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    b = [
        [
            m[..., 1, 1] * c5 - m[..., 1, 2] * c4 + m[..., 1, 3] * c3,
            -m[..., 0, 1] * c5 + m[..., 0, 2] * c4 - m[..., 0, 3] * c3,
            m[..., 3, 1] * s5 - m[..., 3, 2] * s4 + m[..., 3, 3] * s3,
            -m[..., 2, 1] * s5 + m[..., 2, 2] * s4 - m[..., 2, 3] * s3,
        ],
        [
            -m[..., 1, 0] * c5 + m[..., 1, 2] * c2 - m[..., 1, 3] * c1,
            m[..., 0, 0] * c5 - m[..., 0, 2] * c2 + m[..., 0, 3] * c1,
            -m[..., 3, 0] * s5 + m[..., 3, 2] * s2 - m[..., 3, 3] * s1,
            m[..., 2, 0] * s5 - m[..., 2, 2] * s2 + m[..., 2, 3] * s1,
        ],
        [
            m[..., 1, 0] * c4 - m[..., 1, 1] * c2 + m[..., 1, 3] * c0,
            -m[..., 0, 0] * c4 + m[..., 0, 1] * c2 - m[..., 0, 3] * c0,
            m[..., 3, 0] * s4 - m[..., 3, 1] * s2 + m[..., 3, 3] * s0,
            -m[..., 2, 0] * s4 + m[..., 2, 1] * s2 - m[..., 2, 3] * s0,
        ],
        [
            -m[..., 1, 0] * c3 + m[..., 1, 1] * c1 - m[..., 1, 2] * c0,
            m[..., 0, 0] * c3 - m[..., 0, 1] * c1 + m[..., 0, 2] * c0,
            -m[..., 3, 0] * s3 + m[..., 3, 1] * s1 - m[..., 3, 2] * s0,
            m[..., 2, 0] * s3 - m[..., 2, 1] * s1 + m[..., 2, 2] * s0,
        ],
    ]
    adj = jnp.stack([jnp.stack(row, axis=-1) for row in b], axis=-2)
    return adj, det


def inv4x4(M, det_eps=1e-30):
    """Batched closed-form 4x4 inverse via the adjugate (floored determinant)."""
    adj, det = adj4x4(M)
    sign = jnp.where(det >= 0, 1.0, -1.0)
    det_safe = sign * jnp.maximum(jnp.abs(det), det_eps)
    return adj / det_safe[..., None, None]


# deterministic inverse-iteration seeds (fixed "generic" unit directions; any
# vector not exactly orthogonal to the target eigenvector works -- a few
# damped-inverse applications shrink the orthogonal complement by
# ~((lam1+eps)/(lam2+eps)) per step)
_II_SEED = {
    3: (0.5377, -0.6312, 0.5594),
    4: (0.4287, -0.5811, 0.3713, 0.5810),
    9: (0.2887, -0.3451, 0.3313, -0.2918, 0.3562, 0.3117, -0.3265, 0.3410, 0.3710),
}


def smallest_eigvec_ii(G, n_iters=4, damp_rel=1e-7):
    """Smallest eigenvector of a symmetric PSD matrix by damped inverse iteration.

    Fast path for 3x3/4x4 Gram matrices (adjugate inverse: pure elementwise
    code, no XLA eigh/Cholesky loop); larger sizes factor once with Cholesky.
    For near-degenerate smallest pairs this converges to *a* vector of the
    bottom eigenspace -- the same arbitrariness `eigh` has.

    Args:
        G: (..., n, n) symmetric PSD.
        n_iters: inverse-iteration steps (static).
        damp_rel: shift as a fraction of mean(trace)/n, keeps the solve finite
            when G is exactly singular (the common case: Gram of a consistent
            DLT system).
    Returns:
        (..., n) unit eigenvector estimate.
    """
    n = G.shape[-1]
    dtype = G.dtype
    tr = jnp.trace(G, axis1=-2, axis2=-1)
    if n > 4:
        # Cholesky path: f32 Gram assembly noise can make G indefinite by
        # ~1e-7 * scale, which would NaN the factorization -- damp past it.
        # (The shift leaves the eigenvectors untouched.)
        damp_rel = max(damp_rel, 2e-6)
    eps = damp_rel * jnp.maximum(tr / n, 1e-30)
    Gd = G + eps[..., None, None] * jnp.eye(n, dtype=dtype)
    seed = _II_SEED.get(n)
    if seed is None:
        seed = tuple(np.sin(1.0 + 2.7 * np.arange(n)) / np.sqrt(n))
    v = jnp.broadcast_to(jnp.asarray(seed, dtype=dtype), G.shape[:-1])
    adj_fn = adj3x3 if n == 3 else adj4x4 if n == 4 else None
    if adj_fn is not None:
        # Inverse iteration via the ADJUGATE: adj(Gd) v is parallel to
        # Gd^{-1} v (the det scalar drops out under normalization), entries
        # stay O(|G|^{n-1}) -- no overflow however singular Gd is.
        Madj, _ = adj_fn(Gd)
    else:
        L = jnp.linalg.cholesky(Gd)

    def _step(v_prev, w):
        """Normalize w; keep v_prev where w degenerated (adj of a matrix with
        >=2 zero eigenvalues is 0) or went non-finite."""
        nsq = jnp.sum(w * w, axis=-1, keepdims=True)
        good = jnp.isfinite(nsq) & (nsq > 1e-30)
        w = jnp.where(good, w, v_prev)
        return w / jnp.sqrt(jnp.maximum(jnp.sum(w * w, axis=-1, keepdims=True), 1e-38))

    for _ in range(n_iters):
        if adj_fn is not None:
            w = jnp.einsum("...ij,...j->...i", Madj, v)
        else:
            y = jax.lax.linalg.triangular_solve(
                L, v[..., None], left_side=True, lower=True
            )
            w = jax.lax.linalg.triangular_solve(
                L, y, left_side=True, lower=True, transpose_a=True
            )[..., 0]
        v = _step(v, w)
    if adj_fn is not None:
        # one Rayleigh-shifted step (cubic local convergence) tightens the
        # moderate-gap case. The shifted matrix is near-singular BY DESIGN;
        # the adjugate application amplifies exactly the wanted direction and
        # cannot overflow, and _step falls back to the unshifted iterate if
        # the bottom eigenpair is so degenerate that adj collapses to 0.
        mu = jnp.einsum("...i,...ij,...j->...", v, G, v)
        shifted = G - (mu - eps)[..., None, None] * jnp.eye(n, dtype=dtype)
        Sadj, _ = adj_fn(shifted)
        v = _step(v, jnp.einsum("...ij,...j->...i", Sadj, v))
    else:
        # Rayleigh-quotient refinement, VALUE-ONLY: two shifted LU solves pin
        # the eigenvector to f32 roundoff (cubic convergence), making the
        # result insensitive to batch-shape-dependent rounding upstream.
        # Gradients bypass the refinement (the shifted solve's VJP is
        # unbounded near convergence) and flow through the smooth damped
        # iterations above instead -- same stabilization safe_eigh's
        # gap-clamped JVP provided.
        v_ref = v
        eye = jnp.eye(n, dtype=dtype)
        for _ in range(2):
            mu = jnp.einsum("...i,...ij,...j->...", v_ref, G, v_ref)
            shifted = G - (mu - eps)[..., None, None] * eye
            w = jnp.linalg.solve(shifted, v_ref[..., None])[..., 0]
            v_ref = _step(v_ref, w)
        v = jax.lax.stop_gradient(v_ref - v) + v
    return v


def _round_robin_rounds(n):
    """Static parallel-Jacobi schedule: list of rounds, each a list of disjoint
    (p, q) index pairs covering every pair once per sweep (circle method)."""
    m = n if n % 2 == 0 else n + 1
    idx = list(range(m))
    rounds = []
    for _ in range(m - 1):
        pairs = []
        for k in range(m // 2):
            a, b = idx[k], idx[m - 1 - k]
            if a < n and b < n:
                pairs.append((min(a, b), max(a, b)))
        rounds.append(pairs)
        idx = [idx[0]] + [idx[-1]] + idx[1:-1]
    return rounds


def jacobi_eigh(A, n_sweeps=8):
    """Batched symmetric eigendecomposition via unrolled parallel-cyclic Jacobi.

    Built for the small reduced systems of the BA solvers (6x6 .. 24x24):
    every rotation round is a static-index gather + two batched matmuls, so the
    whole decomposition is straight-line XLA code (no iterative eigh kernel).
    Cyclic Jacobi converges quadratically; `n_sweeps`~8 reaches f32 roundoff
    for n <= ~32.

    Args:
        A: (..., n, n) symmetric.
        n_sweeps: full sweeps (static).
    Returns:
        (eigenvalues (..., n) UNSORTED, eigenvectors (..., n, n) columns).
    """
    n = A.shape[-1]
    dtype = A.dtype
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    batch = A.shape[:-2]
    V = jnp.broadcast_to(jnp.eye(n, dtype=dtype), batch + (n, n))
    rounds = _round_robin_rounds(n)
    eye = jnp.eye(n, dtype=dtype)
    for _ in range(n_sweeps):
        for pairs in rounds:
            p_idx = np.asarray([p for p, _ in pairs])
            q_idx = np.asarray([q for _, q in pairs])
            app = A[..., p_idx, p_idx]
            aqq = A[..., q_idx, q_idx]
            apq = A[..., p_idx, q_idx]
            x = aqq - app
            y = 2.0 * apq
            # guard the (0, 0) atan2 singularity (exactly degenerate pair)
            x = jnp.where(jnp.abs(x) + jnp.abs(y) < 1e-30, 1e-30, x)
            theta = 0.5 * jnp.arctan2(y, x)
            c = jnp.cos(theta)
            s = jnp.sin(theta)
            # J = I with [p,p]=[q,q]=c, [p,q]=s, [q,p]=-s (static-index adds)
            J = jnp.broadcast_to(eye, batch + (n, n))
            J = J.at[..., p_idx, p_idx].add(c - 1.0)
            J = J.at[..., q_idx, q_idx].add(c - 1.0)
            J = J.at[..., p_idx, q_idx].add(s)
            J = J.at[..., q_idx, p_idx].add(-s)
            A = jnp.swapaxes(J, -1, -2) @ A @ J
            V = V @ J
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    return w, V


def eig_thresholded_solve(S, rhs, rel_thresh=1e-5, n_sweeps=8):
    """Solve S x = rhs for symmetric S, zeroing low-curvature directions.

    Pseudo-inverse semantics of the BA reduced-system solves: directions whose
    eigenvalue is below `rel_thresh * lam_max` (gauge freedoms, f32 assembly
    noise, unobserved cameras) take a zero step instead of an unbounded one.

    Args:
        S: (..., n, n) symmetric; rhs: (..., n).
    Returns:
        (..., n) solution.
    """
    lam, V = jacobi_eigh(S, n_sweeps=n_sweeps)
    lam_max = jnp.maximum(jnp.max(lam, axis=-1, keepdims=True), 1e-12)
    good = lam > rel_thresh * lam_max
    inv_lam = jnp.where(good, 1.0 / jnp.where(good, lam, 1.0), 0.0)
    return jnp.einsum("...ij,...j,...kj,...k->...i", V, inv_lam, V, rhs)


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
