"""Log-domain Sinkhorn optimal transport with dustbin augmentation.

Semantics of the SuperGlue-family `log_optimal_transport` that the reference's
matcher submodule implements (SURVEY.md section 2.4): pairwise score matrix
augmented with a learnable dustbin row/column, entropic OT via alternating
row/column log-normalizations, output log-assignment of shape (K0+1, K1+1)
consumed by the match NLL loss (`/root/reference/helpers.py:228-241`).

TPU design: the iteration is a `lax.scan` of two logsumexp sweeps over the
coupled matrix -- memory-bound, so keep everything in registers/VMEM-sized
tiles. XLA fuses the add+logsumexp chain; a Pallas kernel that keeps the scores
matrix resident in VMEM across all iterations is provided for large K in
`ops/sinkhorn_pallas.py` (used when shapes fit).
"""

import jax
import jax.numpy as jnp


def log_sinkhorn(couplings, log_mu, log_nu, n_iters):
    """Alternating log-domain Sinkhorn normalization.

    Args:
        couplings: (B, M, N) log coupling scores.
        log_mu: (B, M) log row marginals; log_nu: (B, N) log column marginals.
        n_iters: static iteration count.
    Returns:
        (B, M, N) log transport plan (couplings + u ⊕ v).
    """

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(couplings + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, :, None], axis=1)
        return (u, v), None

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    (u, v), _ = jax.lax.scan(body, (u0, v0), None, length=n_iters)
    return couplings + u[:, :, None] + v[:, None, :]


def log_optimal_transport(scores, alpha, n_iters):
    """Dustbin-augmented entropic optimal transport in log space.

    Args:
        scores: (B, M, N) similarity scores.
        alpha: scalar (learnable) dustbin score.
        n_iters: static Sinkhorn iteration count.
    Returns:
        (B, M+1, N+1) log assignment matrix (probabilities scaled by M+N, like
        the SuperGlue formulation the loss expects).
    """
    B, M, N = scores.shape
    dtype = scores.dtype
    alpha = jnp.asarray(alpha, dtype=dtype)
    bins0 = jnp.full((B, M, 1), alpha, dtype=dtype)
    bins1 = jnp.full((B, 1, N), alpha, dtype=dtype)
    alpha_c = jnp.full((B, 1, 1), alpha, dtype=dtype)
    couplings = jnp.concatenate(
        [
            jnp.concatenate([scores, bins0], axis=2),
            jnp.concatenate([bins1, alpha_c], axis=2),
        ],
        axis=1,
    )  # (B, M+1, N+1)

    ms = jnp.asarray(M, dtype=dtype)
    ns = jnp.asarray(N, dtype=dtype)
    norm = -jnp.log(ms + ns)
    log_mu = jnp.concatenate(
        [jnp.full((M,), norm, dtype=dtype), jnp.asarray([jnp.log(ns) + norm], dtype=dtype)]
    )
    log_nu = jnp.concatenate(
        [jnp.full((N,), norm, dtype=dtype), jnp.asarray([jnp.log(ms) + norm], dtype=dtype)]
    )
    log_mu = jnp.broadcast_to(log_mu[None], (B, M + 1))
    log_nu = jnp.broadcast_to(log_nu[None], (B, N + 1))
    Z = log_sinkhorn(couplings, log_mu, log_nu, n_iters)
    return Z - norm


def extract_matches(log_p, match_threshold=0.2):
    """Mutual-max match extraction from a dustbin-augmented log assignment.

    Args:
        log_p: (B, M+1, N+1).
        match_threshold: minimum match probability (exp of log_p) to accept.
    Returns:
        (matches0 (B, M) int32 index into N or -1,
         matches1 (B, N) int32 index into M or -1,
         mscores0 (B, M) match probability for view-0 keypoints).
    """
    core = log_p[:, :-1, :-1]
    M = core.shape[1]
    N = core.shape[2]
    idx0 = jnp.argmax(core, axis=2)  # (B, M)
    idx1 = jnp.argmax(core, axis=1)  # (B, N)
    mutual0 = jnp.take_along_axis(idx1, idx0, axis=1) == jnp.arange(M)[None]
    mutual1 = jnp.take_along_axis(idx0, idx1, axis=1) == jnp.arange(N)[None]
    scores0 = jnp.exp(jnp.max(core, axis=2))
    valid0 = jnp.logical_and(mutual0, scores0 > match_threshold)
    scores1 = jnp.exp(jnp.max(core, axis=1))
    valid1 = jnp.logical_and(mutual1, scores1 > match_threshold)
    matches0 = jnp.where(valid0, idx0, -1).astype(jnp.int32)
    matches1 = jnp.where(valid1, idx1, -1).astype(jnp.int32)
    return matches0, matches1, jnp.where(valid0, scores0, 0.0)
