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

import functools

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


def log_sinkhorn_mxu(couplings, log_mu, log_nu, n_iters, absorb_every=10):
    """Stabilized scaling-domain Sinkhorn: the MXU-resident fast path.

    Identical math to `log_sinkhorn` (same u-then-v iteration order), but run
    in the scaling domain: K = exp(couplings + u + v) is materialized once per
    `absorb_every` iterations, and each iteration is two batched matvecs
    (a = mu / K b, b = nu / K^T a) -- MACs on the MXU instead of a full
    (M+1)x(N+1) exp+logsumexp sweep on the VPU. Every `absorb_every` steps the
    scalings are absorbed into the log potentials (Schmitzer's stabilized
    Sinkhorn), which bounds a/b near 1 and keeps f32 exact. Measured on the
    v5e chip (round 2, K=1024, B=10, 100 iterations): 32.2 ms vs 35.3 ms for
    the log-domain scan -- 1.10x, and that measurement is confounded by the
    ~28 ms tunnel dispatch overhead per round trip, so the kernel-only gain
    is larger but unquantified (see BASELINE.md round-2 table).

    The iteration count rounds UP to a multiple of `absorb_every`.
    """
    # 1e-30, NOT 1e-38: f32 subnormals flush to zero on TPU, so a subnormal
    # guard is no guard at all -- a fully-underflowed row/column sum would
    # divide by exactly 0 (same fix as the Pallas scaling kernel)
    tiny = jnp.asarray(1e-30, couplings.dtype)
    mu = jnp.exp(log_mu)
    nu = jnp.exp(log_nu)
    n_absorb = -(-n_iters // absorb_every)

    def absorb_body(carry, _):
        u, v = carry
        # one exact log-domain iteration stabilizes the block: afterwards
        # couplings + u + v is column-normalized (entries <= log_nu < 0), so
        # the exponentiation below cannot overflow even for extreme scores
        u = log_mu - jax.nn.logsumexp(couplings + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, :, None], axis=1)
        K = jnp.exp(couplings + u[:, :, None] + v[:, None, :])

        def inner(_, ab):
            a, b = ab
            a = mu / (jnp.einsum("bmn,bn->bm", K, b) + tiny)
            b = nu / (jnp.einsum("bmn,bm->bn", K, a) + tiny)
            return a, b

        a0 = jnp.ones_like(mu)
        b0 = jnp.ones_like(nu)
        a, b = jax.lax.fori_loop(0, absorb_every - 1, inner, (a0, b0))
        return (u + jnp.log(a + tiny), v + jnp.log(b + tiny)), None

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    (u, v), _ = jax.lax.scan(absorb_body, (u0, v0), None, length=n_absorb)
    return couplings + u[:, :, None] + v[:, None, :]


def augment_couplings(scores, alpha):
    """Dustbin row/column augmentation + SuperGlue marginals.

    Returns (couplings (B, M+1, N+1), log_mu (B, M+1), log_nu (B, N+1), norm).
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
    return couplings, log_mu, log_nu, norm


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _log_sinkhorn_mxu_diff(couplings, log_mu, log_nu, n_iters, absorb_every=10):
    return log_sinkhorn_mxu(couplings, log_mu, log_nu, n_iters, absorb_every)


def _mxu_fwd(couplings, log_mu, log_nu, n_iters, absorb_every):
    out = _log_sinkhorn_mxu_diff(couplings, log_mu, log_nu, n_iters, absorb_every)
    return out, (couplings, log_mu, log_nu)


def _mxu_bwd(n_iters, absorb_every, residuals, g):
    # backward through the log-domain scan (identical fixed point; same
    # pattern as the Pallas kernel's VJP) -- avoids storing the per-absorption
    # K matrices the scaling-domain forward would checkpoint. The forward
    # rounds the iteration count UP to a multiple of absorb_every; use the
    # same effective count so forward and backward match for all n_iters.
    eff_iters = -(-n_iters // absorb_every) * absorb_every
    c, lm, ln = residuals
    _, vjp = jax.vjp(lambda c_, m_, n_: log_sinkhorn(c_, m_, n_, eff_iters), c, lm, ln)
    return vjp(g)


_log_sinkhorn_mxu_diff.defvjp(_mxu_fwd, _mxu_bwd)


def log_optimal_transport(scores, alpha, n_iters, impl="xla"):
    """Dustbin-augmented entropic optimal transport in log space.

    Args:
        scores: (B, M, N) similarity scores.
        alpha: scalar (learnable) dustbin score.
        n_iters: static Sinkhorn iteration count.
        impl: "xla" (log-domain scan) or "mxu" (stabilized scaling domain,
            matvec iterations on the MXU; custom VJP through the log-domain
            scan).
    Returns:
        (B, M+1, N+1) log assignment matrix (probabilities scaled by M+N, like
        the SuperGlue formulation the loss expects).
    """
    couplings, log_mu, log_nu, norm = augment_couplings(scores, alpha)
    if impl == "mxu":
        Z = _log_sinkhorn_mxu_diff(couplings, log_mu, log_nu, n_iters, 10)
    else:
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
