"""Pallas TPU kernel for dustbin-augmented log-Sinkhorn.

Why a kernel: the XLA scan in `ops/sinkhorn.py` streams the (K+1)^2 coupling
matrix from HBM twice per iteration -- at the eval configuration (K = 1024,
100 iterations, 10 pairs) that is ~8 GB of HBM traffic per tuple. One (K+1)^2
f32 matrix is ~4.2 MB, comfortably VMEM-resident, so this kernel loads each
pair's couplings once, runs every iteration out of VMEM, and writes the result
once: ~100x less HBM traffic on the dominant non-matmul op.

Grid: one program per (batch*pair) matrix. The dual potentials u, v live in
VMEM scratch. Shapes need not be 128-aligned (Mosaic pads internally); the
dustbin row/column participates like any other row, exactly as in the XLA
implementation.

Gradients: `log_optimal_transport_pallas` carries a custom VJP that recomputes
the backward pass through the XLA scan implementation (identical math), so the
kernel is safe to use inside training losses too.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2e_multi_view_matching_tpu.ops import sinkhorn as sinkhorn_xla


def _sinkhorn_kernel(coup_hbm, log_mu_ref, log_nu_ref, out_hbm, *, n_iters):
    # couplings stay in HBM; one manual single-buffered DMA in/out per program.
    # (Automatic VMEM blocking double-buffers both the input and output 4.2 MB
    # blocks, which blows the 16 MB VMEM budget inside larger programs.)
    log_mu = log_mu_ref[0, 0]  # (M,)
    log_nu = log_nu_ref[0, 0]  # (N,)
    b = pl.program_id(0)

    def run(scratch, sem_in, sem_out):
        copy_in = pltpu.make_async_copy(coup_hbm.at[b], scratch, sem_in)
        copy_in.start()
        copy_in.wait()
        coup = scratch[:]

        def body(_, uv):
            u, v = uv
            # u = log_mu - logsumexp(coup + v[None, :], axis=1)
            a = coup + v[None, :]
            m1 = jnp.max(a, axis=1)
            u = log_mu - (jnp.log(jnp.sum(jnp.exp(a - m1[:, None]), axis=1)) + m1)
            bb = coup + u[:, None]
            m0 = jnp.max(bb, axis=0)
            v = log_nu - (jnp.log(jnp.sum(jnp.exp(bb - m0[None, :]), axis=0)) + m0)
            return (u, v)

        u0 = jnp.zeros_like(log_mu)
        v0 = jnp.zeros_like(log_nu)
        u, v = jax.lax.fori_loop(0, n_iters, body, (u0, v0))
        scratch[:] = coup + u[:, None] + v[None, :]
        copy_out = pltpu.make_async_copy(scratch, out_hbm.at[b], sem_out)
        copy_out.start()
        copy_out.wait()

    pl.run_scoped(
        run,
        pltpu.VMEM(coup_hbm.shape[1:], coup_hbm.dtype),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    )


def _pallas_sinkhorn(couplings, log_mu, log_nu, n_iters, interpret=False):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, M, N = couplings.shape
    kernel = functools.partial(_sinkhorn_kernel, n_iters=n_iters)
    # marginals ride as (B, 1, M) so every block dimension is either full-size
    # or trivially 1 (the Mosaic sublane/lane tiling constraint)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, M), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, M, N), couplings.dtype),
        interpret=interpret,
    )(couplings, log_mu[:, None, :], log_nu[:, None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def log_optimal_transport_pallas(scores, alpha, n_iters, interpret=None):
    """Drop-in Pallas replacement for `ops.sinkhorn.log_optimal_transport`.

    Args:
        scores: (B, M, N); alpha: scalar dustbin score; n_iters: static.
        interpret: run the kernel in interpreter mode (CPU tests).
    Returns:
        (B, M+1, N+1) log assignment.
    """
    couplings, log_mu, log_nu, norm = _augment(scores, alpha)
    Z = _pallas_sinkhorn(couplings, log_mu, log_nu, n_iters, interpret=interpret)
    return Z - norm


def _augment(scores, alpha):
    B, M, N = scores.shape
    dtype = scores.dtype
    alpha = jnp.asarray(alpha, dtype=dtype)
    bins0 = jnp.full((B, M, 1), alpha, dtype=dtype)
    bins1 = jnp.full((B, 1, N), alpha, dtype=dtype)
    alpha_c = jnp.full((B, 1, 1), alpha, dtype=dtype)
    couplings = jnp.concatenate(
        [jnp.concatenate([scores, bins0], axis=2),
         jnp.concatenate([bins1, alpha_c], axis=2)],
        axis=1,
    )
    ms = jnp.asarray(M, dtype=dtype)
    ns = jnp.asarray(N, dtype=dtype)
    norm = -jnp.log(ms + ns)
    log_mu = jnp.concatenate(
        [jnp.full((M,), norm, dtype=dtype), jnp.asarray([jnp.log(ns) + norm], dtype=dtype)]
    )
    log_nu = jnp.concatenate(
        [jnp.full((N,), norm, dtype=dtype), jnp.asarray([jnp.log(ms) + norm], dtype=dtype)]
    )
    return (
        couplings,
        jnp.broadcast_to(log_mu[None], (B, M + 1)),
        jnp.broadcast_to(log_nu[None], (B, N + 1)),
        norm,
    )


def _fwd(scores, alpha, n_iters, interpret):
    out = log_optimal_transport_pallas(scores, alpha, n_iters, interpret)
    return out, (scores, alpha)


def _bwd(n_iters, interpret, residuals, g):
    scores, alpha = residuals
    # identical math through the XLA scan; its VJP is the kernel's VJP
    _, vjp = jax.vjp(
        lambda s, a: sinkhorn_xla.log_optimal_transport(s, a, n_iters), scores, alpha
    )
    return vjp(g)


log_optimal_transport_pallas.defvjp(_fwd, _bwd)
