"""Pallas TPU kernels for dustbin-augmented Sinkhorn optimal transport.

Why a kernel: the XLA scan in `ops/sinkhorn.py` streams the (K+1)^2 coupling
matrix from HBM twice per iteration -- at the eval configuration (K = 1024,
100 iterations, 10 pairs) that is ~8 GB of HBM traffic per tuple. One (K+1)^2
f32 matrix is ~4.2 MB, comfortably VMEM-resident, so these kernels load each
pair's couplings once, run every iteration out of VMEM, and write the result
once: ~100x less HBM traffic on the dominant non-matmul op.

Two algorithms share that structure:

- `algorithm="log"`: the exact log-domain iteration (two logsumexp sweeps per
  iteration). VMEM-resident but still VPU-exp-bound: ~2(K+1)^2 transcendentals
  per iteration.
- `algorithm="scaling"` (default): Schmitzer-stabilized scaling domain, the
  Pallas twin of `ops.sinkhorn.log_sinkhorn_mxu`. The first iteration of the
  first absorption block runs in log domain (bounds K = exp(coup+u+v) by the
  column marginals, so extreme scores cannot overflow), then K stays resident
  in VMEM and each iteration is two multiply-reduce sweeps -- no
  transcendentals. Every `absorb_every` iterations the scalings are absorbed
  into the log potentials (u += log a, v += log b) and K is REBUILT as
  exp(coup + u + v) from a second VMEM buffer holding the couplings -- full
  Schmitzer absorption, which revives entries that underflowed to 0 inside
  the block (a multiplicative K *= a b^T carry cannot, and corrupted
  extreme-score inputs -- see `_sinkhorn_scaling_kernel`). The output is
  emitted as coup + u + v, identical formula to the XLA implementations.
  Iteration count rounds UP to a multiple of `absorb_every`, matching
  `log_sinkhorn_mxu`.

Grid: one program per (batch*pair) matrix. The dual potentials u, v live in
VMEM scratch. Shapes need not be 128-aligned (Mosaic pads internally); the
dustbin row/column participates like any other row, exactly as in the XLA
implementation.

Gradients: `log_optimal_transport_pallas` carries a custom VJP with a REAL
Pallas backward kernel (default): the forward-under-grad runs the exact
log-domain iteration while stashing the per-iteration dual potentials u_t, v_t
(vectors -- (iters, K+1) per pair, cheap in HBM), and the backward kernel
replays the iterations in reverse with the couplings VMEM-resident. Each
reverse step rebuilds the row/column softmax matrices P_t, Q_t from the
stashed duals (P_t = exp(coup + u_t + v_{t-1} - log_mu) row-wise,
Q_t = exp(coup + u_t + v_t - log_nu) column-wise -- entries <= 1 by
construction, so the exponentials cannot overflow), accumulates the coupling
cotangent in a second VMEM buffer, and chains the dual cotangents:

    gu_t = [t == T: rowsum(g)] - (Q_t * gv_t).sum(1)
    dC  -= Q_t * gv_t[None, :] + P_t * gu_t[:, None]
    gv_{t-1} = -(P_t * gu_t[:, None]).sum(0)

This is mathematically the VJP of the XLA log-domain scan (same fixed point
the old XLA-recompute backward differentiated) without ever leaving VMEM;
`backward="xla"` keeps the recompute path selectable for A/B tests.
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


def _sinkhorn_scaling_kernel(
    coup_hbm, log_mu_ref, log_nu_ref, out_hbm, *, n_iters, absorb_every
):
    """Stabilized scaling-domain Sinkhorn; couplings AND K both VMEM-resident.

    Every absorption rebuilds K = exp(coup + u + v) from the resident
    couplings (full Schmitzer absorption). An earlier revision carried K
    MULTIPLICATIVELY across blocks (K *= a b^T) to save the rebuild sweep;
    that is wrong under f32: entries that underflow to exactly 0 inside a
    block can never be revived by a later scaling, so extreme-score inputs
    (e.g. random-init descriptors, |coup| ~ 1e3) lose whole rows of mass and
    the output log-assignment blows up to +hundreds (found round 5 via NaN
    conf scores, tools/conf_nan_probe.py: max log_p 444 vs the correct
    log(M+N) ~ 6.9 ceiling). Rebuilding from the log domain revives
    underflowed entries whenever the duals regain their mass, exactly like
    `log_sinkhorn_mxu`'s per-block recompute. Cost: one exp sweep per
    absorption block (10% of iterations) and a second VMEM matrix; in
    exchange the final couplings re-fetch DMA disappears.
    """
    log_mu = log_mu_ref[0, 0]  # (M,)
    log_nu = log_nu_ref[0, 0]  # (N,)
    b = pl.program_id(0)
    n_absorb = -(-n_iters // absorb_every)
    # 1e-30, NOT 1e-38: f32 subnormals flush to zero on TPU, and padded rows
    # have mu = 0 and row-sum = 0, so a subnormal guard would yield 0/0 = NaN
    tiny = jnp.asarray(1e-30, coup_hbm.dtype)

    def run(bufC, bufK, sem_in, sem_out):
        copy_in = pltpu.make_async_copy(coup_hbm.at[b], bufC, sem_in)
        copy_in.start()
        copy_in.wait()
        coup = bufC[:]
        mu = jnp.exp(log_mu)
        nu = jnp.exp(log_nu)

        # Iteration 1, exact log domain: afterwards coup + u + v is
        # column-normalized (entries <= log_nu < 0), so exponentiating below
        # cannot overflow even for extreme scores (same hoisting as
        # `log_sinkhorn_mxu`).
        a1 = coup + jnp.zeros_like(log_nu)[None, :]
        m1 = jnp.max(a1, axis=1)
        u = log_mu - (jnp.log(jnp.sum(jnp.exp(a1 - m1[:, None]), axis=1)) + m1)
        b1 = coup + u[:, None]
        m0 = jnp.max(b1, axis=0)
        v = log_nu - (jnp.log(jnp.sum(jnp.exp(b1 - m0[None, :]), axis=0)) + m0)
        bufK[:] = jnp.exp(coup + u[:, None] + v[None, :])

        def scaling_iters(n, a, bb):
            def inner(_, ab):
                a, bb = ab
                K = bufK[:]
                a = mu / (jnp.sum(K * bb[None, :], axis=1) + tiny)
                bb = nu / (jnp.sum(K * a[:, None], axis=0) + tiny)
                return a, bb

            return jax.lax.fori_loop(n, absorb_every, inner, (a, bb))

        def absorb(a, bb, u, v):
            u = u + jnp.log(a + tiny)
            v = v + jnp.log(bb + tiny)
            # full re-exponentiation from the resident couplings -- NOT
            # bufK *= a b^T (see docstring: multiplicative carry cannot
            # revive underflowed entries and corrupts extreme-score inputs)
            bufK[:] = jnp.exp(bufC[:] + u[:, None] + v[None, :])
            return u, v

        # Block 1: the exact iteration above + (absorb_every - 1) scaling
        # iterations; blocks 2..n_absorb: absorb_every scaling iterations each.
        # In exact arithmetic this is the same u-then-v sequence as
        # `log_sinkhorn`, absorb_every * n_absorb iterations total.
        a, bb = scaling_iters(1, jnp.ones_like(mu), jnp.ones_like(nu))
        u, v = absorb(a, bb, u, v)

        def block(_, uv):
            u, v = uv
            a, bb = scaling_iters(0, jnp.ones_like(mu), jnp.ones_like(nu))
            return absorb(a, bb, u, v)

        u, v = jax.lax.fori_loop(0, n_absorb - 1, block, (u, v))

        # Emit coup + u + v from the still-resident couplings (the XLA paths'
        # exact output formula; no re-fetch DMA needed).
        bufK[:] = bufC[:] + (u[:, None] + v[None, :])
        copy_out = pltpu.make_async_copy(bufK, out_hbm.at[b], sem_out)
        copy_out.start()
        copy_out.wait()

    pl.run_scoped(
        run,
        pltpu.VMEM(coup_hbm.shape[1:], coup_hbm.dtype),
        pltpu.VMEM(coup_hbm.shape[1:], coup_hbm.dtype),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    )


def _sinkhorn_log_stash_kernel(
    coup_hbm, log_mu_ref, log_nu_ref, out_hbm, u_hbm, v_hbm, *, n_iters
):
    """Exact log-domain iteration that also stashes every u_t, v_t.

    Identical math to `_sinkhorn_kernel`; the stashed duals are what the
    backward kernel needs to rebuild the per-iteration softmax matrices, and
    they are only vectors: (iters, M) + (iters, N) per pair.
    """
    log_mu = log_mu_ref[0, 0]  # (M,)
    log_nu = log_nu_ref[0, 0]  # (N,)
    b = pl.program_id(0)

    def run(scratch, uacc, vacc, sem_in, sem_out, sem_u, sem_v):
        copy_in = pltpu.make_async_copy(coup_hbm.at[b], scratch, sem_in)
        copy_in.start()
        copy_in.wait()
        coup = scratch[:]

        def body(t, uv):
            u, v = uv
            a = coup + v[None, :]
            m1 = jnp.max(a, axis=1)
            u = log_mu - (jnp.log(jnp.sum(jnp.exp(a - m1[:, None]), axis=1)) + m1)
            bb = coup + u[:, None]
            m0 = jnp.max(bb, axis=0)
            v = log_nu - (jnp.log(jnp.sum(jnp.exp(bb - m0[None, :]), axis=0)) + m0)
            uacc[pl.ds(t, 1), :] = u[None, :]
            vacc[pl.ds(t, 1), :] = v[None, :]
            return (u, v)

        u0 = jnp.zeros_like(log_mu)
        v0 = jnp.zeros_like(log_nu)
        u, v = jax.lax.fori_loop(0, n_iters, body, (u0, v0))
        scratch[:] = coup + u[:, None] + v[None, :]
        copies = [
            pltpu.make_async_copy(scratch, out_hbm.at[b], sem_out),
            pltpu.make_async_copy(uacc, u_hbm.at[b], sem_u),
            pltpu.make_async_copy(vacc, v_hbm.at[b], sem_v),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

    Tp = u_hbm.shape[1]
    pl.run_scoped(
        run,
        pltpu.VMEM(coup_hbm.shape[1:], coup_hbm.dtype),
        pltpu.VMEM((Tp, coup_hbm.shape[1]), coup_hbm.dtype),
        pltpu.VMEM((Tp, coup_hbm.shape[2]), coup_hbm.dtype),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    )


def _sinkhorn_bwd_kernel(
    coup_hbm, u_hbm, v_hbm, g_hbm, log_mu_ref, log_nu_ref, dcoup_hbm, *, n_iters
):
    """Reverse-mode sweep through the log-domain Sinkhorn iterations.

    The couplings and the cotangent accumulator stay VMEM-resident; each
    reverse step costs two exp sweeps + two multiply-reduce sweeps over the
    matrix (the backward twin of one forward iteration). Exponent grouping is
    chosen so the padded rows/columns (coupling/marginal = -1e30) cancel to
    exp(0) = 1 against zero cotangents instead of producing inf/NaN.
    """
    log_mu = log_mu_ref[0, 0]  # (M,)
    log_nu = log_nu_ref[0, 0]  # (N,)
    b = pl.program_id(0)

    def run(bufC, bufG, bufU, bufV, sem_c, sem_g, sem_u, sem_v, sem_out):
        copies = [
            pltpu.make_async_copy(coup_hbm.at[b], bufC, sem_c),
            pltpu.make_async_copy(g_hbm.at[b], bufG, sem_g),
            pltpu.make_async_copy(u_hbm.at[b], bufU, sem_u),
            pltpu.make_async_copy(v_hbm.at[b], bufV, sem_v),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        coup = bufC[:]
        g = bufG[:]
        gu0 = jnp.sum(g, axis=1)  # \bar{u}_T direct term
        gv0 = jnp.sum(g, axis=0)  # \bar{v}_T direct term

        def step(s, gv):
            t = n_iters - 1 - s
            u_t = bufU[pl.ds(t, 1), :][0]
            v_t = bufV[pl.ds(t, 1), :][0]
            v_prev = jnp.where(
                t > 0, bufV[pl.ds(jnp.maximum(t - 1, 0), 1), :][0], 0.0
            )
            # column softmax of (coup + u_t): entries <= 1, exponent <= ~0
            Q = jnp.exp((coup + u_t[:, None]) + (v_t - log_nu)[None, :])
            tmp = Q * gv[None, :]
            gu = jnp.where(s == 0, gu0, 0.0) - jnp.sum(tmp, axis=1)
            # row softmax of (coup + v_{t-1})
            P = jnp.exp((coup + v_prev[None, :]) + (u_t - log_mu)[:, None])
            tmp2 = P * gu[:, None]
            bufG[:] = bufG[:] - (tmp + tmp2)
            return -jnp.sum(tmp2, axis=0)

        jax.lax.fori_loop(0, n_iters, step, gv0)
        copy_out = pltpu.make_async_copy(bufG, dcoup_hbm.at[b], sem_out)
        copy_out.start()
        copy_out.wait()

    Tp = u_hbm.shape[1]
    pl.run_scoped(
        run,
        pltpu.VMEM(coup_hbm.shape[1:], coup_hbm.dtype),
        pltpu.VMEM(coup_hbm.shape[1:], coup_hbm.dtype),
        pltpu.VMEM((Tp, coup_hbm.shape[1]), coup_hbm.dtype),
        pltpu.VMEM((Tp, coup_hbm.shape[2]), coup_hbm.dtype),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    )


_PAD_NEG = -1e30  # effectively -inf without inf-inf NaN hazards


def _pad_all(couplings, log_mu, log_nu):
    """Pad matrix dims to multiples of 128 with inert -1e30 rows/columns."""
    B, M, N = couplings.shape
    Mp = -(-M // 128) * 128
    Np = -(-N // 128) * 128
    if (Mp != M) or (Np != N):
        couplings = jnp.pad(couplings, ((0, 0), (0, Mp - M), (0, Np - N)),
                            constant_values=_PAD_NEG)
        log_mu = jnp.pad(log_mu, ((0, 0), (0, Mp - M)), constant_values=_PAD_NEG)
        log_nu = jnp.pad(log_nu, ((0, 0), (0, Np - N)), constant_values=_PAD_NEG)
    return couplings, log_mu, log_nu, Mp, Np


def _pallas_sinkhorn_stash(couplings, log_mu, log_nu, n_iters, interpret=None):
    """Forward log-domain kernel returning (Z, U, V) with per-iteration duals."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, M, N = couplings.shape
    couplings, log_mu, log_nu, Mp, Np = _pad_all(couplings, log_mu, log_nu)
    Tp = -(-n_iters // 8) * 8  # sublane-aligned stash rows
    kernel = functools.partial(_sinkhorn_log_stash_kernel, n_iters=n_iters)
    Z, U, V = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, Mp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Mp, Np), couplings.dtype),
            jax.ShapeDtypeStruct((B, Tp, Mp), couplings.dtype),
            jax.ShapeDtypeStruct((B, Tp, Np), couplings.dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(couplings, log_mu[:, None, :], log_nu[:, None, :])
    return Z[:, :M, :N], U, V


def _pallas_sinkhorn_bwd(couplings, U, V, g, log_mu, log_nu, n_iters,
                         interpret=None):
    """Backward kernel: cotangent of Z w.r.t. the (unpadded) couplings."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, M, N = couplings.shape
    couplings, log_mu, log_nu, Mp, Np = _pad_all(couplings, log_mu, log_nu)
    if (Mp != M) or (Np != N):
        # zero cotangent on padding keeps the padded algebra inert
        g = jnp.pad(g, ((0, 0), (0, Mp - M), (0, Np - N)))
    kernel = functools.partial(_sinkhorn_bwd_kernel, n_iters=n_iters)
    dcoup = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, Mp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, Mp, Np), couplings.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(couplings, U, V, g, log_mu[:, None, :], log_nu[:, None, :])
    return dcoup[:, :M, :N]


def _pallas_sinkhorn(couplings, log_mu, log_nu, n_iters, interpret=False,
                     algorithm="scaling", absorb_every=10):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, M, N = couplings.shape
    # Pad both matrix dims to multiples of 128: the dustbin makes the shapes
    # (K+1)^2, and unaligned DMA/scratch shapes fail Mosaic compilation (and
    # would be internally masked anyway). Padded rows/columns carry coupling
    # _PAD_NEG and marginal _PAD_NEG (mu = exp(-1e30) = 0), which makes them
    # exactly inert: their K-entries are 0, their scalings collapse to 0, and
    # real rows/columns never see a contribution from them.
    Mp = -(-M // 128) * 128
    Np = -(-N // 128) * 128
    padded = (Mp != M) or (Np != N)
    if padded:
        couplings = jnp.pad(couplings, ((0, 0), (0, Mp - M), (0, Np - N)),
                            constant_values=_PAD_NEG)
        log_mu = jnp.pad(log_mu, ((0, 0), (0, Mp - M)),
                         constant_values=_PAD_NEG)
        log_nu = jnp.pad(log_nu, ((0, 0), (0, Np - N)),
                         constant_values=_PAD_NEG)
    if algorithm == "scaling":
        kernel = functools.partial(
            _sinkhorn_scaling_kernel, n_iters=n_iters, absorb_every=absorb_every
        )
    else:
        kernel = functools.partial(_sinkhorn_kernel, n_iters=n_iters)
    # marginals ride as (B, 1, Mp) so every block dimension is either full-size
    # or trivially 1 (the Mosaic sublane/lane tiling constraint)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, Mp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, Mp, Np), couplings.dtype),
        interpret=interpret,
        # raise Mosaic's default 16 MB VMEM cap (v5e has 128 MB physical):
        # the scaling kernel holds TWO resident matrices (couplings + K),
        # 2 * Mp*Np*4 bytes -- 37.8 MB at K=2048
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(couplings, log_mu[:, None, :], log_nu[:, None, :])
    return out[:, :M, :N] if padded else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def log_optimal_transport_pallas(scores, alpha, n_iters, interpret=None,
                                 algorithm="scaling", backward="pallas"):
    """Drop-in Pallas replacement for `ops.sinkhorn.log_optimal_transport`.

    Args:
        scores: (B, M, N); alpha: scalar dustbin score; n_iters: static.
        interpret: run the kernel in interpreter mode (CPU tests).
        algorithm: "scaling" (stabilized scaling domain, no per-iteration
            transcendentals; rounds n_iters UP to a multiple of 10, like
            `log_sinkhorn_mxu`) or "log" (exact log-domain iteration).
        backward: "pallas" (real VMEM-resident backward kernel; the
            forward-under-grad runs the exact log-domain stash kernel at the
            same effective iteration count) or "xla" (recompute the VJP
            through the XLA log scan -- the pre-round-4 behavior).
    Returns:
        (B, M+1, N+1) log assignment.
    """
    couplings, log_mu, log_nu, norm = _augment(scores, alpha)
    Z = _pallas_sinkhorn(couplings, log_mu, log_nu, n_iters,
                         interpret=interpret, algorithm=algorithm)
    return Z - norm


def _eff_iters(n_iters, algorithm):
    # the scaling primal rounds UP to a multiple of 10; fwd-under-grad and
    # backward must differentiate the same effective fixed point
    return -(-n_iters // 10) * 10 if algorithm == "scaling" else n_iters


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


def _fwd(scores, alpha, n_iters, interpret, algorithm, backward):
    if backward == "xla":
        out = log_optimal_transport_pallas(scores, alpha, n_iters, interpret,
                                           algorithm, backward)
        return out, (scores, alpha, None, None)
    couplings, log_mu, log_nu, norm = _augment(scores, alpha)
    Z, U, V = _pallas_sinkhorn_stash(
        couplings, log_mu, log_nu, _eff_iters(n_iters, algorithm),
        interpret=interpret,
    )
    return Z - norm, (scores, alpha, U, V)


def _bwd(n_iters, interpret, algorithm, backward, residuals, g):
    scores, alpha, U, V = residuals
    eff = _eff_iters(n_iters, algorithm)
    if backward == "xla":
        # recompute the VJP through the XLA scan (identical math)
        _, vjp = jax.vjp(
            lambda s, a: sinkhorn_xla.log_optimal_transport(s, a, eff),
            scores, alpha,
        )
        return vjp(g)
    B, M, N = scores.shape
    couplings, log_mu, log_nu, _ = _augment(scores, alpha)
    dcoup = _pallas_sinkhorn_bwd(couplings, U, V, g, log_mu, log_nu, eff,
                                 interpret=interpret)
    dscores = dcoup[:, :M, :N]
    dalpha = (jnp.sum(dcoup[:, :M, N]) + jnp.sum(dcoup[:, M, :N])
              + jnp.sum(dcoup[:, M, N])).astype(jnp.asarray(alpha).dtype)
    return dscores, dalpha


log_optimal_transport_pallas.defvjp(_fwd, _bwd)
