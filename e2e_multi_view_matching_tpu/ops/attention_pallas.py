"""Pallas TPU kernel: fused masked attention over (view, keypoint) tokens.

The matcher's cross-attention attends every keypoint to all other views'
keypoints: S = V*K tokens (5120 at the eval config). XLA materializes the
(heads, S, S) logits in HBM (~420 MB of traffic per layer, twice with the
softmax); this kernel keeps each query tile's scores in VMEM, computes the
cross-view mask from token indices on the fly (no mask tensor at all), and
streams K/V once per (batch, head).

Gradients: the cross-view path carries a REAL flash-style backward (round 4) --
the forward-under-grad additionally stashes the per-row log-sum-exp, and two
backward kernels recompute the probability tiles on the fly (never
materializing the (S, S) matrix) with the same own-view block skipping as the
forward: a dq kernel streaming the other views' key/value chunks per query
tile, and a dk/dv kernel holding one view's keys/values resident while
streaming the other views' query tiles. The self/full modes (per-view S = K
matrices, small) keep the XLA-recompute VJP.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2e_multi_view_matching_tpu.ops.attention import multi_head_attention

_NEG_INF = -1e9


def _pick_block(S, cap=256):
    """Largest sublane-aligned divisor of S up to `cap`.

    The old halving loop degraded to 16-row tiles at the K=400 training shape
    (400 and 2000 are not powers of two); 16-row blocks waste 8x of the MXU's
    128-row systolic dimension. Preferring divisors picks 200 there.
    """
    best = 1
    for d in range(8, cap + 1, 8):
        if S % d == 0:
            best = d
    if best > 1:
        return best
    block = min(cap, S)
    while S % block:
        block //= 2
    return block


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_kpts, mode, block_q):
    # q: (1, bq, dh); k, v: (1, S, dh); o: (1, bq, dh)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    S = k.shape[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (bq, S)
    if mode != "full":
        qt = pl.program_id(1)
        rows = qt * block_q + jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], S), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], S), 1)
        q_view = rows // n_kpts
        k_view = cols // n_kpts
        allow = q_view != k_view if mode == "cross" else q_view == k_view
        s = jnp.where(allow, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    o_ref[0] = (jnp.dot(p, v, preferred_element_type=jnp.float32) / (denom + 1e-9)).astype(
        o_ref.dtype
    )


def _cross_attn_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                       scale, n_other):
    """Flash-style cross-attention step over ONE other view's key chunk.

    Grid is (BH, n_qtiles, n_other); the k/v BlockSpec index map routes chunk
    `w` to the w-th view that is NOT the query tile's own view, so the masked
    own-view block is never loaded, scored, or summed: 1/V of the QK^T and PV
    FLOPs (and the whole mask computation) disappear instead of being computed
    and discarded. Running max/denominator/accumulator live in VMEM scratch
    across the innermost grid dimension (the standard online-softmax pattern).

    Numerics: the online-softmax rescaling reorders the f32 summation, so
    outputs drift from the one-shot XLA softmax by up to ~1e-3 at eval shapes
    (V=5, K=1024; measured on hardware, tools/attn_kernel_bench.py) -- growing
    with the summed token count V*K. The drift is pinned by
    tests/test_ops_models.py::test_chunked_softmax_drift_bounded; the custom
    VJP differentiates the same online formulation (stashed LSE), so forward
    and backward are mutually consistent.
    """
    w = pl.program_id(2)

    @pl.when(w == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (bq, Kc)
    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        p, v.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(w == n_other - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] / (l_ref[:, :1] + 1e-9)).astype(o_ref.dtype)


def _cross_attn_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref,
                           acc_ref, *, scale, n_other):
    """Forward cross-attention step that also emits the per-row logsumexp
    (the residual the flash backward kernels need)."""
    w = pl.program_id(2)

    @pl.when(w == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        p, v.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(w == n_other - 1)
    def _finish():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[...] / (l + 1e-9)).astype(o_ref.dtype)
        # LSE rides broadcast over the 128 lanes (Mosaic requires last-dim
        # blocks of 128; a (1, block_q) layout is rejected)
        lse_ref[0] = jnp.broadcast_to(
            m_ref[:, :1] + jnp.log(l + 1e-9), lse_ref.shape[1:]
        ).astype(lse_ref.dtype)


def _cross_attn_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref,
                              dq_ref, acc_ref, *, scale, n_other):
    """dq tile accumulation: stream the other views' k/v chunks (own view is
    never loaded, like the forward)."""
    w = pl.program_id(2)

    @pl.when(w == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse_ref[0][:, :1])
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - dvec_ref[0][:, :1])
    acc_ref[...] = acc_ref[...] + jnp.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    )

    @pl.when(w == n_other - 1)
    def _finish():
        dq_ref[0] = (acc_ref[...] * scale).astype(dq_ref.dtype)


def _cross_attn_bwd_dkv_kernel(q_ref, do_ref, k_ref, v_ref, lse_ref, dvec_ref,
                               dk_ref, dv_ref, acck_ref, accv_ref, *,
                               scale, n_oq):
    """dk/dv for one view's keys: hold the view's k/v resident, stream every
    OTHER view's query tiles (the transpose of the forward's access pattern)."""
    u = pl.program_id(2)

    @pl.when(u == 0)
    def _init():
        acck_ref[...] = jnp.zeros_like(acck_ref)
        accv_ref[...] = jnp.zeros_like(accv_ref)

    q = q_ref[0]
    do = do_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (bq, K)
    p = jnp.exp(s - lse_ref[0][:, :1])
    accv_ref[...] = accv_ref[...] + jnp.dot(
        p.astype(do.dtype).T, do, preferred_element_type=jnp.float32
    )
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - dvec_ref[0][:, :1])
    acck_ref[...] = acck_ref[...] + jnp.dot(
        ds.astype(q.dtype).T, q, preferred_element_type=jnp.float32
    )

    @pl.when(u == n_oq - 1)
    def _finish():
        dk_ref[0] = (acck_ref[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = accv_ref[...].astype(dv_ref.dtype)


def _fused_cross_attention_fwd_lse(q, k, v, scale, n_views, n_kpts, block_q,
                                   interpret):
    """Forward with LSE stash (used only under differentiation)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    BH, S, dh = q.shape
    n_qtiles = S // block_q
    tiles_per_view = n_kpts // block_q
    n_other = n_views - 1
    kernel = functools.partial(
        _cross_attn_lse_kernel, scale=scale, n_other=n_other
    )

    def kv_index(b, qt, w):
        qv = qt // tiles_per_view
        return (b, w + (w >= qv).astype(jnp.int32), 0)

    return pl.pallas_call(
        kernel,
        grid=(BH, n_qtiles, n_other),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, t, w: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kpts, dh), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kpts, dh), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, t, w: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda b, t, w: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S, dh), q.dtype),
            jax.ShapeDtypeStruct((BH, S, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, dh), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


def _fused_cross_attention_bwd(q, k, v, do, lse, dvec, scale, n_views, n_kpts,
                               block_q, interpret):
    """Flash backward over the cross-view structure -> (dq, dk, dv)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    BH, S, dh = q.shape
    n_qtiles = S // block_q
    tiles_per_view = n_kpts // block_q
    n_other = n_views - 1
    n_oq = n_other * tiles_per_view

    def kv_index(b, qt, w):
        qv = qt // tiles_per_view
        return (b, w + (w >= qv).astype(jnp.int32), 0)

    dq = pl.pallas_call(
        functools.partial(_cross_attn_bwd_dq_kernel, scale=scale,
                          n_other=n_other),
        grid=(BH, n_qtiles, n_other),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, t, w: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kpts, dh), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kpts, dh), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dh), lambda b, t, w: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda b, t, w: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda b, t, w: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda b, t, w: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, S, dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dh), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, lse, dvec)

    def q_index(b, kv, u):
        # u-th query tile among views != kv
        qv_raw = u // tiles_per_view
        qv = qv_raw + (qv_raw >= kv).astype(jnp.int32)
        return (b, qv * tiles_per_view + u % tiles_per_view, 0)

    dk, dv = pl.pallas_call(
        functools.partial(_cross_attn_bwd_dkv_kernel, scale=scale, n_oq=n_oq),
        grid=(BH, n_views, n_oq),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), q_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dh), q_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kpts, dh), lambda b, kv, u: (b, kv, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kpts, dh), lambda b, kv, u: (b, kv, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), q_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), q_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_kpts, dh), lambda b, kv, u: (b, kv, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kpts, dh), lambda b, kv, u: (b, kv, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S, dh), q.dtype),
            jax.ShapeDtypeStruct((BH, S, dh), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_kpts, dh), jnp.float32),
            pltpu.VMEM((n_kpts, dh), jnp.float32),
        ],
        interpret=interpret,
    )(q, do, k, v, lse, dvec)
    return dq, dk, dv


def _fused_cross_attention_raw(q, k, v, scale, n_views, n_kpts, block_q,
                               interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    BH, S, dh = q.shape
    n_qtiles = S // block_q
    tiles_per_view = n_kpts // block_q
    n_other = n_views - 1
    kernel = functools.partial(
        _cross_attn_kernel, scale=scale, n_other=n_other
    )

    def kv_index(b, qt, w):
        # w-th view that is not the query tile's own view
        qv = qt // tiles_per_view
        return (b, w + (w >= qv).astype(jnp.int32), 0)

    return pl.pallas_call(
        kernel,
        grid=(BH, n_qtiles, n_other),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, t, w: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kpts, dh), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kpts, dh), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda b, t, w: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, S, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, dh), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


def _fused_attention_raw(q, k, v, scale, n_kpts, mode, block_q, interpret):
    if interpret is None:
        # transparently interpretable off-TPU (CPU tests, debugging)
        interpret = jax.default_backend() != "tpu"
    BH, S, dh = q.shape
    grid = (BH, S // block_q)
    kernel = functools.partial(
        _attn_kernel, scale=scale, n_kpts=n_kpts, mode=mode, block_q=block_q
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, dh), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, dh), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, S, dh), q.dtype),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_view_attention(q, k, v, num_heads, n_views, n_kpts, mode="cross",
                         interpret=None):
    """Masked MHA over view/keypoint tokens, VMEM-fused.

    Drop-in for `ops.attention.multi_head_attention` with the view-structured
    mask computed in-kernel.

    Args:
        q, k, v: (B, S, D) projected tensors with S = n_views * n_kpts.
        num_heads: head count; n_views, n_kpts: token structure (static).
        mode: "cross" (attend other views), "self" (attend own view), or
            "full" (no mask).
    Returns:
        (B, S, D) attention output (no output projection).
    """
    B, S, D = q.shape
    h = num_heads
    dh = D // h

    def split(x):
        # (B, S, D) -> (B*h, S, dh)
        return x.reshape(B, S, h, dh).transpose(0, 2, 1, 3).reshape(B * h, S, dh)

    block_q = _pick_block(n_kpts) if mode == "cross" else _pick_block(S)
    scale = 1.0 / (dh ** 0.5)
    if mode == "cross" and n_views > 1 and n_kpts % block_q == 0:
        # own-view key blocks are skipped entirely (never DMA'd or scored)
        out = _fused_cross_attention_raw(
            split(q), split(k), split(v), scale, n_views, n_kpts, block_q,
            interpret,
        )
    else:
        out = _fused_attention_raw(
            split(q), split(k), split(v), scale, n_kpts, mode, block_q, interpret
        )
    return (
        out.reshape(B, h, S, dh).transpose(0, 2, 1, 3).reshape(B, S, D)
    )


def _ref_attention(q, k, v, num_heads, n_views, n_kpts, mode):
    if mode == "full":
        mask = None
    else:
        from e2e_multi_view_matching_tpu.ops.attention import (
            cross_view_mask,
            self_view_mask,
        )

        mask = (cross_view_mask if mode == "cross" else self_view_mask)(
            n_views, n_kpts
        )
    return multi_head_attention(q, k, v, num_heads, mask=mask)


def _split_merge(B, S, h, dh):
    def split(x):
        return x.reshape(B, S, h, dh).transpose(0, 2, 1, 3).reshape(B * h, S, dh)

    def merge(x):
        return x.reshape(B, h, S, dh).transpose(0, 2, 1, 3).reshape(B, S, h * dh)

    return split, merge


def _use_flash_bwd(S, n_views, n_kpts, mode):
    # cross tiles must not straddle views: block from the per-view token count
    block_q = _pick_block(n_kpts) if mode == "cross" else _pick_block(S)
    return (mode == "cross" and n_views > 1 and n_kpts % block_q == 0), block_q


def _fwd(q, k, v, num_heads, n_views, n_kpts, mode, interpret):
    B, S, D = q.shape
    h = num_heads
    dh = D // h
    flash, block_q = _use_flash_bwd(S, n_views, n_kpts, mode)
    if not flash:
        out = fused_view_attention(q, k, v, num_heads, n_views, n_kpts, mode,
                                   interpret)
        return out, (q, k, v, None, None)
    split, merge = _split_merge(B, S, h, dh)
    scale = 1.0 / (dh ** 0.5)
    o_s, lse = _fused_cross_attention_fwd_lse(
        split(q), split(k), split(v), scale, n_views, n_kpts, block_q, interpret
    )
    return merge(o_s), (q, k, v, o_s, lse)


def _bwd(num_heads, n_views, n_kpts, mode, interpret, residuals, g):
    q, k, v, o_s, lse = residuals
    B, S, D = q.shape
    h = num_heads
    dh = D // h
    flash, block_q = _use_flash_bwd(S, n_views, n_kpts, mode)
    if not flash:
        _, vjp = jax.vjp(
            lambda q, k, v: _ref_attention(q, k, v, num_heads, n_views, n_kpts,
                                           mode),
            q, k, v,
        )
        return vjp(g)
    split, merge = _split_merge(B, S, h, dh)
    do_s = split(g)
    dvec = jnp.broadcast_to(
        jnp.sum(do_s.astype(jnp.float32) * o_s.astype(jnp.float32), axis=-1,
                keepdims=True),
        (B * h, S, 128),
    )
    scale = 1.0 / (dh ** 0.5)
    dq_s, dk_s, dv_s = _fused_cross_attention_bwd(
        split(q), split(k), split(v), do_s, lse, dvec, scale, n_views, n_kpts,
        block_q, interpret,
    )
    return merge(dq_s), merge(dk_s), merge(dv_s)


fused_view_attention.defvjp(_fwd, _bwd)
