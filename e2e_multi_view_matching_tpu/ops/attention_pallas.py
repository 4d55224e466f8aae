"""Pallas TPU kernel: fused masked attention over (view, keypoint) tokens.

The matcher's cross-attention attends every keypoint to all other views'
keypoints: S = V*K tokens (5120 at the eval config). XLA materializes the
(heads, S, S) logits in HBM (~420 MB of traffic per layer, twice with the
softmax); this kernel keeps each query tile's scores in VMEM, computes the
cross-view mask from token indices on the fly (no mask tensor at all), and
streams K/V once per (batch, head).

Gradients recompute through the XLA reference implementation (identical math),
like `ops/sinkhorn_pallas.py`.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2e_multi_view_matching_tpu.ops.attention import multi_head_attention

_NEG_INF = -1e9


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

    block_q = min(256, S)
    while S % block_q:
        block_q //= 2
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


def _fwd(q, k, v, num_heads, n_views, n_kpts, mode, interpret):
    out = fused_view_attention(q, k, v, num_heads, n_views, n_kpts, mode, interpret)
    return out, (q, k, v)


def _bwd(num_heads, n_views, n_kpts, mode, interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: _ref_attention(q, k, v, num_heads, n_views, n_kpts, mode),
        q, k, v,
    )
    return vjp(g)


fused_view_attention.defvjp(_fwd, _bwd)
