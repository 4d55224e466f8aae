"""Multi-head attention over keypoint tokens.

The matcher's GNN alternates self-attention (within a view) and cross-attention
(across views). On TPU both are expressed as one batched MHA over (view, keypoint)
tokens with an additive mask selecting the allowed keys; there is no per-pair
Python loop (contrast the reference's per-pair calls inside the torch submodule,
SURVEY.md section 2.4).

Shapes use (B, Q, D) queries against (B, S, D) keys/values. All matmuls carry
`preferred_element_type=float32` so the MXU accumulates in f32 even under
bfloat16 activations.
"""

import jax.numpy as jnp

_NEG_INF = -1e9


def multi_head_attention(q, k, v, num_heads, mask=None):
    """Scaled dot-product MHA on already-projected tensors.

    Args:
        q: (B, Q, D); k, v: (B, S, D); num_heads: head count (D % num_heads == 0).
        mask: optional (B, Q, S) or (Q, S) boolean, True = attend.

    Returns:
        (B, Q, D) attention output (no output projection).
    """
    B, Q, D = q.shape
    S = k.shape[1]
    h = num_heads
    dh = D // h
    qh = q.reshape(B, Q, h, dh)
    kh = k.reshape(B, S, h, dh)
    vh = v.reshape(B, S, h, dh)
    logits = jnp.einsum("bqhd,bshd->bhqs", qh, kh, preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.asarray(dh, dtype=logits.dtype))
    if mask is not None:
        if mask.ndim == 2:
            mask = mask[None]
        logits = jnp.where(mask[:, None, :, :], logits, _NEG_INF)
    attn = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    attn = attn / (jnp.sum(attn, axis=-1, keepdims=True) + 1e-9)
    attn = attn.astype(v.dtype)
    out = jnp.einsum("bhqs,bshd->bqhd", attn, vh, preferred_element_type=jnp.float32)
    return out.reshape(B, Q, D).astype(q.dtype)


def cross_view_mask(n_views, n_kpts, dtype=bool):
    """(V*K, V*K) mask where token q may attend key s iff they are in different views.

    Used for multi-frame cross-attention: every keypoint jointly attends to all
    other views' keypoints (the reference's multi-frame GNN generalization,
    SURVEY.md section 2.4).
    """
    vid = jnp.repeat(jnp.arange(n_views), n_kpts)
    return (vid[:, None] != vid[None, :]).astype(dtype)


def self_view_mask(n_views, n_kpts, dtype=bool):
    """(V*K, V*K) mask allowing attention only within the same view."""
    vid = jnp.repeat(jnp.arange(n_views), n_kpts)
    return (vid[:, None] == vid[None, :]).astype(dtype)
