"""Multi-view attentional GNN matcher with Sinkhorn assignment and confidence MLP.

Re-designs the reference's `MultiViewMatcher` (missing torch submodule; behavioral
contract reconstructed in SURVEY.md section 2.4 from call sites
`/root/reference/train.py:343-357`, `/root/reference/helpers.py:243-260`) as a
single batched TPU program:

- All views' keypoints form one (B, V*K, D) token tensor. Self-attention runs
  per view (reshape, no mask); cross-attention is one masked MHA where every
  keypoint attends to all other views' keypoints jointly -- the paper's
  multi-frame generalization, with the two-view matcher being the V=2 special
  case of the same code path (no separate implementation).
- All C(V,2) view pairs are scored in one einsum and run through Sinkhorn as one
  (B*P, K+1, K+1) batch: no per-pair Python loop inside jit.
- The confidence MLP (stage-2 / pose-loss head) scores each view-i keypoint of a
  pair from its final descriptor, the matched view-j descriptor, and the match
  probability. (Internals of the reference's conf_mlp are unverifiable -- the
  submodule is absent -- so this is our design; the output contract
  `conf_scores_{i}_{j}: (B, K, 1)` matches the call sites.)

Output keys mirror the reference result dict: `scores_{i}_{j}` (log assignment,
(B, K+1, K+1)), `matches{i}_{i}_{j}` ((B, K) int, -1 = unmatched),
`conf_scores_{i}_{j}` ((B, K, 1)).
"""

from dataclasses import dataclass, field
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from e2e_multi_view_matching_tpu.ops.attention import cross_view_mask, multi_head_attention
from e2e_multi_view_matching_tpu.ops.sinkhorn import extract_matches, log_optimal_transport


def default_gnn_layers(gnn_layers: int = 9, cross_attention_layers: int = 1) -> Tuple[str, ...]:
    """Layer schedule builder matching `train.py:345`:
    (['self'] + ['cross'] * c) * g."""
    return tuple((["self"] + ["cross"] * cross_attention_layers) * gnn_layers)


@dataclass(frozen=True)
class MatcherConfig:
    """Config keys mirror the reference matcher config (SURVEY.md section 2.4)."""

    descriptor_dim: int = 256
    keypoint_encoder: Tuple[int, ...] = (32, 64, 128, 256)
    gnn_layers: Tuple[str, ...] = field(default_factory=default_gnn_layers)
    num_heads: int = 4
    sinkhorn_iterations: int = 100
    sinkhorn_impl: str = "xla"  # "xla" (log-domain scan) | "mxu" (stabilized
    # scaling-domain: matvec iterations on the MXU; measured 1.10x vs xla at
    # K=1024/100 iters on the v5e, dispatch-confounded -- BASELINE.md round 2)
    # | "pallas" (VMEM-resident TPU kernel)
    attention_impl: str = "xla"  # "xla" | "pallas" (fused masked attention,
    # 1.7x faster at the eval config; hardware outputs agree with XLA to ~4e-4
    # -- f32 reduction-order noise, validated at V=5 K=1024)
    compute_dtype: str = "float32"  # "float32" | "bfloat16" (MXU fast path;
    # Sinkhorn and score scaling always accumulate in float32)
    match_threshold: float = 0.2
    multi_frame_matching: bool = False
    conf_mlp: bool = False
    conf_mlp_hidden: Tuple[int, ...] = (256, 64)


class MLP(nn.Module):
    """Dense stack with BatchNorm+ReLU between layers (upstream SuperGlue MLP shape)."""

    channels: Tuple[int, ...]
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, name=f"dense_{i}", dtype=self.dtype)(x)
            if i < len(self.channels) - 1:
                if self.use_bn:
                    x = nn.BatchNorm(
                        use_running_average=not train, momentum=0.9, name=f"bn_{i}",
                        dtype=jnp.float32,  # normalization statistics in f32
                    )(x)
                x = nn.relu(x)
        return x


class AttentionalLayer(nn.Module):
    """One GNN block: MHA message + residual MLP update.

    `impl="pallas"` routes the attention through the fused in-kernel-masked
    TPU kernel (`ops/attention_pallas.py`); `mode`/`n_views`/`n_kpts` describe
    the token structure for the in-kernel mask.
    """

    dim: int
    num_heads: int
    dtype: Any = jnp.float32
    impl: str = "xla"
    mode: str = "full"
    n_views: int = 1
    n_kpts: int = 0

    @nn.compact
    def __call__(self, x, source, mask=None, train: bool = False):
        q = nn.Dense(self.dim, name="q_proj", dtype=self.dtype)(x)
        k = nn.Dense(self.dim, name="k_proj", dtype=self.dtype)(source)
        v = nn.Dense(self.dim, name="v_proj", dtype=self.dtype)(source)
        if self.impl == "pallas":
            from e2e_multi_view_matching_tpu.ops.attention_pallas import (
                fused_view_attention,
            )

            message = fused_view_attention(
                q, k, v, self.num_heads, self.n_views, self.n_kpts, self.mode
            )
        else:
            message = multi_head_attention(q, k, v, self.num_heads, mask=mask)
        message = nn.Dense(self.dim, name="merge", dtype=self.dtype)(message)
        delta = MLP((2 * self.dim, self.dim), name="mlp", dtype=self.dtype)(
            jnp.concatenate([x, message], axis=-1), train=train
        )
        return x + delta


class MultiViewMatcher(nn.Module):
    """Joint matcher over V views with K keypoints each."""

    config: MatcherConfig = MatcherConfig()

    @nn.compact
    def __call__(
        self,
        kpts,
        scores,
        descs,
        image_size,
        train: bool = False,
        full_output: bool = True,
    ):
        """
        Args:
            kpts: (B, V, K, 2) pixel xy.
            scores: (B, V, K) detector scores.
            descs: (B, V, K, D) unit descriptors.
            image_size: (B, V, 2) as (H, W) per view, for keypoint normalization.
            train: BatchNorm mode.
            full_output: also compute matches + confidence scores (the reference's
                runtime-mutable `config["full_output"]`, `helpers.py:245`).

        Returns:
            dict with stacked tensors:
              "log_assignment": (B, P, K+1, K+1)
              "pairs": (P, 2) int32 view-index pairs (i < j), static
              and, when full_output:
              "matches0": (B, P, K) index into view j or -1
              "matches1": (B, P, K) index into view i or -1
              "conf_scores": (B, P, K) confidence for view-i keypoints (if conf_mlp)
        """
        cfg = self.config
        B, V, K, D = descs.shape
        assert D == cfg.descriptor_dim
        cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        # Keypoint position normalization (upstream convention: center & 0.7*max-dim).
        size = image_size.astype(kpts.dtype)  # (B, V, 2) = (H, W)
        center = jnp.stack([size[..., 1], size[..., 0]], axis=-1)[:, :, None, :] / 2.0
        scaling = 0.7 * jnp.max(size, axis=-1)[:, :, None, None]
        kpts_n = (kpts - center) / scaling

        kenc_in = jnp.concatenate([kpts_n, scores[..., None]], axis=-1)  # (B, V, K, 3)
        kenc = MLP(tuple(cfg.keypoint_encoder) + (D,), name="kenc", dtype=cdtype)(
            kenc_in.astype(cdtype), train=train
        )
        x = descs.astype(cdtype) + kenc  # (B, V, K, D)

        tokens = x.reshape(B, V * K, D)
        use_pallas_attn = cfg.attention_impl == "pallas"
        xmask = (cross_view_mask(V, K) if (V > 1 and not use_pallas_attn) else None)
        for li, layer_type in enumerate(cfg.gnn_layers):
            if layer_type == "self":
                t = tokens.reshape(B * V, K, D)
                t = AttentionalLayer(D, cfg.num_heads, name=f"gnn_{li}_self",
                                     dtype=cdtype, impl=cfg.attention_impl,
                                     mode="full", n_views=1, n_kpts=K)(
                    t, t, train=train)
                tokens = t.reshape(B, V * K, D)
            elif layer_type == "cross":
                tokens = AttentionalLayer(D, cfg.num_heads, name=f"gnn_{li}_cross",
                                          dtype=cdtype, impl=cfg.attention_impl,
                                          mode="cross", n_views=V, n_kpts=K)(
                    tokens, tokens, mask=xmask, train=train
                )
            else:
                raise ValueError(f"unknown GNN layer type {layer_type!r}")

        mdesc = nn.Dense(D, name="final_proj", dtype=cdtype)(tokens).reshape(B, V, K, D)

        # All C(V,2) pairs at once.
        pairs = jnp.asarray(
            [(i, j) for j in range(V) for i in range(j)], dtype=jnp.int32
        )  # (P, 2)
        P = pairs.shape[0]
        mdesc_i = mdesc[:, pairs[:, 0]]  # (B, P, K, D)
        mdesc_j = mdesc[:, pairs[:, 1]]
        pair_scores = jnp.einsum(
            "bpkd,bpld->bpkl", mdesc_i, mdesc_j, preferred_element_type=jnp.float32
        ).astype(jnp.float32) / (D ** 0.25)  # Sinkhorn always in f32

        bin_score = self.param("bin_score", nn.initializers.ones, ())
        if cfg.sinkhorn_impl == "pallas":
            from e2e_multi_view_matching_tpu.ops.sinkhorn_pallas import (
                log_optimal_transport_pallas,
            )

            log_p = log_optimal_transport_pallas(
                pair_scores.reshape(B * P, K, K), bin_score, cfg.sinkhorn_iterations
            ).reshape(B, P, K + 1, K + 1)
        else:
            log_p = log_optimal_transport(
                pair_scores.reshape(B * P, K, K), bin_score,
                cfg.sinkhorn_iterations, impl=cfg.sinkhorn_impl,
            ).reshape(B, P, K + 1, K + 1)

        out = {"log_assignment": log_p, "pairs": pairs}
        if not full_output:
            return out

        m0, m1, ms0 = extract_matches(
            log_p.reshape(B * P, K + 1, K + 1), cfg.match_threshold
        )
        out["matches0"] = m0.reshape(B, P, K)
        out["matches1"] = m1.reshape(B, P, K)
        out["matching_scores0"] = ms0.reshape(B, P, K)

        if cfg.conf_mlp:
            # Confidence head: descriptor of keypoint, matched descriptor, match prob.
            gather_idx = jnp.clip(out["matches0"], 0, K - 1)  # (B, P, K)
            matched_j = jnp.take_along_axis(
                mdesc_j, gather_idx[..., None], axis=2
            )  # (B, P, K, D)
            feats = jnp.concatenate(
                [mdesc_i, matched_j,
                 out["matching_scores0"][..., None].astype(mdesc_i.dtype)], axis=-1
            )
            conf = MLP(tuple(cfg.conf_mlp_hidden) + (1,), name="conf_mlp",
                       dtype=cdtype)(feats, train=train)
            out["conf_scores"] = nn.sigmoid(conf.astype(jnp.float32))[..., 0]  # (B, P, K)
        return out


def result_to_reference_keys(result, tuple_size):
    """Split stacked pair tensors into the reference's per-pair result dict keys.

    `scores_{i}_{j}`, `matches{i}_{i}_{j}`, `conf_scores_{i}_{j}` as consumed by
    `/root/reference/helpers.py:252`, `estimate_relative_pose.py:21,27-28`,
    `bundle_adjust_io.py:78-82`.

    Contract note -- per-pair keypoint overrides: the reference's pose readers
    check for `keypoints{id}_{i}_{j}` in the INPUT data dict before falling
    back to the shared `keypoints{id}` (`estimate_relative_pose.py:17-20`,
    `bundle_adjust_io.py:73-77`), i.e. a mode of the (missing) submodule could
    emit pair-specific keypoint coordinates. No call site in the reference
    repo ever writes such keys (SuperPoint keypoints are frozen and shared by
    every pair), so this matcher never emits them; consumers here always read
    the shared per-view keypoints. If a future mode produces per-pair
    keypoints (e.g. subpixel refinement per pair), add the keys here and the
    fallback reads in the pose layers.
    """
    out = {}
    p = 0
    for j in range(tuple_size):
        for i in range(j):
            out[f"scores_{i}_{j}"] = result["log_assignment"][:, p]
            if "matches0" in result:
                out[f"matches{i}_{i}_{j}"] = result["matches0"][:, p]
                out[f"matches{j}_{i}_{j}"] = result["matches1"][:, p]
            if "conf_scores" in result:
                out[f"conf_scores_{i}_{j}"] = result["conf_scores"][:, p][..., None]
            p += 1
    return out
