"""Torch checkpoint import: upstream SuperPoint / reference matcher weights -> flax.

The reference's only parity oracle is its pretrained torch checkpoints
(SURVEY.md section 7.3 item 2): `model.ckpt` from pretrained_network_weights.zip
(`/root/reference/README.md:57-58`) with the DataParallel `module.` prefix
(`helpers.py:47-52`), and the magicleap `superpoint_v1.pth`.

Layout conversions:
- Conv2d OIHW -> flax HWIO; Conv1d (out, in, 1) -> Dense (in, out);
  BatchNorm1d weight/bias/running_mean/running_var -> scale/bias/mean/var.
- upstream SuperPoint keys `conv1a..convDb` map 1:1 onto `net/<same name>`.
- matcher keys follow the upstream SuperGlue module tree: `kenc.encoder.{k}`,
  `gnn.layers.{i}.attn.proj.{0,1,2}` (q, k, v), `.attn.merge`, `.mlp.{k}`,
  `final_proj`, `bin_score`, plus the fork's `conf_mlp` head (internals
  unverifiable -- mapped positionally when shapes line up).

Only numpy is required here; pass any mapping of name -> array (e.g.
`torch.load(...)['model']` converted with `.numpy()`).
"""

import re

import numpy as np
from flax import traverse_util


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _conv1d_to_dense(w):
    return np.transpose(w[..., 0], (1, 0))  # (out, in, 1) -> (in, out)


def strip_module_prefix(state_dict):
    """Drop the DataParallel 'module.' prefix (`helpers.py:47`)."""
    return {re.sub(r"^module\.", "", k): v for k, v in state_dict.items()}


def import_superpoint(state_dict):
    """Upstream magicleap SuperPoint state dict -> flax variables dict."""
    sd = strip_module_prefix(state_dict)
    params = {}
    for name in ("conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
                 "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"):
        params[name] = {
            "kernel": _conv2d(np.asarray(sd[f"{name}.weight"])),
            "bias": np.asarray(sd[f"{name}.bias"]),
        }
    return {"params": {"net": params}}


def _import_mlp(sd, prefix, n_layers):
    """Upstream `MLP` (Conv1d/BN/ReLU stack) -> our `MLP` params + batch_stats.

    Upstream indexes submodules sequentially: conv at 0, 3, 6, ... with BN at
    1, 4, ... (conv, bn, relu triples; final conv has no bn).
    """
    params, stats = {}, {}
    conv_idx = [k for k in range(0, 3 * n_layers, 3)]
    for li, ci in enumerate(conv_idx):
        w = np.asarray(sd[f"{prefix}.{ci}.weight"])
        params[f"dense_{li}"] = {
            "kernel": _conv1d_to_dense(w),
            "bias": np.asarray(sd[f"{prefix}.{ci}.bias"]),
        }
        bn_key = f"{prefix}.{ci + 1}.weight"
        if bn_key in sd:  # BN follows all but the last conv
            params[f"bn_{li}"] = {
                "scale": np.asarray(sd[bn_key]),
                "bias": np.asarray(sd[f"{prefix}.{ci + 1}.bias"]),
            }
            stats[f"bn_{li}"] = {
                "mean": np.asarray(sd[f"{prefix}.{ci + 1}.running_mean"]),
                "var": np.asarray(sd[f"{prefix}.{ci + 1}.running_var"]),
            }
    return params, stats


def import_matcher(state_dict, gnn_layers, num_heads=4):
    """Reference matcher state dict -> flax variables (params + batch_stats).

    Head-split convention: upstream SuperGlue views the (B, D, N) projection
    output as (B, dim_head, num_heads, N) -- the HEAD index is the innermost
    channel factor -- while our MHA reshapes (B, N, D) to (B, N, heads,
    dim_head) (head outermost). Attention probabilities are invariant under a
    consistent per-channel permutation of the q/k/v outputs and the merge
    input, so the importer permutes those channels (`_head_perm`) and the flax
    forward reproduces the upstream forward EXACTLY (verified end to end by
    tests/test_golden_full_model.py).

    Args:
        state_dict: name -> array mapping (torch tensors already .numpy()'d).
        gnn_layers: the layer-type schedule tuple (('self', 'cross', ...)).
        num_heads: attention head count of the checkpoint (upstream: 4).
    Returns:
        {"params": ..., "batch_stats": ...} matching `MultiViewMatcher`.
    """
    sd = strip_module_prefix(state_dict)
    params, stats = {}, {}

    # keypoint encoder: kenc.encoder.* with channels (32, 64, 128, 256, 256)
    kenc_p, kenc_s = _import_mlp(sd, "kenc.encoder", 5)
    params["kenc"] = kenc_p
    if kenc_s:
        stats["kenc"] = kenc_s

    # channel permutation: our channel (head * dh + d) reads upstream channel
    # (d * num_heads + head)
    D_attn = np.asarray(sd["final_proj.weight"]).shape[0]
    dh = D_attn // num_heads
    perm = np.arange(D_attn).reshape(dh, num_heads).T.ravel()

    for li, layer_type in enumerate(gnn_layers):
        src = f"gnn.layers.{li}"
        dst = f"gnn_{li}_{layer_type}"
        layer_p = {}
        for name, j in (("q_proj", 0), ("k_proj", 1), ("v_proj", 2)):
            w = _conv1d_to_dense(np.asarray(sd[f"{src}.attn.proj.{j}.weight"]))
            b = np.asarray(sd[f"{src}.attn.proj.{j}.bias"])
            layer_p[name] = {"kernel": w[:, perm], "bias": b[perm]}
        merge_w = _conv1d_to_dense(np.asarray(sd[f"{src}.attn.merge.weight"]))
        layer_p["merge"] = {
            "kernel": merge_w[perm, :],
            "bias": np.asarray(sd[f"{src}.attn.merge.bias"]),
        }
        mlp_p, mlp_s = _import_mlp(sd, f"{src}.mlp", 2)
        layer_p["mlp"] = mlp_p
        params[dst] = layer_p
        if mlp_s:
            stats[dst] = {"mlp": mlp_s}

    params["final_proj"] = {
        "kernel": _conv1d_to_dense(np.asarray(sd["final_proj.weight"])),
        "bias": np.asarray(sd["final_proj.bias"]),
    }
    params["bin_score"] = np.asarray(sd["bin_score"])

    conf_keys = sorted(k for k in sd if k.startswith("conf_mlp"))
    if conf_keys:
        # positional mapping of the fork's conf head: conv1d layers in
        # sequential-module order, each optionally followed by a BatchNorm1d
        # (detected by its running stats) which maps onto our MLP's bn_{i}
        prefix = conf_keys[0].split(".")[0]
        layers = sorted(
            {int(k.split(".")[1]) for k in conf_keys if k.split(".")[1].isdigit()}
        )
        conv_layers = [i for i in layers if f"{prefix}.{i}.weight" in sd
                       and np.asarray(sd[f"{prefix}.{i}.weight"]).ndim == 3]
        conf_p, conf_s = {}, {}
        for li, ci in enumerate(conv_layers):
            conf_p[f"dense_{li}"] = {
                "kernel": _conv1d_to_dense(np.asarray(sd[f"{prefix}.{ci}.weight"])),
                "bias": np.asarray(sd[f"{prefix}.{ci}.bias"]),
            }
            if f"{prefix}.{ci + 1}.running_mean" in sd:
                conf_p[f"bn_{li}"] = {
                    "scale": np.asarray(sd[f"{prefix}.{ci + 1}.weight"]),
                    "bias": np.asarray(sd[f"{prefix}.{ci + 1}.bias"]),
                }
                conf_s[f"bn_{li}"] = {
                    "mean": np.asarray(sd[f"{prefix}.{ci + 1}.running_mean"]),
                    "var": np.asarray(sd[f"{prefix}.{ci + 1}.running_var"]),
                }
        params["conf_mlp"] = conf_p
        if conf_s:
            stats["conf_mlp"] = conf_s

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def flatten_report(variables):
    """Flat name -> shape mapping for import validation."""
    return {
        "/".join(map(str, k)): np.shape(v)
        for k, v in traverse_util.flatten_dict(variables).items()
    }
