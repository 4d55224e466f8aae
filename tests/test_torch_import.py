"""Tests for the torch checkpoint import shim (synthetic upstream state dicts)."""

import numpy as np
import jax
import jax.numpy as jnp

from e2e_multi_view_matching_tpu.models.matcher import (
    MatcherConfig,
    MultiViewMatcher,
    default_gnn_layers,
)
from e2e_multi_view_matching_tpu.models.superpoint import SuperPoint, SuperPointConfig
from e2e_multi_view_matching_tpu.models.torch_import import (
    import_matcher,
    import_superpoint,
)


def synth_superpoint_sd(rng):
    """Upstream magicleap SuperPoint state-dict shapes."""
    chans = {
        "conv1a": (64, 1), "conv1b": (64, 64), "conv2a": (64, 64), "conv2b": (64, 64),
        "conv3a": (128, 64), "conv3b": (128, 128), "conv4a": (128, 128),
        "conv4b": (128, 128), "convPa": (256, 128), "convDa": (256, 128),
    }
    sd = {}
    # small scale: huge random weights saturate the 65-way softmax to {0, 1}
    for name, (o, i) in chans.items():
        sd[f"{name}.weight"] = (rng.normal(size=(o, i, 3, 3)) * 0.05).astype(np.float32)
        sd[f"{name}.bias"] = (rng.normal(size=(o,)) * 0.05).astype(np.float32)
    sd["convPb.weight"] = (rng.normal(size=(65, 256, 1, 1)) * 0.05).astype(np.float32)
    sd["convPb.bias"] = (rng.normal(size=(65,)) * 0.05).astype(np.float32)
    sd["convDb.weight"] = (rng.normal(size=(256, 256, 1, 1)) * 0.05).astype(np.float32)
    sd["convDb.bias"] = (rng.normal(size=(256,)) * 0.05).astype(np.float32)
    return sd


def synth_matcher_sd(rng, gnn_layers):
    """Upstream SuperGlue-style matcher state dict with DataParallel prefix.

    Weights scaled ~1/sqrt(fan_in) so the deep forward stays finite."""
    sd = {}
    sc = 0.06

    def mlp(prefix, dims):
        for li in range(len(dims) - 1):
            i, o = dims[li], dims[li + 1]
            ci = 3 * li
            sd[f"{prefix}.{ci}.weight"] = (rng.normal(size=(o, i, 1)) * sc).astype(np.float32)
            sd[f"{prefix}.{ci}.bias"] = (rng.normal(size=(o,)) * sc).astype(np.float32)
            if li < len(dims) - 2:
                sd[f"{prefix}.{ci+1}.weight"] = np.ones(o, np.float32)
                sd[f"{prefix}.{ci+1}.bias"] = np.zeros(o, np.float32)
                sd[f"{prefix}.{ci+1}.running_mean"] = np.zeros(o, np.float32)
                sd[f"{prefix}.{ci+1}.running_var"] = np.ones(o, np.float32)

    mlp("kenc.encoder", (3, 32, 64, 128, 256, 256))
    for li in range(len(gnn_layers)):
        for pi in range(3):
            sd[f"gnn.layers.{li}.attn.proj.{pi}.weight"] = (rng.normal(
                size=(256, 256, 1)) * sc).astype(np.float32)
            sd[f"gnn.layers.{li}.attn.proj.{pi}.bias"] = (rng.normal(size=(256,)) * sc).astype(np.float32)
        sd[f"gnn.layers.{li}.attn.merge.weight"] = (rng.normal(size=(256, 256, 1)) * sc).astype(np.float32)
        sd[f"gnn.layers.{li}.attn.merge.bias"] = (rng.normal(size=(256,)) * sc).astype(np.float32)
        mlp(f"gnn.layers.{li}.mlp", (512, 512, 256))
    sd["final_proj.weight"] = (rng.normal(size=(256, 256, 1)) * sc).astype(np.float32)
    sd["final_proj.bias"] = (rng.normal(size=(256,)) * sc).astype(np.float32)
    sd["bin_score"] = np.asarray(1.2, np.float32)
    return {f"module.{k}": v for k, v in sd.items()}


class TestImport:
    def test_superpoint_import_runs(self, rng):
        sd = synth_superpoint_sd(rng)
        variables = import_superpoint(sd)
        model = SuperPoint(SuperPointConfig(max_keypoints=32,
                                            fill_with_random_keypoints=False))
        img = jnp.asarray(rng.uniform(size=(1, 64, 64, 1)).astype(np.float32))
        out = model.apply(variables, img)
        assert out["keypoints"].shape == (1, 32, 2)
        # imported conv actually used: changing a weight changes the output
        sd2 = dict(sd)
        sd2["conv1a.weight"] = sd["conv1a.weight"] + 0.05
        out2 = model.apply(import_superpoint(sd2), img)
        assert not np.allclose(
            np.asarray(out["descriptors"]), np.asarray(out2["descriptors"])
        )

    def test_matcher_import_structure_matches_init(self, rng):
        layers = default_gnn_layers(2, 1)
        sd = synth_matcher_sd(rng, layers)
        imported = import_matcher(sd, layers)
        model = MultiViewMatcher(MatcherConfig(gnn_layers=layers,
                                               sinkhorn_iterations=10))
        B, V, K = 1, 2, 8
        init = model.init(
            jax.random.PRNGKey(0), jnp.zeros((B, V, K, 2)), jnp.zeros((B, V, K)),
            jnp.zeros((B, V, K, 256)), jnp.full((B, V, 2), 64.0),
        )
        # every init param has an imported counterpart with the same shape
        flat_init = jax.tree_util.tree_flatten_with_path(init["params"])[0]
        from flax import traverse_util

        flat_imp = traverse_util.flatten_dict(imported["params"], sep="/")
        for path, leaf in flat_init:
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            assert key in flat_imp, f"missing imported param {key}"
            assert np.shape(flat_imp[key]) == leaf.shape, key
        # forward runs with imported weights
        out = model.apply(
            {"params": imported["params"], "batch_stats": init["batch_stats"]},
            jnp.asarray(rng.uniform(0, 64, size=(B, V, K, 2)).astype(np.float32)),
            jnp.asarray(rng.uniform(size=(B, V, K)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(B, V, K, 256)).astype(np.float32)),
            jnp.full((B, V, 2), 64.0),
        )
        assert np.isfinite(np.asarray(out["log_assignment"])).all()
