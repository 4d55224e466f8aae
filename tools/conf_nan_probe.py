"""Isolate the NaN source in the fused eval's conf scores (round-5).

tools/fused_bf16_probe.py found ~0.3% NaN conf_scores on random weights in
BOTH f32 and bf16 on the TPU. This probe runs the matcher on the same
random-image SuperPoint outputs and reports NaN counts per intermediate
(log_assignment / matching_scores0 / conf_scores) under each
{attention, sinkhorn} impl combination to pin the producer.

Run: python tools/conf_nan_probe.py [--cpu]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("_EMVM_CNP_REEXEC") != "1"
    and "--cpu" not in sys.argv
):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1",
               _EMVM_CNP_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    if "--cpu" in sys.argv:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from e2e_multi_view_matching_tpu.models.matcher import (
        MatcherConfig, MultiViewMatcher, default_gnn_layers,
    )
    from e2e_multi_view_matching_tpu.models.superpoint import (
        SuperPoint, SuperPointConfig,
    )

    B, V, K, D = 8, 5, 1024, 256
    H, W = 480, 640
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(B * V, H, W, 1)).astype(np.float32))
    image_size = jnp.full((B, V, 2), 0.0).at[..., 0].set(H).at[..., 1].set(W)
    key = jax.random.PRNGKey(0)

    sp = SuperPoint(SuperPointConfig(
        nms_radius=4, keypoint_threshold=1e-3, max_keypoints=K,
        remove_borders=4, fill_with_random_keypoints=True))
    sp_vars = sp.init({"params": key, "keypoints": key}, images[:1])
    sp_out = jax.jit(lambda v, im: sp.apply(v, im, rngs={"keypoints": key}))(
        sp_vars, images)
    kpts = sp_out["keypoints"].reshape(B, V, K, 2)
    scores = sp_out["scores"].reshape(B, V, K)
    descs = sp_out["descriptors"].reshape(B, V, K, D)
    for name, x in (("kpts", kpts), ("scores", scores), ("descs", descs)):
        print(f"sp {name}: nan {int(np.isnan(np.asarray(x)).sum())}", flush=True)

    for attn in ("pallas", "xla"):
        for sk in ("pallas", "xla"):
            matcher = MultiViewMatcher(MatcherConfig(
                gnn_layers=default_gnn_layers(7, 3), sinkhorn_iterations=100,
                conf_mlp=True, multi_frame_matching=True,
                attention_impl=attn, sinkhorn_impl=sk))
            m_vars = matcher.init(
                key, jnp.zeros((1, V, K, 2)), jnp.zeros((1, V, K)),
                jnp.zeros((1, V, K, D)), image_size[:1])
            out = jax.jit(lambda v, k, s, d, z: matcher.apply(v, k, s, d, z))(
                m_vars, kpts, scores, descs, image_size)
            la = np.asarray(out["log_assignment"])
            ms = np.asarray(out["matching_scores0"])
            cf = np.asarray(out["conf_scores"])
            print(f"attn={attn:6s} sinkhorn={sk:6s}: "
                  f"log_assignment nan {int(np.isnan(la).sum())}/{la.size} "
                  f"(max {np.nanmax(la):.2f}), "
                  f"mscores nan {int(np.isnan(ms).sum())}, "
                  f"conf nan {int(np.isnan(cf).sum())}", flush=True)


if __name__ == "__main__":
    main()
