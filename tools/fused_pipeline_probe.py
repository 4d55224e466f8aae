"""Probe: does pipelining fused-eval chunks hide the tunnel dispatch overhead?

JAX dispatch is asynchronous: if the axon tunnel enqueues without blocking,
dispatching chunk i+1 before fetching chunk i's extrinsics overlaps the ~25 ms
host round trip with device compute, which is worth ~3 ms/tuple at chunk B=8.
Measures the same fused program as bench.py three ways:
  sequential  - dispatch chunk, fetch, repeat (the current eval-CLI loop)
  pipelined   - dispatch all N chunks, then fetch in order (depth-N pipeline)
  depth-2     - keep one chunk in flight (the realistic eval-loop change)

Run: python tools/fused_pipeline_probe.py  (PYTHONPATH must include the repo
and /root/.axon_site)
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from e2e_multi_view_matching_tpu.models.matcher import (
        MatcherConfig,
        MultiViewMatcher,
        default_gnn_layers,
    )
    from e2e_multi_view_matching_tpu.models.superpoint import (
        SuperPoint,
        SuperPointConfig,
    )
    from e2e_multi_view_matching_tpu.mvba.pipeline import (
        MultiViewPipelineConfig,
        multi_view_pose_device,
    )

    B, V, K, D = 8, 5, 1024, 256
    H, W = 480, 640
    N_CHUNKS = 6
    rng = np.random.default_rng(0)
    sp = SuperPoint(SuperPointConfig(
        nms_radius=4, keypoint_threshold=1e-3, max_keypoints=K,
        remove_borders=4, fill_with_random_keypoints=True,
    ))
    matcher = MultiViewMatcher(MatcherConfig(
        gnn_layers=default_gnn_layers(7, 3), sinkhorn_iterations=100,
        conf_mlp=True, multi_frame_matching=True,
        attention_impl="pallas", sinkhorn_impl="pallas",
    ))
    pcfg = MultiViewPipelineConfig()
    key = jax.random.PRNGKey(0)

    images = [jnp.asarray(rng.uniform(size=(B * V, H, W, 1)).astype(np.float32))
              for _ in range(N_CHUNKS)]
    image_size = jnp.full((B, V, 2), 0.0).at[..., 0].set(H).at[..., 1].set(W)
    intr = jnp.broadcast_to(
        jnp.asarray([[525.0, 0, W / 2], [0, 525.0, H / 2], [0, 0, 1]],
                    np.float32), (B, V, 3, 3))
    sp_vars = sp.init({"params": key, "keypoints": key}, images[0][:1])
    k1 = jnp.asarray(rng.uniform(0, 256, size=(1, V, K, 2)).astype(np.float32))
    s1 = jnp.asarray(rng.uniform(size=(1, V, K)).astype(np.float32))
    d1 = jnp.asarray(rng.normal(size=(1, V, K, D)).astype(np.float32))
    m_vars = matcher.init(jax.random.PRNGKey(0), k1, s1, d1, image_size[:1])

    @jax.jit
    def fused(sp_vars, m_vars, images, rng_):
        sp_out = sp.apply(sp_vars, images, rngs={"keypoints": rng_})
        kpts_ = sp_out["keypoints"].reshape(B, V, K, 2)
        scores_ = sp_out["scores"].reshape(B, V, K)
        descs_ = sp_out["descriptors"].reshape(B, V, K, D)
        out = matcher.apply(m_vars, kpts_, scores_, descs_, image_size)
        return multi_view_pose_device(
            kpts_, intr, out["matches0"], out["conf_scores"], pcfg)

    np.asarray(fused(sp_vars, m_vars, images[0], key))  # compile

    def run_sequential():
        t0 = time.perf_counter()
        for img in images:
            np.asarray(fused(sp_vars, m_vars, img, key))
        return time.perf_counter() - t0

    def run_pipelined():
        t0 = time.perf_counter()
        outs = [fused(sp_vars, m_vars, img, key) for img in images]
        for o in outs:
            np.asarray(o)
        return time.perf_counter() - t0

    def run_depth2():
        t0 = time.perf_counter()
        prev = None
        for img in images:
            cur = fused(sp_vars, m_vars, img, key)
            if prev is not None:
                np.asarray(prev)
            prev = cur
        np.asarray(prev)
        return time.perf_counter() - t0

    for name, fn in [("sequential", run_sequential),
                     ("pipelined ", run_pipelined),
                     ("depth-2   ", run_depth2)]:
        ts = [fn() for _ in range(3)]
        t = min(ts) / (N_CHUNKS * B)
        print(f"{name}: {t * 1e3:.1f} ms/tuple = {1.0 / t:.2f} tuples/s",
              flush=True)


if __name__ == "__main__":
    main()
