"""Probe: fused e2e eval throughput vs chunk size B on the real chip.

The axon tunnel adds ~25-30 ms fixed dispatch overhead per host round trip;
the fused production path (`multi_view_pose_device`) pays it once per chunk,
so larger chunks amortize it: at B=8 that's ~3.5 ms/tuple of pure overhead.
This probe measures the fused SuperPoint -> matcher -> complete-pose program
at B in {8, 12, 16} (same shapes as bench.py otherwise) and prints a table.

Run: PALLAS_AXON_REMOTE_COMPILE=1 python tools/fused_chunk_probe.py [B ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    bs = sys.argv[1:] or ["8", "16/2", "32/4"]
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

    V, K, D = 5, 1024, 256
    H, W = 480, 640
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

    img1 = jnp.asarray(rng.uniform(size=(V, H, W, 1)).astype(np.float32))
    sp_vars = sp.init({"params": key, "keypoints": key}, img1[:1])
    k1 = jnp.asarray(rng.uniform(0, 256, size=(1, V, K, 2)).astype(np.float32))
    s1 = jnp.asarray(rng.uniform(size=(1, V, K)).astype(np.float32))
    d1 = jnp.asarray(rng.normal(size=(1, V, K, D)).astype(np.float32))
    sz1 = jnp.full((1, V, 2), 0.0).at[..., 0].set(H).at[..., 1].set(W)
    m_vars = matcher.init(jax.random.PRNGKey(0), k1, s1, d1, sz1)

    results = []
    for spec in bs:
        # "16/2" = global chunk 16 as a lax.scan over 2 sub-chunks of 8: ONE
        # dispatch/fetch, program stays sub-chunk-sized (the tunnel's compile
        # helper rejects the flat program beyond B=8 -- same limit as train,
        # worked around the same way as --grad_accum)
        if isinstance(spec, str) and "/" in spec:
            B_total, n_sub = (int(x) for x in spec.split("/"))
        else:
            B_total, n_sub = int(spec), 1
        B = B_total // n_sub
        images = jnp.asarray(
            rng.uniform(size=(n_sub, B * V, H, W, 1)).astype(np.float32))
        image_size = jnp.full((B, V, 2), 0.0).at[..., 0].set(H).at[..., 1].set(W)
        intr = jnp.broadcast_to(
            jnp.asarray([[525.0, 0, W / 2], [0, 525.0, H / 2], [0, 0, 1]],
                        np.float32), (B, V, 3, 3))

        @jax.jit
        def fused(sp_vars, m_vars, images, intr_, image_size, rng_, B=B,
                  n_sub=n_sub):
            def one(imgs):
                sp_out = sp.apply(sp_vars, imgs, rngs={"keypoints": rng_})
                kpts_ = sp_out["keypoints"].reshape(B, V, K, 2)
                scores_ = sp_out["scores"].reshape(B, V, K)
                descs_ = sp_out["descriptors"].reshape(B, V, K, D)
                out = matcher.apply(m_vars, kpts_, scores_, descs_, image_size)
                return multi_view_pose_device(
                    kpts_, intr_, out["matches0"], out["conf_scores"], pcfg)

            if n_sub == 1:
                return one(images[0])
            return jax.lax.map(one, images)

        label = f"B={B_total}" + (f" (scan {n_sub}x{B})" if n_sub > 1 else "")
        try:
            t0 = time.perf_counter()
            extr = np.asarray(fused(sp_vars, m_vars, images, intr,
                                    image_size, key))
            compile_s = time.perf_counter() - t0
        except Exception as e:  # tunnel compile-helper failures show as errors
            print(f"{label}: FAILED to compile/run: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        assert np.all(np.isfinite(extr))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(fused(sp_vars, m_vars, images, intr, image_size, key))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"{label}: {t * 1e3:.1f} ms/chunk -> {t / B_total * 1e3:.1f} "
              f"ms/tuple = {B_total / t:.2f} tuples/s  "
              f"(compile {compile_s:.0f}s)", flush=True)
        results.append((label, t / B_total * 1e3, B_total / t))

    for label, ms, tps in results:
        print(f"RESULT {label} {ms:.1f} ms/tuple {tps:.2f} tuples/s")


if __name__ == "__main__":
    main()
