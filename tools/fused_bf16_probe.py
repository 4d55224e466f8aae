"""Measure the fused single-dispatch eval pipeline in f32 vs bf16 compute.

Same scope as `bench.py`'s fused section (SuperPoint -> matcher ->
`multi_view_pose_device`, B=8 5-tuples, K=1024, 480x640, Sinkhorn 100), with
the models' `compute_dtype` switched between float32 and bfloat16 (params,
Sinkhorn, and the pose pipeline stay f32 in both). Also reports the max
keypoint-coordinate and confidence deviation between the two, since bf16
matmuls perturb scores near Sinkhorn's assignment boundaries.

Run on the chip: `python tools/fused_bf16_probe.py`.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("_EMVM_PROBE_REEXEC") != "1"
):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1", _EMVM_PROBE_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


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
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(B * V, H, W, 1)).astype(np.float32))
    image_size = jnp.full((B, V, 2), 0.0).at[..., 0].set(H).at[..., 1].set(W)
    intr = jnp.asarray(np.broadcast_to(
        np.asarray([[525.0, 0, W / 2], [0, 525.0, H / 2], [0, 0, 1]],
                   np.float32), (B, V, 3, 3)))
    key = jax.random.PRNGKey(0)
    pcfg = MultiViewPipelineConfig()

    results = {}
    for dtype in ("float32", "bfloat16"):
        sp = SuperPoint(SuperPointConfig(
            nms_radius=4, keypoint_threshold=1e-3, max_keypoints=K,
            remove_borders=4, fill_with_random_keypoints=True,
            compute_dtype=dtype,
        ))
        matcher = MultiViewMatcher(MatcherConfig(
            gnn_layers=default_gnn_layers(7, 3), sinkhorn_iterations=100,
            conf_mlp=True, multi_frame_matching=True,
            attention_impl="pallas", sinkhorn_impl="pallas", compute_dtype=dtype,
        ))
        sp_vars = sp.init({"params": key, "keypoints": key}, images[:1])
        m_vars = matcher.init(
            key, jnp.zeros((1, V, K, 2)), jnp.zeros((1, V, K)),
            jnp.zeros((1, V, K, D)), image_size[:1])

        @jax.jit
        def fused(sp_vars, m_vars, images, intr, image_size, rng_):
            sp_out = sp.apply(sp_vars, images, rngs={"keypoints": rng_})
            kpts = sp_out["keypoints"].reshape(B, V, K, 2)
            scores = sp_out["scores"].reshape(B, V, K)
            descs = sp_out["descriptors"].reshape(B, V, K, D)
            out = matcher.apply(m_vars, kpts, scores, descs, image_size)
            extr = multi_view_pose_device(
                kpts, intr, out["matches0"], out["conf_scores"], pcfg)
            return extr, out["conf_scores"]

        extr, conf = fused(sp_vars, m_vars, images, intr, image_size, key)
        np.asarray(extr)  # force
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            extr, conf = fused(sp_vars, m_vars, images, intr, image_size, key)
            e = np.asarray(extr)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        assert np.all(np.isfinite(e)), dtype

        # production pattern: scan 2x8 per dispatch + depth-2 pipeline (the
        # bench.py headline configuration) -- what bf16 opt-in actually buys
        SCAN, NCHUNK = 2, 6
        images_s = jnp.broadcast_to(images, (SCAN,) + images.shape)
        intr_s = jnp.broadcast_to(intr, (SCAN,) + intr.shape)
        size_s = jnp.broadcast_to(image_size, (SCAN,) + image_size.shape)

        @jax.jit
        def fused_scan(sp_vars, m_vars, images_s, intr_s, size_s, rng_):
            def one(a):
                imgs, it, sz = a
                sp_out = sp.apply(sp_vars, imgs, rngs={"keypoints": rng_})
                kpts = sp_out["keypoints"].reshape(B, V, K, 2)
                scores = sp_out["scores"].reshape(B, V, K)
                descs = sp_out["descriptors"].reshape(B, V, K, D)
                out = matcher.apply(m_vars, kpts, scores, descs, sz)
                return multi_view_pose_device(
                    kpts, it, out["matches0"], out["conf_scores"], pcfg)
            return jax.lax.map(one, (images_s, intr_s, size_s))

        np.asarray(fused_scan(sp_vars, m_vars, images_s, intr_s, size_s, key))

        def prod_loop():
            t0 = time.perf_counter()
            in_flight = fused_scan(sp_vars, m_vars, images_s, intr_s, size_s, key)
            for ci in range(NCHUNK):
                cur = in_flight
                if ci + 1 < NCHUNK:
                    in_flight = fused_scan(sp_vars, m_vars, images_s, intr_s,
                                           size_s, key)
                np.asarray(cur)
            return time.perf_counter() - t0

        prod_loop()
        tp = min(prod_loop() for _ in range(3))
        n_tuples = NCHUNK * SCAN * B
        print(f"{dtype}: production loop (depth-2, {NCHUNK}x{SCAN}x{B}): "
              f"{tp / n_tuples * 1e3:.1f} ms/tuple = "
              f"{n_tuples / tp:.2f} tuples/s", flush=True)

        c = np.asarray(conf)
        results[dtype] = (t, e, c)
        print(f"{dtype}: fused e2e {t * 1e3:.1f} ms/batch -> "
              f"{t / B * 1e3:.1f} ms/tuple = {B / t:.2f} tuples/s "
              f"[conf nan: {int(np.isnan(c).sum())}/{c.size}]", flush=True)

    t32, e32, c32 = results["float32"]
    t16, e16, c16 = results["bfloat16"]
    print(f"speedup bf16/f32: {t32 / t16:.2f}x", flush=True)
    print(f"max |extr_f32 - extr_bf16|: {np.abs(e32 - e16).max():.4f} "
          f"(different weights inits would differ anyway; same init here)",
          flush=True)
    print(f"max |conf_f32 - conf_bf16|: {np.abs(c32 - c16).max():.4f}", flush=True)


if __name__ == "__main__":
    main()
