"""Fused pair-eval cost at the MegaDepth/YFCC shape (VERDICT r3 item 5 tail).

Measures the eval_pairs w8pt fused program -- SuperPoint -> two-view matcher
(9x1 GNN, Sinkhorn 100, K=2048) -> batched w8pt_ba pose -- at the real
benchmark shape: aspect-preserving long side 1600, shape-bucketed to
(1600, 1216) (the dominant MegaDepth portrait bucket at --shape_bucket 128),
synthetic image content. Reports ms/pair at eval_batch x eval_scan specs.

Run (TPU): PALLAS_AXON_REMOTE_COMPILE=1 python tools/pair2048_probe.py [B[/S] ...]
Defaults: 4 8 8/2 (flat 4, flat 8, one-dispatch scan 2x8 = 16 pairs).
Results recorded in BASELINE.md ("Fused pair eval at K=2048").
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    specs = sys.argv[1:] or ["4", "8", "8/2"]
    import jax
    import jax.numpy as jnp

    from e2e_multi_view_matching_tpu.geom.eightpoint import (
        estimate_relative_pose_w8pt,
    )
    from e2e_multi_view_matching_tpu.models.matcher import (
        MatcherConfig, MultiViewMatcher, default_gnn_layers,
    )
    from e2e_multi_view_matching_tpu.models.superpoint import (
        SuperPoint, SuperPointConfig,
    )
    from e2e_multi_view_matching_tpu.pose.two_view_ba import (
        bundle_adjust_two_view,
    )

    K, D = 2048, 256
    H, W = 1600, 1216  # dominant megadepth portrait bucket (shape_bucket 128)
    rng = np.random.default_rng(0)
    # megadepth eval config (`cli/eval_pairs.py`: 2048 kpts, nms 3, thr 5e-3)
    sp = SuperPoint(SuperPointConfig(
        nms_radius=3, keypoint_threshold=5e-3, max_keypoints=K,
        remove_borders=0, fill_with_random_keypoints=False))
    matcher = MultiViewMatcher(MatcherConfig(
        gnn_layers=default_gnn_layers(9, 1), sinkhorn_iterations=100,
        conf_mlp=True, multi_frame_matching=False, match_threshold=0.0))
    key = jax.random.PRNGKey(0)
    sp_vars = sp.init({"params": key, "keypoints": key},
                      jnp.zeros((1, 256, 256, 1)))
    m_vars = matcher.init(key, jnp.zeros((1, 2, K, 2)), jnp.zeros((1, 2, K)),
                          jnp.zeros((1, 2, K, D)), jnp.full((1, 2, 2), 256.0))

    def pose_body(images0, images1, image_size, valid0, valid1, K0, K1):
        # mirrors cli/eval_pairs.py::infer_pose_body (w8pt_ba mode)
        sp0 = sp.apply(sp_vars, images0, valid0)
        sp1 = sp.apply(sp_vars, images1, valid1)
        kpts = jnp.stack([sp0["keypoints"], sp1["keypoints"]], axis=1)
        scores = jnp.stack([sp0["scores"], sp1["scores"]], axis=1)
        descs = jnp.stack([sp0["descriptors"], sp1["descriptors"]], axis=1)
        out = matcher.apply(m_vars, kpts, scores, descs, image_size)
        matches, conf = out["matches0"][:, 0], out["conf_scores"][:, 0]
        conf_w = jnp.where(matches >= 0, conf, 0.0)
        gather = jnp.clip(matches, 0, K - 1)
        mk1 = jnp.take_along_axis(kpts[:, 1], gather[..., None], axis=1)
        T_w8, info = estimate_relative_pose_w8pt(
            kpts[:, 0], mk1, K0, K1, conf_w, determine_inliers=True)
        conf_ba = jnp.where(info.pos_depth_mask, info.confidence, 0.0)
        T_ba, ok = bundle_adjust_two_view(
            info.kpts0_norm, info.kpts1_norm, conf_ba, T_w8, n_iterations=10)
        T = jnp.where(ok[:, None, None], T_ba, T_w8)
        return jnp.concatenate(
            [jnp.ravel(T), info.valid.astype(jnp.float32).ravel()])

    intr = np.asarray([[1200.0, 0, W / 2], [0, 1200.0, H / 2], [0, 0, 1]],
                      np.float32)
    for spec in specs:
        if "/" in spec:
            B, S = (int(x) for x in spec.split("/"))
        else:
            B, S = int(spec), 1
        label = f"B={B}" + (f" x scan {S}" if S > 1 else "")
        imgs0 = jnp.asarray(rng.uniform(size=(S, B, H, W, 1)).astype(np.float32))
        imgs1 = jnp.asarray(rng.uniform(size=(S, B, H, W, 1)).astype(np.float32))
        sizes = jnp.broadcast_to(
            jnp.asarray([[H, W], [H, W]], jnp.float32), (S, B, 2, 2))
        valid = jnp.broadcast_to(
            jnp.asarray([H, W], jnp.int32), (S, B, 2))
        K0 = jnp.broadcast_to(jnp.asarray(intr), (S, B, 3, 3))

        @jax.jit
        def fused(imgs0, imgs1, sizes, valid, K0, S=S):
            if S == 1:
                return pose_body(imgs0[0], imgs1[0], sizes[0], valid[0],
                                 valid[0], K0[0], K0[0])[None]
            return jax.lax.map(
                lambda a: pose_body(a[0], a[1], a[2], a[3], a[3], a[4], a[4]),
                (imgs0, imgs1, sizes, valid, K0))

        try:
            t0 = time.perf_counter()
            out = np.asarray(fused(imgs0, imgs1, sizes, valid, K0))
            compile_s = time.perf_counter() - t0
        except Exception as e:
            print(f"{label}: FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        assert np.all(np.isfinite(out))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fused(imgs0, imgs1, sizes, valid, K0))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        n = S * B
        print(f"RESULT {label}: {t * 1e3:.1f} ms/chunk -> {t / n * 1e3:.1f} "
              f"ms/pair = {n / t:.2f} pairs/s (compile {compile_s:.0f}s)",
              flush=True)

        # production pattern: depth-2 dispatch pipeline (one chunk in flight,
        # cli/eval_pairs.py) -- hides the fetch/round-trip behind the next
        # chunk's compute even though this shape is compute-bound
        NCHUNK = 4

        def prod_loop():
            t0 = time.perf_counter()
            in_flight = fused(imgs0, imgs1, sizes, valid, K0)
            for ci in range(NCHUNK):
                cur = in_flight
                if ci + 1 < NCHUNK:
                    in_flight = fused(imgs0, imgs1, sizes, valid, K0)
                np.asarray(cur)
            return time.perf_counter() - t0

        prod_loop()
        tp = min(prod_loop() for _ in range(2))
        print(f"RESULT {label} production loop (depth-2, {NCHUNK} chunks): "
              f"{tp / (NCHUNK * n) * 1e3:.1f} ms/pair = "
              f"{NCHUNK * n / tp:.2f} pairs/s", flush=True)


if __name__ == "__main__":
    main()
