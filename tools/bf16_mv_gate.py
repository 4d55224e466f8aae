"""bf16 inference parity gate on TRAINED weights (round-5).

Round 3 measured the fused eval 1.11x faster in bf16 but kept f32 as the
production default because bf16 matmul noise flips matches near Sinkhorn
assignment boundaries *on random weights* (conf deviation 0.56). That left
the real question open: does bf16 inference change the BENCHMARK result on a
converged model, where assignments are decisive?

This gate answers it with the V=5-trained synthetic model saved by
`tools/synthetic_e2e.py --mv_train_steps 2000 --save_mv tools/mv_trained_v5.pkl`
(the flagship multi-view quality gate, AUC@20 ~= 0.89): it runs the SAME
trained parameters through the matcher in float32 and bfloat16 compute and
pushes both match sets through the full multi-view pose pipeline
(w8pt+IRLS+BA -> spanning tree -> averaging -> Schur BA).

Pass criteria (asserted with --gate):
  - |AUC@20_bf16 - AUC@20_f32| <= 2 points
  - match agreement (same index or both unmatched) >= 98%

Result JSON -> tools/bf16_mv_gate_result.json (indexed in tools/RESULTS.md).

Run: python tools/bf16_mv_gate.py [--cpu] [--gate]
"""

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("_EMVM_BF16G_REEXEC") != "1"
    and "--cpu" not in sys.argv
):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1",
               _EMVM_BF16G_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.path.join(
        os.path.dirname(__file__), "mv_trained_v5.pkl"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--gate", action="store_true",
                    help="assert the pass criteria")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "bf16_mv_gate_result.json"))
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from e2e_multi_view_matching_tpu.geom.metrics import pose_auc, pose_error_max
    from e2e_multi_view_matching_tpu.models.matcher import (
        MatcherConfig, MultiViewMatcher, default_gnn_layers,
    )
    from e2e_multi_view_matching_tpu.mvba.pipeline import (
        multi_view_pose_pipeline_batch,
    )

    with open(args.ckpt, "rb") as f:
        blob = pickle.load(f)
    K, V = blob["K"], blob["V"]
    H, W = blob["H"], blob["W"]
    mv_kpts = jnp.asarray(blob["mv_kpts"])
    mv_descs = jnp.asarray(blob["mv_descs"])
    mv_T, mv_intr = blob["mv_T"], blob["mv_intr"]
    B = mv_kpts.shape[0]
    mv_scores = jnp.full((B, V, K), 0.5)
    mv_size = jnp.full((B, V, 2), 0.0).at[..., 0].set(H).at[..., 1].set(W)
    mv_pairs = [(i, j) for j in range(V) for i in range(j)]
    variables = {"params": blob["params"], "batch_stats": blob["batch_stats"]}

    def mv_benchmark(m0, conf):
        extr = multi_view_pose_pipeline_batch(mv_kpts, mv_intr, m0, conf)
        T_pred = np.stack([
            [extr[b, j] @ np.linalg.inv(extr[b, i]) for (i, j) in mv_pairs]
            for b in range(B)])
        errs = np.asarray(pose_error_max(
            jnp.asarray(mv_T.reshape(-1, 4, 4).astype(np.float32)),
            jnp.asarray(T_pred.reshape(-1, 4, 4).astype(np.float32)),
            degrees=True))
        return pose_auc(errs, [5, 10, 20])

    results = {}
    for dtype in ("float32", "bfloat16"):
        # same TRAINED parameters; dtype only switches the compute casts
        # (params, Sinkhorn, and score scaling stay f32 -- models/matcher.py)
        matcher = MultiViewMatcher(MatcherConfig(
            gnn_layers=default_gnn_layers(3, 1), sinkhorn_iterations=30,
            conf_mlp=False, match_threshold=0.0, multi_frame_matching=True,
            compute_dtype=dtype,
        ))
        out = jax.jit(lambda v, k, s, d, z: matcher.apply(v, k, s, d, z))(
            variables, mv_kpts, mv_scores, mv_descs, mv_size)
        m0 = np.asarray(out["matches0"])
        conf = jnp.where(out["matches0"] >= 0, out["matching_scores0"], 0.0)
        auc = mv_benchmark(out["matches0"], conf)
        results[dtype] = {"auc": [float(a) for a in auc], "m0": m0,
                          "conf": np.asarray(conf)}
        print(f"{dtype}: AUC@5/10/20 = {[round(a * 100, 1) for a in auc]}",
              flush=True)

    f32, b16 = results["float32"], results["bfloat16"]
    agree = float((f32["m0"] == b16["m0"]).mean())
    conf_dev = float(np.abs(f32["conf"] - b16["conf"]).max())
    d20 = abs(f32["auc"][2] - b16["auc"][2])
    print(f"match agreement: {agree:.4f}", flush=True)
    print(f"max |conf_f32 - conf_bf16|: {conf_dev:.4f}", flush=True)
    print(f"|AUC@20 delta|: {d20 * 100:.2f} points", flush=True)

    payload = {
        "auc_f32": f32["auc"], "auc_bf16": b16["auc"],
        "auc20_delta_points": d20 * 100,
        "match_agreement": agree, "max_conf_dev": conf_dev,
        "auc_f32_at_save": [float(a) for a in blob.get("auc_f32_at_save", [])],
        "platform": jax.devices()[0].platform,
        "fixture": {"B": B, "V": V, "K": K},
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {args.out}", flush=True)

    if args.gate:
        assert d20 <= 0.02, f"AUC@20 moved {d20 * 100:.2f} points under bf16"
        assert agree >= 0.98, f"match agreement {agree:.4f} < 0.98"
        print("bf16 parity gate: PASS", flush=True)


if __name__ == "__main__":
    main()
