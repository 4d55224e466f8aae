"""Benchmark: end-to-end multi-view matching throughput on the local accelerator.

Measures the flagship inference path at the reference's multi-view eval
configuration (5-tuple, 1024 keypoints, 256-d descriptors, full GNN depth
7x(self+3*cross), 100 Sinkhorn iterations -- `/root/reference/eval_multi_view.py:
115,130-132`, `train.py:262-268`): matcher forward producing all 10 pairwise
log-assignments, matches, and confidence scores.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` is measured against BASELINE_TUPLES_PER_S: the reference publishes
no absolute throughput (BASELINE.md), so the anchor is an estimate of its GPU
eval throughput (~10 sequential SuperGlue-style pair matchings per 5-tuple at
~150 ms each on the reference's unspecified GPU => ~0.7 tuples/s).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_TUPLES_PER_S = 0.7

# The axon TPU tunnel compiles ~5x faster with terminal-side compilation, but
# the flag must be set before the interpreter's sitecustomize registers the
# backend -- so re-exec once with it.
if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("_EMVM_BENCH_REEXEC") != "1"
):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1", _EMVM_BENCH_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    import jax
    import jax.numpy as jnp

    from e2e_multi_view_matching_tpu.models.matcher import (
        MatcherConfig,
        MultiViewMatcher,
        default_gnn_layers,
    )

    B, V, K, D = 1, 5, 1024, 256
    cfg = MatcherConfig(
        gnn_layers=default_gnn_layers(7, 3),  # tuple>2 scannet config
        sinkhorn_iterations=100,
        conf_mlp=True,
        multi_frame_matching=True,
        # fused Pallas attention: 1.7x over the XLA path (45.5 vs 77.6 ms),
        # hardware-validated to ~4e-4 agreement; requires the remote-compile
        # re-exec above on the axon tunnel
        attention_impl="pallas",
    )
    matcher = MultiViewMatcher(cfg)
    rng = np.random.default_rng(0)
    kpts = jnp.asarray(rng.uniform(0, 480, size=(B, V, K, 2)).astype(np.float32))
    scores = jnp.asarray(rng.uniform(size=(B, V, K)).astype(np.float32))
    descs = jnp.asarray(rng.normal(size=(B, V, K, D)).astype(np.float32))
    descs = descs / jnp.linalg.norm(descs, axis=-1, keepdims=True)
    image_size = jnp.full((B, V, 2), 480.0)
    variables = matcher.init(jax.random.PRNGKey(0), kpts, scores, descs, image_size)

    @jax.jit
    def forward(variables, kpts, scores, descs, image_size):
        out = matcher.apply(variables, kpts, scores, descs, image_size)
        return out["log_assignment"], out["matches0"], out["conf_scores"]

    # warmup/compile (force a real device->host sync: on the axon remote
    # platform `block_until_ready` returns before execution finishes, so every
    # timing iteration ends in a scalar fetch).
    out = forward(variables, kpts, scores, descs, image_size)
    float(out[0][0, 0, 0, 0])

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = forward(variables, kpts, scores, descs, image_size)
        float(out[0][0, 0, 0, 0])
    dt = time.perf_counter() - t0
    tuples_per_s = n_iters * B / dt

    print(
        json.dumps(
            {
                "metric": "five_tuple_matcher_throughput",
                "value": round(tuples_per_s, 4),
                "unit": "tuples/s",
                "vs_baseline": round(tuples_per_s / BASELINE_TUPLES_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
