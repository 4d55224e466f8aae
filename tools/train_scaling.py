"""Train-step batch-scaling curve on the real chip (VERDICT r2 item 9).

Measures the jitted full training step (SuperPoint frozen forward -> GT
correspondences -> matcher fwd+bwd -> optax update) at B in {2, 8, 16} x
{float32, bfloat16 matcher+trunk compute}, the workload the reference actually
scales (ScanNet 5-tuples bs 8 x 3 GPUs, `/root/reference/README.md:144`).

Run: timeout 3600 python tools/train_scaling.py
"""

import os
import sys
import time
import types

import numpy as np

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("_EMVM_TSC_REEXEC") != "1"
):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1", _EMVM_TSC_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import V5E_PEAK_FLOPS, matcher_flops, superpoint_flops  # noqa: E402
from e2e_multi_view_matching_tpu.models.matcher import (  # noqa: E402
    MatcherConfig, MultiViewMatcher, default_gnn_layers)
from e2e_multi_view_matching_tpu.models.superpoint import (  # noqa: E402
    SuperPoint, SuperPointConfig)
from e2e_multi_view_matching_tpu.train.optim import build_optimizer  # noqa: E402
from e2e_multi_view_matching_tpu.train.step import (  # noqa: E402
    create_train_state, make_train_step)

V, K, D = 5, 400, 256
H, W = 480, 640
GNN = default_gnn_layers(7, 3)
key = jax.random.PRNGKey(0)


def run(B, dtype, impl="xla", grad_accum=1):
    rng = np.random.default_rng(0)
    sp = SuperPoint(SuperPointConfig(
        nms_radius=4, keypoint_threshold=1e-3, max_keypoints=K,
        remove_borders=12, fill_with_random_keypoints=True,
        compute_dtype=dtype,
    ))
    matcher = MultiViewMatcher(MatcherConfig(
        gnn_layers=GNN, sinkhorn_iterations=100, conf_mlp=True,
        multi_frame_matching=True, compute_dtype=dtype,
        attention_impl=impl, sinkhorn_impl=impl,
    ))
    opt = types.SimpleNamespace(
        pose_loss=True, rot_weight=726.0, trans_weight=244.0,
        final_pose_match_ratio=0.99, match_reproj_err=5.0,
        unmatch_reproj_err=15.0, tuple_size=V,
    )
    tx = build_optimizer(1e-4, 0.999992, 1e5, 9e5, pose_loss=True)
    images = jnp.asarray(rng.uniform(size=(B, V, H, W, 1)).astype(np.float32))
    intr3 = np.asarray([[525.0, 0, W / 2, 0], [0, 525.0, H / 2, 0],
                        [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    intr = jnp.asarray(np.broadcast_to(intr3, (B, V, 4, 4)))
    poses = jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32), (B, V, 4, 4))
                        ).at[:, :, 0, 3].add(jnp.arange(V) * 0.1)
    depths = jnp.asarray(rng.uniform(2, 5, size=(B, V, H, W)).astype(np.float32))
    batch = {"images": images, "intr": intr, "poses": poses, "depths": depths}
    sp_vars = sp.init({"params": key, "keypoints": key}, images[0])
    m_vars = matcher.init(key, jnp.zeros((1, V, K, 2)), jnp.zeros((1, V, K)),
                          jnp.zeros((1, V, K, D)), jnp.full((1, V, 2), float(H)))
    state = create_train_state(m_vars["params"], m_vars["batch_stats"], tx)
    step_fn = jax.jit(make_train_step(sp, matcher, tx, opt,
                                      grad_accum=grad_accum))

    t_compile0 = time.perf_counter()
    state, metrics = step_fn(state, sp_vars, batch, key)
    _ = float(np.asarray(metrics["train_loss"]))
    t_compile = time.perf_counter() - t_compile0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, sp_vars, batch, key)
        _ = float(np.asarray(metrics["train_loss"]))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    # fwd FLOPs: frozen SuperPoint fwd only; matcher fwd+bwd ~ 3x fwd
    fl = superpoint_flops(B * V, H, W) + 3 * matcher_flops(B, V, K, D, GNN)
    mfu = fl / t / V5E_PEAK_FLOPS
    acc = f" accum={grad_accum}" if grad_accum > 1 else ""
    print(f"B={B:2d} {dtype:8s} {impl:6s}{acc}: {t * 1e3:7.1f} ms/step = "
          f"{B / t:6.2f} tuples/s, "
          f"MFU {mfu * 100:4.1f}%  (loss {float(np.asarray(metrics['train_loss'])):.2f}, "
          f"compile {t_compile:.0f}s)", flush=True)
    return B / t


if __name__ == "__main__":
    configs = [(B, dt, "xla", 1) for dt in ("float32", "bfloat16")
               for B in (2, 8, 16)]
    if len(sys.argv) > 1:  # e.g. "16:float32,2:bfloat16:pallas,32:bfloat16:pallas:4"
        configs = [tuple(s.split(":")) for s in sys.argv[1].split(",")]
        configs = [(int(c[0]), c[1], c[2] if len(c) > 2 else "xla",
                    int(c[3]) if len(c) > 3 else 1)
                   for c in configs]
    for B, dtype, impl, accum in configs:
        try:
            run(B, dtype, impl, accum)
        except Exception as e:
            print(f"B={B:2d} {dtype:8s} {impl:6s} accum={accum}: FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)
