"""Matcher forward decomposition at the train shape, scan-amortized.

The round-4 continuation profile (tools/train_step_profile.py) puts the
matcher at 54.5 ms fwd / 94.8 ms bwd of the ~200 ms step -- now the dominant
block. This probe attributes the forward: keypoint encoder, GNN depth sweep
(cost per self/cross layer), Sinkhorn (by iteration-count difference), and
the matches/conf tail. Each cut is 8 scan iterations inside ONE jit.

Run: timeout 3600 python tools/matcher_scan_profile.py
"""

import os
import sys
import time

import numpy as np

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("_EMVM_MSP_REEXEC") != "1"
):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1", _EMVM_MSP_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2e_multi_view_matching_tpu.models.matcher import (  # noqa: E402
    MatcherConfig, MultiViewMatcher, default_gnn_layers)

B, V, K, D = 8, 5, int(os.environ.get("EMVM_MSP_K", "400")), 256
ITERS = int(os.environ.get("EMVM_MSP_ITERS", "8"))
DTYPE = os.environ.get("EMVM_MSP_DTYPE", "bfloat16")  # matcher compute dtype
TRAIN = os.environ.get("EMVM_MSP_TRAIN", "1") == "1"  # train vs eval forward
key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)
kpts = jnp.asarray(rng.uniform(0, 480, size=(B, V, K, 2)).astype(np.float32))
scores = jnp.asarray(rng.uniform(size=(B, V, K)).astype(np.float32))
descs = jnp.asarray(rng.normal(size=(B, V, K, D)).astype(np.float32))
descs = descs / jnp.linalg.norm(descs, axis=-1, keepdims=True)
image_size = jnp.full((B, V, 2), 480.0)


def timed_scan(fn, label):
    def body(carry, _):
        out = fn()
        s = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), out, jnp.zeros(()))
        return carry + s, None

    @jax.jit
    def run():
        tot, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return tot

    t0 = time.perf_counter()
    _ = float(np.asarray(run()))
    c = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run()))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / ITERS * 1e3
    print(f"  {label:46s}: {ms:7.2f} ms  (compile {c:.0f}s)", flush=True)
    return ms


def build(gnn_layers, sinkhorn_iterations=100, full_output=True, impl="pallas"):
    m = MultiViewMatcher(MatcherConfig(
        gnn_layers=gnn_layers, sinkhorn_iterations=sinkhorn_iterations,
        conf_mlp=full_output, multi_frame_matching=True,
        compute_dtype=DTYPE, attention_impl=impl, sinkhorn_impl=impl))
    v = m.init(key, kpts[:1], scores[:1], descs[:1], image_size[:1])

    def fn():
        if TRAIN:
            out, _ = m.apply(v, kpts, scores, descs, image_size, train=True,
                             full_output=full_output, mutable=["batch_stats"])
        else:
            out = m.apply(v, kpts, scores, descs, image_size,
                          full_output=full_output)
        # consume every float leaf fully (prevents DCE of unused outputs)
        return {k: o for k, o in out.items()
                if o.dtype in (jnp.float32, jnp.bfloat16)}
    return fn


full_gnn = default_gnn_layers(7, 3)
print(f"B={B} V={V} K={K} {DTYPE} pallas train={TRAIN}, "
      f"scan x{ITERS} in one jit", flush=True)
t0l = timed_scan(build((), 1, False), "kenc + scores + Sinkhorn(1), no GNN")
t1b = timed_scan(build(full_gnn[:4], 1, False), "+ 1x(self+3cross) GNN block")
t7b = timed_scan(build(full_gnn, 1, False), "+ 7x(self+3cross) GNN (full depth)")
t100 = timed_scan(build(full_gnn, 100, False), "+ Sinkhorn 100 (no matches/conf)")
tfull = timed_scan(build(full_gnn, 100, True), "FULL (matches + conf head)")
txla = timed_scan(build(full_gnn, 100, True, impl="xla"),
                  "FULL with xla attention+sinkhorn")

print("\nattribution:")
print(f"  kenc + pair scores + misc          : {t0l:7.2f} ms")
print(f"  per GNN block (self+3cross)        : {(t7b - t1b) / 6:7.2f} ms "
      f"(x7 = {(t7b - t1b) * 7 / 6:.2f})")
print(f"  Sinkhorn 100 iters (pallas)        : {t100 - t7b:7.2f} ms")
print(f"  matches + conf tail                : {tfull - t100:7.2f} ms")
print(f"  xla vs pallas full forward         : {txla:7.2f} vs {tfull:7.2f} ms")
