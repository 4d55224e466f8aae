"""Benchmark: end-to-end 5-tuple eval pipeline + train step on the local chip.

Measures the reference's multi-view benchmark scope (`/root/reference/
eval_multi_view.py:154-165`): SuperPoint detection over all B*V frames ->
multi-frame matcher (full GNN depth 7x(self+3*cross), K=1024, 100 Sinkhorn
iterations -- `eval_multi_view.py:115,130-132`, `train.py:262-268`) -> robust
pose pipeline (per-pair w8pt+IRLS+BA -> spanning tree -> rotation/translation
averaging -> multi-camera Schur BA), plus one full training step.

Methodology: the axon TPU tunnel adds ~28 ms of fixed dispatch overhead per
host round trip (measured; `block_until_ready` returns early, so every timing
ends in a scalar fetch). Stages therefore run at batch B=8 tuples per dispatch
and report per-tuple times; a separate trivial-kernel measurement reports the
overhead explicitly. MFU is computed from analytic matmul/conv FLOPs against
the v5e bf16 MXU peak (197 TFLOP/s) -- conservative for f32 execution.

Prints per-stage lines, then ONE final JSON line {"metric", "value", "unit",
"vs_baseline"}. The headline is the PRODUCTION dispatch pattern: the eval
CLIs' depth-2 pipelined loop (one chunk in flight, fetch overlapped with the
next chunk's compute) over scan x B chunks -- the serial per-dispatch numbers
above it understate what `cli/eval_multi_view.py` actually achieves by the
~25 ms tunnel round trip. `vs_baseline` is ESTIMATE-ONLY: the reference
publishes no absolute throughput (BASELINE.md); the anchor 0.7 tuples/s is a
documented guess of its sequential per-pair GPU eval (~10 pairs x ~150 ms).
The honest measured anchor is round 1's 20.53 tuples/s (BENCH_r01.json,
matcher-only).
"""

import json
import os
import sys
import time
import types

import numpy as np

BASELINE_TUPLES_PER_S = 0.7  # estimate-only (see module docstring)
V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak, TPU v5 lite

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


def _fetch(x):
    """Force real device execution (tunnel's block_until_ready lies)."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf).ravel()[0])


def timed(fn, *args, n=8):
    """Min wall time of `fn`, ending in a 4-byte device->host fetch.

    The ending fetch must be a SCALAR reduced on device: fetching a whole
    output leaf (e.g. SuperPoint's 42 MB descriptor tensor) times the tunnel
    transfer, not the op (round-2 bench overstated the SuperPoint stage ~40%
    this way). All leaves feed the reduction so nothing is dead-code-eliminated.
    """
    import jax
    import jax.numpy as jnp

    red = jax.jit(lambda *a: sum(
        jnp.sum(l.astype(jnp.float32))
        for l in jax.tree_util.tree_leaves(fn(*a))
    ))
    red(*args)
    _fetch(red(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _fetch(red(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def matcher_flops(B, V, K, D, gnn_layers, kenc=(32, 64, 128, 256)):
    """Analytic matmul FLOPs of one matcher forward (MACs x2)."""
    T = V * K
    f = 0
    cin = 3
    for c in tuple(kenc) + (D,):
        f += B * T * cin * c * 2
        cin = c
    per_layer = (
        4 * B * T * D * D * 2          # q/k/v/merge projections
        + 2 * B * T * T * D * 2        # scores + value aggregation
        + B * T * (2 * D) * (2 * D) * 2 + B * T * (2 * D) * D * 2  # MLP
    )
    f += len(gnn_layers) * per_layer
    f += B * T * D * D * 2             # final_proj
    P = V * (V - 1) // 2
    f += B * P * K * K * D * 2         # pairwise score einsum
    return f


def superpoint_flops(n_images, H, W):
    """Analytic conv FLOPs of the SuperPoint VGG trunk + heads (MACs x2)."""
    f = 0
    for scale, cin, cout, k2 in (
        (1, 1, 64, 9), (1, 64, 64, 9),
        (2, 64, 64, 9), (2, 64, 64, 9),
        (4, 64, 128, 9), (4, 128, 128, 9),
        (8, 128, 128, 9), (8, 128, 128, 9),
        (8, 128, 256, 9), (8, 256, 65, 1),   # detector head
        (8, 128, 256, 9), (8, 256, 256, 1),  # descriptor head
    ):
        f += (H // scale) * (W // scale) * cin * cout * k2 * 2
    return n_images * f


def main():
    import argparse

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
        multi_view_pose_pipeline_batch,
    )

    ap = argparse.ArgumentParser(description="e2e bench")
    ap.add_argument("--data_parallel", type=int, default=1,
                    help="shard the fused eval chunk over this many devices "
                         "(data axis); per-device batch stays 8, so the "
                         "global chunk is 8*N tuples -- the weak-scaling "
                         "harness (BASELINE.md round-4 scaling procedure). "
                         "N must divide len(jax.devices()).")
    ap.add_argument("--eval_scan", type=int, default=2,
                    help="sub-chunks per dispatch for the fused eval stage "
                         "(the eval CLIs' --eval_scan production default is "
                         "2: one dispatch lax.maps eval_scan B=8 sub-chunks, "
                         "amortizing the tunnel round trip; 1 = flat only)")
    args, _ = ap.parse_known_args()
    dp = max(1, args.data_parallel)
    scan = max(1, args.eval_scan)

    B, V, K, D = 8 * dp, 5, 1024, 256
    H, W = 480, 640  # ScanNet eval resolution (depth-sized frames)
    gnn_layers = default_gnn_layers(7, 3)  # tuple>2 scannet config
    rng = np.random.default_rng(0)

    if dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from e2e_multi_view_matching_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_devices=dp, model_parallel=1)
        _shard = NamedSharding(mesh, P("data"))
        _repl = NamedSharding(mesh, P())

        def place(x):
            return jax.device_put(x, _shard)

        def replicate(tree):
            return jax.device_put(tree, _repl)
    else:
        def place(x):
            return x

        def replicate(tree):
            return tree

    # ---- fixed dispatch overhead of the tunnel --------------------------
    trivial = jax.jit(lambda x: x + 1.0)
    overhead = timed(trivial, jnp.zeros((8, 8)))
    print(f"dispatch overhead: {overhead * 1e3:.1f} ms", flush=True)

    # ---- stage 1: SuperPoint over B*V frames ----------------------------
    sp = SuperPoint(SuperPointConfig(
        nms_radius=4, keypoint_threshold=1e-3, max_keypoints=K,
        remove_borders=4, fill_with_random_keypoints=True,
    ))
    images_np = rng.uniform(size=(B * V, H, W, 1)).astype(np.float32)
    images = place(jnp.asarray(images_np))
    key = jax.random.PRNGKey(0)
    sp_vars = replicate(sp.init({"params": key, "keypoints": key},
                                jnp.zeros((1, H, W, 1))))

    @jax.jit
    def sp_fwd(variables, images, rng_):
        return sp.apply(variables, images, rngs={"keypoints": rng_})

    t_sp = timed(sp_fwd, sp_vars, images, key)
    sp_f = superpoint_flops(B * V, H, W)
    print(f"superpoint: {t_sp * 1e3:.1f} ms ({B} tuples, {B * V} frames "
          f"{H}x{W}) -> {t_sp / B * 1e3:.1f} ms/tuple, "
          f"MFU {sp_f / t_sp / V5E_PEAK_FLOPS * 100:.1f}%", flush=True)
    sp_out = sp_fwd(sp_vars, images, key)
    _fetch(sp_out["keypoints"])

    # ---- stage 2: multi-frame matcher ------------------------------------
    cfg = MatcherConfig(
        gnn_layers=gnn_layers, sinkhorn_iterations=100, conf_mlp=True,
        multi_frame_matching=True,
        attention_impl="pallas",  # fused in-kernel-masked attention
        sinkhorn_impl="pallas",   # VMEM-resident scaling-domain kernel
        # (9.7x vs the XLA log scan, 3.5x vs the XLA scaling path at this
        # shape -- BASELINE.md round-3 Sinkhorn shootout)
    )
    matcher = MultiViewMatcher(cfg)
    kpts = sp_out["keypoints"].reshape(B, V, K, 2)
    scores = sp_out["scores"].reshape(B, V, K)
    descs = sp_out["descriptors"].reshape(B, V, K, D)
    image_size = place(jnp.full((B, V, 2), 0.0).at[..., 0].set(H).at[..., 1].set(W))
    variables = replicate(matcher.init(jax.random.PRNGKey(0),
                                       jax.device_get(kpts[:1]),
                                       jax.device_get(scores[:1]),
                                       jax.device_get(descs[:1]),
                                       jax.device_get(image_size[:1])))

    @jax.jit
    def m_fwd(variables, kpts, scores, descs, image_size):
        out = matcher.apply(variables, kpts, scores, descs, image_size)
        return out["matches0"], out["matching_scores0"], out["conf_scores"]

    t_m = timed(m_fwd, variables, kpts, scores, descs, image_size)
    m_f = matcher_flops(B, V, K, D, gnn_layers)
    print(f"matcher: {t_m * 1e3:.1f} ms ({B} tuples) -> "
          f"{t_m / B * 1e3:.1f} ms/tuple, "
          f"MFU {m_f / t_m / V5E_PEAK_FLOPS * 100:.1f}%", flush=True)
    matches0, mscores0, conf = m_fwd(variables, kpts, scores, descs, image_size)
    _fetch(matches0)

    # ---- stage 3: robust multi-view pose pipeline ------------------------
    intr = np.broadcast_to(
        np.asarray([[525.0, 0, W / 2], [0, 525.0, H / 2], [0, 0, 1]],
                   np.float32), (B, V, 3, 3)).copy()
    conf_w = jnp.where(matches0 >= 0, conf, 0.0)

    def pose_stage(profile=None):
        return multi_view_pose_pipeline_batch(kpts, intr, matches0, conf_w,
                                              profile=profile)

    pose_stage()  # compile both jitted stages
    t_pose_l, profiles = [], []
    for _ in range(4):
        prof = {}
        t0 = time.perf_counter()
        extr = pose_stage(profile=prof)
        _ = float(np.asarray(extr).ravel()[0])
        t_pose_l.append(time.perf_counter() - t0)
        profiles.append(prof)
    t_pose = min(t_pose_l)
    prof = profiles[int(np.argmin(t_pose_l))]
    print(f"pose pipeline: {t_pose * 1e3:.1f} ms ({B} tuples) -> "
          f"{t_pose / B * 1e3:.1f} ms/tuple "
          f"[rel-pose {prof.get('stage_a_s', 0) * 1e3:.1f} ms | "
          f"tree(host) {prof.get('tree_host_s', 0) * 1e3:.1f} ms | "
          f"averaging+BA {prof.get('stage_b_s', 0) * 1e3:.1f} ms]", flush=True)

    t_staged = (t_sp + t_m + t_pose) / B
    print(f"end-to-end eval (staged sum): {t_staged * 1e3:.1f} ms/tuple = "
          f"{1.0 / t_staged:.2f} tuples/s", flush=True)

    # ---- fused end-to-end: SuperPoint -> matcher -> COMPLETE pose pipeline
    # (robust rel-poses -> device spanning trees -> averaging -> Schur BA) in
    # ONE compiled program (the eval CLI's production path); the chunk's only
    # host transfer is the final (B, V, 4, 4) extrinsics fetch -- 1 tunnel
    # round trip instead of round 2's 4.
    from e2e_multi_view_matching_tpu.mvba.pipeline import (
        MultiViewPipelineConfig,
        multi_view_pose_device,
    )

    pcfg = MultiViewPipelineConfig()
    intr_dev = place(jnp.asarray(intr))

    @jax.jit
    def fused_e2e_fn(sp_vars, m_vars, images, intr_, image_size, rng_):
        sp_out = sp.apply(sp_vars, images, rngs={"keypoints": rng_})
        kpts_ = sp_out["keypoints"].reshape(B, V, K, 2)
        scores_ = sp_out["scores"].reshape(B, V, K)
        descs_ = sp_out["descriptors"].reshape(B, V, K, D)
        out = matcher.apply(m_vars, kpts_, scores_, descs_, image_size)
        return multi_view_pose_device(
            kpts_, intr_, out["matches0"], out["conf_scores"], pcfg)

    def fused_e2e():
        return np.asarray(fused_e2e_fn(sp_vars, variables, images, intr_dev,
                                       image_size, key))

    fused_e2e()  # compile
    t_fused_l = []
    for _ in range(4):
        t0 = time.perf_counter()
        extr = fused_e2e()  # ends in the full extrinsics host fetch
        t_fused_l.append(time.perf_counter() - t0)
    t_fused = min(t_fused_l)
    assert np.all(np.isfinite(extr))
    t_tuple = t_fused / B
    tuples_per_s = 1.0 / t_tuple
    e2e_mfu = (sp_f + m_f) / t_fused / V5E_PEAK_FLOPS
    print(f"end-to-end eval (fused): {t_tuple * 1e3:.1f} ms/tuple = "
          f"{tuples_per_s:.2f} tuples/s, pipeline MFU {e2e_mfu * 100:.1f}%"
          + (f"  [data_parallel={dp}: {tuples_per_s / dp:.2f} tuples/s/device, "
             f"global chunk B={B}]" if dp > 1 else ""),
          flush=True)

    if scan > 1:
        # production configuration of the eval CLIs (--eval_scan 2): ONE
        # dispatch lax.maps `scan` B-sized sub-chunks, amortizing the tunnel
        # round trip while the program body stays B-sized
        if dp > 1:
            place_s = lambda x: jax.device_put(
                x, NamedSharding(mesh, P(None, "data")))
        else:
            place_s = lambda x: x
        images_s = place_s(jnp.asarray(
            np.broadcast_to(images_np, (scan,) + images_np.shape).copy()))
        intr_s = place_s(jnp.asarray(
            np.broadcast_to(intr, (scan,) + intr.shape).copy()))
        size_s = place_s(jnp.broadcast_to(image_size, (scan,) + image_size.shape))

        @jax.jit
        def fused_scan_fn(sp_vars, m_vars, images_s, intr_s, size_s, rng_):
            def one(a):
                imgs, it, sz = a
                sp_out = sp.apply(sp_vars, imgs, rngs={"keypoints": rng_})
                kpts_ = sp_out["keypoints"].reshape(B, V, K, 2)
                scores_ = sp_out["scores"].reshape(B, V, K)
                descs_ = sp_out["descriptors"].reshape(B, V, K, D)
                out = matcher.apply(m_vars, kpts_, scores_, descs_, sz)
                return multi_view_pose_device(
                    kpts_, it, out["matches0"], out["conf_scores"], pcfg)

            return jax.lax.map(one, (images_s, intr_s, size_s))

        def fused_scan():
            return np.asarray(fused_scan_fn(sp_vars, variables, images_s,
                                            intr_s, size_s, key))

        fused_scan()  # compile
        t_scan_l = []
        for _ in range(4):
            t0 = time.perf_counter()
            extr_s = fused_scan()
            t_scan_l.append(time.perf_counter() - t0)
        t_scan = min(t_scan_l)
        assert np.all(np.isfinite(extr_s))
        n_tuples = scan * B
        tuples_per_s = n_tuples / t_scan
        e2e_mfu = scan * (sp_f + m_f) / t_scan / V5E_PEAK_FLOPS
        print(f"end-to-end eval (fused, scan {scan}x{B}): "
              f"{t_scan / n_tuples * 1e3:.1f} ms/tuple = "
              f"{tuples_per_s:.2f} tuples/s, pipeline MFU {e2e_mfu * 100:.1f}%"
              + (f"  [data_parallel={dp}: {tuples_per_s / dp:.2f} "
                 f"tuples/s/device]" if dp > 1 else ""),
              flush=True)

        # ---- production dispatch loop: the eval CLIs keep ONE chunk in
        # flight (depth-2 pipeline, cli/eval_multi_view.py `dispatch`), so
        # the tunnel's ~25 ms host round trip overlaps device compute. The
        # serial dispatch->fetch->dispatch numbers above UNDERSTATE the
        # CLI's actual throughput; this loop measures the real pattern over
        # several chunks and is the headline.
        N_CHUNKS = 6

        def run_production_loop():
            t0 = time.perf_counter()
            acc = 0.0
            in_flight = fused_scan_fn(sp_vars, variables, images_s,
                                      intr_s, size_s, key)
            for ci in range(N_CHUNKS):
                cur = in_flight
                if ci + 1 < N_CHUNKS:
                    in_flight = fused_scan_fn(sp_vars, variables, images_s,
                                              intr_s, size_s, key)
                e = np.asarray(cur)  # the CLI's full extrinsics fetch
                acc += float(e.ravel()[0])
            return (time.perf_counter() - t0), acc

        run_production_loop()  # warm
        t_prod = min(run_production_loop()[0] for _ in range(3))
        tuples_per_s = N_CHUNKS * n_tuples / t_prod
        e2e_mfu = N_CHUNKS * scan * (sp_f + m_f) / t_prod / V5E_PEAK_FLOPS
        print(f"end-to-end eval (production loop, depth-2 pipeline, "
              f"{N_CHUNKS} chunks of {scan}x{B}): "
              f"{t_prod / (N_CHUNKS * n_tuples) * 1e3:.1f} ms/tuple = "
              f"{tuples_per_s:.2f} tuples/s, pipeline MFU {e2e_mfu * 100:.1f}%"
              + (f"  [data_parallel={dp}: {tuples_per_s / dp:.2f} "
                 f"tuples/s/device]" if dp > 1 else ""),
              flush=True)

    # ---- stage 4: one full training step ---------------------------------
    from e2e_multi_view_matching_tpu.train.optim import build_optimizer
    from e2e_multi_view_matching_tpu.train.step import (
        create_train_state,
        make_train_step,
    )

    Bt, Kt = 2, 400  # scannet 5-tuple train config (400 kpts)
    sp_t = SuperPoint(SuperPointConfig(
        nms_radius=4, keypoint_threshold=1e-3, max_keypoints=Kt,
        remove_borders=12, fill_with_random_keypoints=True,
    ))
    matcher_t = MultiViewMatcher(MatcherConfig(
        gnn_layers=gnn_layers, sinkhorn_iterations=100, conf_mlp=True,
        multi_frame_matching=True,
        # round 4: REAL backward kernels (flash-attention bwd + VMEM-resident
        # Sinkhorn reverse sweep) make pallas the fastest training config too
        # (B=8 bf16: 383 -> 257 ms/step; BASELINE.md round-4 train matrix)
        attention_impl="pallas", sinkhorn_impl="pallas",
    ))
    opt = types.SimpleNamespace(
        pose_loss=True, rot_weight=726.0, trans_weight=244.0,
        final_pose_match_ratio=0.99, match_reproj_err=5.0,
        unmatch_reproj_err=15.0, tuple_size=V,
    )
    tx = build_optimizer(1e-4, 0.999992, 1e5, 9e5, pose_loss=True)
    timages = jnp.asarray(rng.uniform(size=(Bt, V, H, W, 1)).astype(np.float32))
    tintr = jnp.asarray(np.broadcast_to(
        np.concatenate([np.concatenate([intr[0, 0], np.zeros((3, 1), np.float32)], 1),
                        np.asarray([[0, 0, 0, 1]], np.float32)]), (Bt, V, 4, 4)))
    tposes = jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32), (Bt, V, 4, 4))
                         ).at[:, :, 0, 3].add(jnp.arange(V) * 0.1)
    tdepths = jnp.asarray(rng.uniform(2, 5, size=(Bt, V, H, W)).astype(np.float32))
    batch = {"images": timages, "intr": tintr, "poses": tposes, "depths": tdepths}
    sp_vars_t = sp_t.init({"params": key, "keypoints": key}, timages[0])
    m_vars_t = matcher_t.init(key, jnp.zeros((1, V, Kt, 2)), jnp.zeros((1, V, Kt)),
                              jnp.zeros((1, V, Kt, D)), jnp.full((1, V, 2), float(H)))
    state = create_train_state(m_vars_t["params"], m_vars_t["batch_stats"], tx)
    step_fn = jax.jit(make_train_step(sp_t, matcher_t, tx, opt))

    def one_step(state):
        new_state, metrics = step_fn(state, sp_vars_t, batch, key)
        return new_state, metrics

    new_state, metrics = one_step(state)
    _fetch(metrics["train_loss"])
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        new_state, metrics = one_step(new_state)
        _fetch(metrics["train_loss"])
        ts.append(time.perf_counter() - t0)
    t_train = min(ts)
    print(f"train step: {t_train * 1e3:.1f} ms (B={Bt}, V={V}, K={Kt}, "
          f"{H}x{W}, pose loss) -> {Bt / t_train:.2f} tuples/s", flush=True)

    print(json.dumps({
        "metric": "five_tuple_e2e_eval_throughput",
        "value": round(tuples_per_s, 4),
        "unit": "tuples/s",
        # ESTIMATE-ONLY anchor (reference publishes no throughput): ~0.7
        # tuples/s guessed GPU eval; measured round-1 anchor was 20.53
        # matcher-only tuples/s (BENCH_r01.json)
        "vs_baseline": round(tuples_per_s / BASELINE_TUPLES_PER_S, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
