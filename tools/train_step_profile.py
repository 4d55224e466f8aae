"""Per-stage decomposition of the training step on the real chip.

The round-4 train matrix (BASELINE.md) got B=8 pallas bf16 to 256.6 ms/step
(14.7% MFU at accum=4); the named next lever is the frozen SuperPoint forward
inside the step. This probe times each stage of the step in isolation --
SuperPoint fwd, GT correspondence gen, matcher fwd, matcher fwd+bwd, optax
update -- each as `iters` scan iterations inside ONE jit (amortizing the
~30 ms tunnel dispatch), so the numbers are net device time.

Reference workload being decomposed: `/root/reference/train.py:405-435`.

Run: timeout 3600 python tools/train_step_profile.py [B dtype impl]
"""

import os
import sys
import time
import types

import numpy as np

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("_EMVM_TSP_REEXEC") != "1"
):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1", _EMVM_TSP_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import V5E_PEAK_FLOPS, matcher_flops, superpoint_flops  # noqa: E402
from e2e_multi_view_matching_tpu.data.gt_matches import gt_matches_all_pairs  # noqa: E402
from e2e_multi_view_matching_tpu.models.matcher import (  # noqa: E402
    MatcherConfig, MultiViewMatcher, default_gnn_layers)
from e2e_multi_view_matching_tpu.models.superpoint import (  # noqa: E402
    SuperPoint, SuperPointConfig)
from e2e_multi_view_matching_tpu.train.losses import (  # noqa: E402
    combine_losses, matcher_losses)
from e2e_multi_view_matching_tpu.train.optim import build_optimizer  # noqa: E402

V, K, D = 5, 400, 256
H, W = 480, 640
GNN = default_gnn_layers(7, 3)
key = jax.random.PRNGKey(0)
ITERS = 8


def timed_scan(fn, args, iters=ITERS, label=""):
    """Run `fn(*args)` `iters` times inside one jit via lax.scan; return net
    ms/iter (total device time / iters; the single dispatch overhead is
    amortized to <4 ms/iter at iters=8)."""

    def body(carry, _):
        out = fn(*args)
        # fold a scalar of the output into the carry so iterations are not DCE'd
        s = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32) * 0) + x.reshape(-1)[0].astype(jnp.float32),
            out, jnp.zeros(()),
        )
        return carry + s, None

    @jax.jit
    def run():
        tot, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return tot

    t0 = time.perf_counter()
    r = run()
    _ = float(np.asarray(r))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run()))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / iters * 1e3
    print(f"  {label:34s}: {ms:7.2f} ms/iter  (compile {compile_s:.0f}s)",
          flush=True)
    return ms


def main(B=8, dtype="bfloat16", impl="pallas"):
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
    n_pairs = V * (V - 1) // 2
    tx = build_optimizer(1e-4, 0.999992, 1e5, 9e5, pose_loss=True)
    images = jnp.asarray(rng.uniform(size=(B, V, H, W, 1)).astype(np.float32))
    intr3 = np.asarray([[525.0, 0, W / 2, 0], [0, 525.0, H / 2, 0],
                        [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    intr = jnp.asarray(np.broadcast_to(intr3, (B, V, 4, 4)))
    poses = jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32), (B, V, 4, 4))
                        ).at[:, :, 0, 3].add(jnp.arange(V) * 0.1)
    depths = jnp.asarray(rng.uniform(2, 5, size=(B, V, H, W)).astype(np.float32))
    sp_vars = sp.init({"params": key, "keypoints": key}, images[0])
    m_vars = matcher.init(key, jnp.zeros((1, V, K, 2)), jnp.zeros((1, V, K)),
                          jnp.zeros((1, V, K, D)), jnp.full((1, V, 2), float(H)))
    params, batch_stats = m_vars["params"], m_vars["batch_stats"]
    opt_state = tx.init(params)

    print(f"B={B} V={V} K={K} {H}x{W} dtype={dtype} impl={impl} "
          f"(scan x{ITERS} in one jit; net device ms)", flush=True)

    # --- stage 1: frozen SuperPoint over B*V frames
    flat = images.reshape(B * V, H, W, 1)

    def sp_fwd(imgs):
        return sp.apply(sp_vars, imgs, rngs={"keypoints": key})

    if os.environ.get("TSP_SKIP_SP") == "1":
        t_sp = 113.6  # round-4 measured (this probe's first run); skip the 226s recompile
        print(f"  SuperPoint fwd ({B * V} frames)        : (skipped, using 113.6)")
    else:
        t_sp = timed_scan(sp_fwd, (flat,),
                          label=f"SuperPoint fwd ({B * V} frames)")

    sp_out = jax.jit(sp_fwd)(flat)
    kpts = sp_out["keypoints"].reshape(B, V, -1, 2)
    scores = sp_out["scores"].reshape(B, V, -1)
    descs = sp_out["descriptors"].reshape(B, V, -1, D)
    image_size = jnp.broadcast_to(jnp.asarray([H, W], jnp.float32), (B, V, 2))

    # --- stage 2: GT correspondences
    def gt_fn(kp):
        return gt_matches_all_pairs(kp, intr, poses, depths, 5.0, 15.0)

    t_gt = timed_scan(gt_fn, (kpts,), label="GT correspondence gen")
    gt_indices, gt_weights = jax.jit(gt_fn)(kpts)

    # --- stage 3: matcher fwd (train mode)
    def m_fwd(p, bs):
        out, _ = matcher.apply(
            {"params": p, "batch_stats": bs}, kpts, scores, descs, image_size,
            train=True, full_output=True, mutable=["batch_stats"])
        return out["log_assignment"]

    t_mf = timed_scan(m_fwd, (params, batch_stats), label="matcher fwd (train)")

    # --- stage 4: matcher fwd + loss + bwd
    def loss_fn(p, bs):
        out, updates = matcher.apply(
            {"params": p, "batch_stats": bs}, kpts, scores, descs, image_size,
            train=True, full_output=True, mutable=["batch_stats"])
        losses = matcher_losses(out, gt_indices, gt_weights, kpts, intr, poses,
                                pose_loss=True)
        total, scaled = combine_losses(losses, n_pairs, jnp.zeros(()), 726.0, 244.0)
        return total

    def m_fwd_bwd(p, bs):
        return jax.grad(loss_fn)(p, bs)

    t_mfb = timed_scan(m_fwd_bwd, (params, batch_stats),
                       label="matcher fwd+loss+bwd")

    # --- stage 5: optax update alone
    grads = jax.jit(m_fwd_bwd)(params, batch_stats)

    def upd(g, os_, p):
        u, nos = tx.update(g, os_, p)
        import optax as _optax
        return _optax.apply_updates(p, u)

    t_up = timed_scan(upd, (grads, opt_state, params), label="optax update")

    total = t_sp + t_gt + t_mfb + t_up
    sp_fl = superpoint_flops(B * V, H, W)
    m_fl = matcher_flops(B, V, K, D, GNN)
    print(f"\n  sum of stages (sp+gt+fwdbwd+upd)  : {total:7.2f} ms "
          f"(vs measured full step ~257 ms at this config)")
    print(f"  SuperPoint share                  : {t_sp / total * 100:5.1f}%  "
          f"(MFU {sp_fl / (t_sp / 1e3) / V5E_PEAK_FLOPS * 100:.1f}%)")
    print(f"  matcher fwd+bwd share             : {t_mfb / total * 100:5.1f}%  "
          f"(MFU {3 * m_fl / (t_mfb / 1e3) / V5E_PEAK_FLOPS * 100:.1f}%, "
          f"bwd-only {t_mfb - t_mf:.1f} ms)")
    print(f"  gt/update share                   : {(t_gt + t_up) / total * 100:5.1f}%")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 8, a[1] if len(a) > 1 else "bfloat16",
         a[2] if len(a) > 2 else "pallas")
