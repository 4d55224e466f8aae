"""Focused conf-MLP-gate debug harness: decoy-pose twins + per-phase diagnostics.

Round-2 finding: the committed conf-gate fixture (tools/synthetic_e2e.py,
marker-twins at random positions) is geometrically rejected by the GNN --
the kenc positional encoding lets Sinkhorn drop twins whose positions are
inconsistent with ANY single pose (twin matched frac ~0.29 vs the >0.5 the
gate asserts). This harness plants twins consistent with a DECOY pose
(projected through a wrong relative transform), which survive matching
(twin matched frac 0.79-0.88 after stage 1) so only pose-loss-trained
confidence can separate them -- the conf MLP's raison d'etre
(reference: docs/index.html:173, conf weighting in bundle_adjust_io.py:82).

Round-3 status: PASSING (tools/conf_gate_result.json). Two fixes landed it:
(1) mean-offset descriptor marker -- the old variance marker (*=2.5) is a
quadratic feature linear probes read at chance (tools/conf_feature_probe.py:
raw AUC 0.49, post-GNN 0.67), so the head random-walked; (2) hotter conf-head
LR (1e-3 vs the reference stage-2 1e-5, which is tuned for fine-tuning a
CONVERGED head, not training a fresh graft). With both: stage-1 prec 1.00,
twin_matched 0.95; stage-2 collapses twin conf to ~0.00 vs true ~0.52 by
s2@800 and conf-weighted AUC@5/10/20 reaches 38.8/58.7/73.1 vs score-weighted
0/0/0 (oracle ceiling 48/68/84). tools/conf_descent_probe.py independently
shows the pose-loss landscape alone separates twins (direct descent on conf
values: ratio 0.41, conf-w AUC@20 77.5 at the 77.1 oracle ceiling).

Usage: PYTHONPATH=. JAX_PLATFORMS=cpu python tools/conf_gate_debug.py [S1] [S2] [conf_lr]
Passing run: PYTHONPATH=. JAX_PLATFORMS=cpu python tools/conf_gate_debug.py 1500 2000 1e-3
"""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, optax
jax.config.update("jax_platforms", "cpu")
from e2e_multi_view_matching_tpu.data.synthetic import SphereFieldScene
from e2e_multi_view_matching_tpu.geom.metrics import pose_auc, pose_error_max
from e2e_multi_view_matching_tpu.geom.eightpoint import estimate_relative_pose_w8pt
from e2e_multi_view_matching_tpu.models.matcher import (
    MatcherConfig, MultiViewMatcher, default_gnn_layers)
from e2e_multi_view_matching_tpu.train.losses import (
    match_loss_of_pair, matcher_losses, combine_losses)
from e2e_multi_view_matching_tpu.train.optim import build_optimizer
from e2e_multi_view_matching_tpu.train.checkpoint import _graft

rng = np.random.default_rng(1)
V, K, H, W, F = 2, 96, 192, 256, 260.0
# Planted outliers across several decoy poses: the regime where the pose-loss
# gradient actually separates twins from true points (tools/conf_signal_probe:
# at the old 33%/1-decoy setting the solve is bistable and the gradient is
# non-separating noise -- unlearnable). Low DESC_NOISE keeps stage-1 precision
# ~0.99 so twins are the DOMINANT pose error and the conf-vs-score comparison
# measures twin detection, the thing scores cannot do by construction.
N_TRUE = int(sys.argv[5]) if len(sys.argv) > 5 else 48
N_OUT = int(sys.argv[6]) if len(sys.argv) > 6 else 12
DESC_NOISE = float(sys.argv[7]) if len(sys.argv) > 7 else 0.2
MARKER = 32
NOISE_PX = 0.4
D = 256
N_EVAL = 24
MB = int(os.environ.get("CONF_GATE_MB", "8"))
RATIO_CAP = float(os.environ.get("CONF_GATE_RATIO", "0.8"))
key = jax.random.PRNGKey(0)

def build_case(scene, rng, n_decoy_poses=1):
    """Decoy twins consistent with `n_decoy_poses` DIFFERENT wrong poses.

    With one decoy pose, all 20 twins support a competing essential matrix:
    the w8pt Gram gets a second near-null eigenvector, the solve is bistable
    and the eigh gradient is noise (round-3 finding: score-w AUC ~0 and the
    conf head random-walks). Several decoy poses (< 8 points each) defeat
    score weighting without creating a rival null space, which is also the
    realistic regime (real outliers are not all mutually consistent)."""
    pix0, pix1 = scene.correspondences(0, 1, N_TRUE, rng, margin=12)
    dp0s, dp1s = [], []
    per = -(-N_OUT // n_decoy_poses)
    for _ in range(n_decoy_poses):
        decoy = SphereFieldScene(rng, n_views=2, H=H, W=W, f=F, baseline=0.9,
                                 rot_jitter=0.1)
        d0, d1 = decoy.correspondences(0, 1, per, rng, margin=12)
        dp0s.append(d0); dp1s.append(d1)
    dp0 = np.concatenate(dp0s)[:N_OUT]
    dp1 = np.concatenate(dp1s)[:N_OUT]
    n_vis, n_out = len(pix0), len(dp0)
    kpts = np.zeros((V, K, 2), np.float32)
    descs = np.zeros((V, K, D), np.float32)
    gt = np.full((2, K + 1), -1, np.int64)
    out_mask0 = np.zeros(K, bool)
    perm0, perm1 = rng.permutation(K), rng.permutation(K)
    s0t, s1t = perm0[:n_vis], perm1[:n_vis]
    s0o, s1o = perm0[n_vis:n_vis+n_out], perm1[n_vis:n_vis+n_out]
    r0, r1 = perm0[n_vis+n_out:], perm1[n_vis+n_out:]
    kpts[0, s0t] = pix0 + rng.normal(size=pix0.shape) * NOISE_PX
    kpts[1, s1t] = pix1 + rng.normal(size=pix1.shape) * NOISE_PX
    base = rng.normal(size=(n_vis, D)).astype(np.float32)
    descs[0, s0t] = base + rng.normal(size=(n_vis, D)) * DESC_NOISE
    descs[1, s1t] = base + rng.normal(size=(n_vis, D)) * DESC_NOISE
    gt[0, s0t] = s1t; gt[1, s1t] = s0t
    # decoy twins: geometrically consistent with the DECOY pose
    kpts[0, s0o] = dp0 + rng.normal(size=dp0.shape) * NOISE_PX
    kpts[1, s1o] = dp1 + rng.normal(size=dp1.shape) * NOISE_PX
    bo = rng.normal(size=(n_out, D)).astype(np.float32)
    # Mean-offset marker: a shared positive bias in the marker channels.
    # A pure variance marker (the old *=2.5 scaling) is a QUADRATIC feature:
    # linear probes on raw descriptors read AUC 0.49 (chance) and the GNN
    # carries it to the conf head at only 0.67 (tools/conf_feature_probe.py),
    # so head training random-walks. Real systematic outlier populations
    # (repeating texture, reflections) share directional signatures; the
    # offset keeps twins mutually similar (they still match: Sinkhorn runs on
    # descriptor similarity) while making twin-vs-true linearly readable.
    bo[:, -MARKER:] = bo[:, -MARKER:] * 0.5 + 1.2
    descs[0, s0o] = bo + rng.normal(size=(n_out, D)) * 0.1
    descs[1, s1o] = bo + rng.normal(size=(n_out, D)) * 0.1
    out_mask0[s0o] = True
    kpts[0, r0] = rng.uniform([10,10],[W-10,H-10],(len(r0),2))
    kpts[1, r1] = rng.uniform([10,10],[W-10,H-10],(len(r1),2))
    descs[0, r0] = rng.normal(size=(len(r0), D))
    descs[1, r1] = rng.normal(size=(len(r1), D))
    descs /= np.linalg.norm(descs, axis=-1, keepdims=True)
    kpts[...,0]=np.clip(kpts[...,0],0,W-1); kpts[...,1]=np.clip(kpts[...,1],0,H-1)
    weights = np.zeros((2, K+1), np.float32)
    for r, so in ((0, s0o), (1, s1o)):
        mfrac = min(max(n_vis / max(K - n_out, 1), 1e-3), 0.999)
        weights[r] = np.where(gt[r] >= 0, .5/mfrac, .5/(1-mfrac))
        weights[r, so] = 0.0
    scores = np.full((V, K), .5, np.float32)
    return (descs, kpts, scores, gt, weights,
            scene.relative_pose(0,1), scene.intr[0].astype(np.float32),
            np.stack([scene.poses[0], scene.poses[1]]).astype(np.float32),
            out_mask0)

N_DECOY = int(sys.argv[4]) if len(sys.argv) > 4 else 3


def build_set(n):
    cases = [build_case(SphereFieldScene(rng, n_views=V, H=H, W=W, f=F,
             baseline=0.9, rot_jitter=0.1), rng, n_decoy_poses=N_DECOY)
             for _ in range(n)]
    st = lambda i: jnp.asarray(np.stack([c[i] for c in cases]))
    return tuple(st(i) for i in range(9))

ev = build_set(N_EVAL)
e_size = jnp.full((N_EVAL, V, 2), 0.).at[...,0].set(H).at[...,1].set(W)
mb_size = jnp.full((MB, V, 2), 0.).at[...,0].set(H).at[...,1].set(W)

matcher = MultiViewMatcher(MatcherConfig(gnn_layers=default_gnn_layers(3,1),
    sinkhorn_iterations=30, conf_mlp=False, match_threshold=0.0))
mv = matcher.init(key, ev[1][:1], ev[2][:1], ev[0][:1], jnp.full((1,V,2), float(H)))
params, bstats = mv["params"], mv["batch_stats"]
tx = build_optimizer(3e-4, 1.0, 0, 0, pose_loss=False)
opt_state = tx.init(params)

@jax.jit
def step1(params, bstats, opt_state, bk, bs_, bd, bgi, bgw):
    def loss_fn(p):
        out, upd = matcher.apply({"params": p, "batch_stats": bstats}, bk, bs_,
            bd, mb_size, train=True, full_output=False, mutable=["batch_stats"])
        return match_loss_of_pair(out["log_assignment"][:,0], bgi, bgw), upd["batch_stats"]
    (l, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    u, opt_state = tx.update(g, opt_state, params)
    return optax.apply_updates(params, u), nbs, opt_state, l

def diag(mdl, p, bs, label, with_conf=False):
    out = mdl.apply({"params": p, "batch_stats": bs}, ev[1], ev[2], ev[0], e_size)
    m0 = np.asarray(out["matches0"][:,0])
    gt0 = np.asarray(ev[3][:,0,:-1]); outm = np.asarray(ev[8])
    true_lab = gt0 >= 0
    both = true_lab & (m0 >= 0)
    prec = (m0 == gt0)[both].mean() if both.any() else 0.
    twin_frac = (m0 >= 0)[outm].mean()
    msg = f"{label}: prec {prec:.2f} matched_true {(m0>=0)[true_lab].mean():.2f} twin_matched {twin_frac:.2f}"
    def auc_w(conf):
        conf = jnp.where(out["matches0"][:,0] >= 0, conf, 0.)
        g2 = jnp.clip(out["matches0"][:,0], 0, K-1)
        k1 = jnp.take_along_axis(ev[1][:,1], g2[...,None], axis=1)
        T, info = estimate_relative_pose_w8pt(ev[1][:,0], k1, ev[6], ev[6], conf, determine_inliers=True)
        errs = np.asarray(pose_error_max(ev[5], T, degrees=True))
        errs = np.where(np.asarray(info.valid), errs, np.inf)
        return [round(a*100,1) for a in pose_auc(errs, [5,10,20])]
    msg += f" | score-w AUC {auc_w(out['matching_scores0'][:,0])}"
    # oracle conf (1 on true points, 0 on twins/fillers): the ceiling the conf
    # head is asked to reach; if THIS is low the fixture itself is unsolvable
    oracle = jnp.asarray((~outm) & true_lab, jnp.float32)
    msg += f" oracle-w AUC {auc_w(oracle)}"
    # oracle-correct (1 only on CORRECT matches): ceiling when conf also
    # downweights matcher mismatches, the reference conf head's actual job
    msg += f" oracle-corr AUC {auc_w(jnp.asarray((m0 == gt0) & (m0 >= 0), jnp.float32))}"
    if with_conf:
        msg += f" conf-w AUC {auc_w(out['conf_scores'][:,0])}"
        confn = np.asarray(out["conf_scores"][:,0])
        mm = m0 >= 0
        msg += f" conf twins {confn[mm&outm].mean():.3f} true {confn[mm&true_lab].mean():.3f}"
    print(msg, flush=True)


def grad_probe(label, mdl=None, p=None, bs=None):
    """d(pose loss)/d(conf) at the CURRENT matches, oracle-split: a healthy
    training signal must push twins' conf DOWN (positive grad wrt conf) and
    true points' conf not-down relative to twins."""
    mdl = mdl if mdl is not None else matcher
    p = p if p is not None else params
    bs = bs if bs is not None else bstats
    out = mdl.apply({"params": p, "batch_stats": bs}, ev[1], ev[2], ev[0], e_size)
    m0 = out["matches0"][:, 0]
    gather = jnp.clip(m0, 0, K - 1)
    k1 = jnp.take_along_axis(ev[1][:, 1], gather[..., None], axis=1)
    target = jnp.asarray(ev[5])

    def pose_loss_of_conf(conf):
        conf = jnp.where(m0 >= 0, conf, 0.0)
        T, _ = estimate_relative_pose_w8pt(ev[1][:, 0], k1, ev[6], ev[6], conf,
                                           choose_closest=True, target_T021=target)
        from e2e_multi_view_matching_tpu.geom.metrics import (
            rotation_angle_error, translation_angle_error)
        return rotation_angle_error(T, target) + translation_angle_error(T, target)

    conf0 = jnp.full((N_EVAL, K), 0.5, jnp.float32)
    g = np.asarray(jax.grad(pose_loss_of_conf)(conf0))
    gt0 = np.asarray(ev[3][:, 0, :-1]); outm = np.asarray(ev[8])
    mm = np.asarray(m0) >= 0
    tl = (gt0 >= 0) & mm
    tw = outm & mm
    print(f"{label} grad-probe: mean d(loss)/d(conf) twins {g[tw].mean():+.2e} "
          f"true {g[tl].mean():+.2e} (twin grad should be more positive); "
          f"|g| finite frac {np.isfinite(g).mean():.3f}", flush=True)

S1 = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
S2 = int(sys.argv[2]) if len(sys.argv) > 2 else 600
CONF_LR = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-4
S1_STATE = os.environ.get("CONF_GATE_S1_STATE", "/tmp/conf_gate_s1.pkl")
print(f"config: S1={S1} S2={S2} conf_lr={CONF_LR} n_decoy_poses={N_DECOY}", flush=True)
t0 = time.time()
import pickle
if os.environ.get("CONF_GATE_RESUME_S1") == "1" and os.path.exists(S1_STATE):
    with open(S1_STATE, "rb") as f:
        st = pickle.load(f)
    params, bstats = st["params"], st["batch_stats"]
    print(f"resumed stage-1 state from {S1_STATE}", flush=True)
    diag(matcher, params, bstats, "  s1(resumed)")
else:
    for s in range(S1):
        b = build_set(MB)
        params, bstats, opt_state, l = step1(params, bstats, opt_state, b[1], b[2], b[0], b[3], b[4])
        if (s+1) % 250 == 0:
            print(f"s1 {s+1}: loss {float(l):.1f} ({time.time()-t0:.0f}s)", flush=True)
            diag(matcher, params, bstats, f"  s1@{s+1}")
    with open(S1_STATE, "wb") as f:
        pickle.dump(jax.device_get({"params": params, "batch_stats": bstats}), f)

grad_probe("post-s1")

matcher2 = MultiViewMatcher(MatcherConfig(gnn_layers=default_gnn_layers(3,1),
    sinkhorn_iterations=30, conf_mlp=True, match_threshold=0.0))
m2 = matcher2.init(key, ev[1][:1], ev[2][:1], ev[0][:1], jnp.full((1,V,2), float(H)))
params2, missing, _ = _graft(m2["params"], params)
bstats2, _, _ = _graft(m2["batch_stats"], bstats)
tx2 = build_optimizer(1e-5, 1.0, 0, 0, pose_loss=True, conf_mlp_lr=CONF_LR)
opt2 = tx2.init(params2)

@jax.jit
def step2(params, bstats, opt_state, ratio, bk, bs_, bd, bgi, bgw, bintr, bposes):
    def loss_fn(p):
        out, upd = matcher2.apply({"params": p, "batch_stats": bstats}, bk, bs_,
            bd, mb_size, train=True, full_output=True, mutable=["batch_stats"])
        losses = matcher_losses(out, bgi[:,None], bgw[:,None], bk, bintr, bposes, pose_loss=True)
        tot, sc = combine_losses(losses, 1, ratio, 1597., 270.)
        return tot, (upd["batch_stats"], sc)
    (l,(nbs,sc)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    u, opt_state = tx2.update(g, opt_state, params)
    return optax.apply_updates(params, u), nbs, opt_state, l, sc

for s in range(S2):
    b = build_set(MB)
    # short warmup then constant 0.8: matching is already converged when the
    # gate's stage 2 starts, so the long reference ramp only starves the conf
    # head of pose-loss gradient
    ratio = RATIO_CAP * min(1., s / max(1, S2 // 10))
    bintr = jnp.tile(b[6][:,None], (1, V, 1, 1))
    params2, bstats2, opt2, l, sc = step2(params2, bstats2, opt2, ratio,
        b[1], b[2], b[0], b[3], b[4], bintr, b[7])
    if (s+1) % 200 == 0:
        try:
            skipped = int(opt2.skipped)
        except Exception:
            skipped = -1
        print(f"s2 {s+1}: total {float(l):.1f} rot {float(sc['rot_loss']):.3f} "
              f"skipped {skipped}", flush=True)
        diag(matcher2, params2, bstats2, f"  s2@{s+1}", with_conf=True)
grad_probe("post-s2", matcher2, params2, bstats2)
with open("/tmp/conf_gate_state.pkl", "wb") as f:
    pickle.dump(jax.device_get({"params": params2, "batch_stats": bstats2}), f)
print("done (state -> /tmp/conf_gate_state.pkl)", flush=True)
