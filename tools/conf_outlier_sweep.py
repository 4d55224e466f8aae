"""Conf-vs-score weighting margin across outlier rates (VERDICT r3 item 7).

The decoy-twin gate (tools/conf_gate_debug.py) is the hard assertion: it makes
score weighting fail BY CONSTRUCTION (twins are pose-consistent with decoys),
so its margin says nothing about where conf weighting starts paying on
ordinary contamination. This sweep measures the reference's actual claim
(`/root/reference/docs/index.html:173-174`: conf-weighted differentiable pose
beats matching-score weighting) as a CURVE:

- Fixture: non-decoy noise -- outlier pairs share a descriptor signature
  (mean-offset marker, the linearly-readable analog of repeating texture /
  reflections) and similar descriptors so Sinkhorn matches them, but sit at
  RANDOM positions (geometrically inconsistent with every pose, unlike the
  decoy gate's adversarial twins).
- Train once on a mixed stream (outlier fraction ~ U(0.1, 0.5), twin
  descriptor noise ~ U(0.1, 0.5)): stage 1 (match loss) then stage 2 (blended
  pose loss through w8pt, conf head grafted, hot conf LR -- same recipe as
  the passing gate).
- Evaluate a (rate x twin-noise) GRID: rates {10, 30, 50}% x twin noise
  {0.1, 0.3, 0.5}, plus the original rate curve at twin noise 0.1. Twin
  noise controls how score-separable the outliers are: at 0.1 the twins
  match at ~0.96 and matching scores cannot reject them (score AUC pinned
  ~0, the adversarial end); at 0.5 the twins match with visibly lower
  Sinkhorn scores, so score weighting partially self-rejects them -- the
  margin at that end is the honest "conf vs a score baseline that is
  actually trying" number the round-3 verdict asked for.
- AUC@5/10/20 with score weighting vs conf weighting vs the oracle (1 on
  true points), on the SAME matches, 24 fresh scenes per cell.

Committed result (2000+2000 steps, ~35 min CPU): at twin noise 0.1,
score-weighted AUC = 0 at every rate while conf-weighted AUC@20 = 63.9 ->
49.6 (oracle 75-85); the grid shows the margin shrinking as twins weaken
but staying positive everywhere (see conf_outlier_sweep_result.json
"grid"). At 1200+1500 steps stage 1 is NOT converged and every weighting
reads ~0 -- do not shorten the run.

Writes tools/conf_outlier_sweep_result.json (indexed in tools/RESULTS.md).

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python tools/conf_outlier_sweep.py [S1] [S2]
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_platforms", "cpu")

from e2e_multi_view_matching_tpu.data.synthetic import SphereFieldScene
from e2e_multi_view_matching_tpu.geom.eightpoint import estimate_relative_pose_w8pt
from e2e_multi_view_matching_tpu.geom.metrics import pose_auc, pose_error_max
from e2e_multi_view_matching_tpu.models.matcher import (
    MatcherConfig, MultiViewMatcher, default_gnn_layers)
from e2e_multi_view_matching_tpu.train.checkpoint import _graft
from e2e_multi_view_matching_tpu.train.losses import (
    combine_losses, match_loss_of_pair, matcher_losses)
from e2e_multi_view_matching_tpu.train.optim import build_optimizer

rng = np.random.default_rng(2)
V, K, H, W, F = 2, 96, 192, 256, 260.0
D, MARKER, NOISE_PX, DESC_NOISE = 256, 32, 0.4, 0.2
N_MATCHED = 60  # matched population per case; out_rate splits it
MB, N_EVAL = 8, 24
key = jax.random.PRNGKey(0)


def build_case(scene, rng, out_rate, twin_noise=0.1):
    """One two-view case with `out_rate` of the matched population outliers.

    Outliers: descriptor twins (matched by Sinkhorn) at random positions
    (non-decoy noise -- no consistent wrong pose). `twin_noise` sets how
    similar the twin descriptors are (0.1: near-identical, scores cannot
    reject; 0.5: weak twins, Sinkhorn scores partially reject them)."""
    n_out = int(round(N_MATCHED * out_rate))
    n_vis = N_MATCHED - n_out
    pix0, pix1 = scene.correspondences(0, 1, n_vis, rng, margin=12)
    n_vis = len(pix0)  # visibility can return fewer than requested
    kpts = np.zeros((V, K, 2), np.float32)
    descs = np.zeros((V, K, D), np.float32)
    gt = np.full((2, K + 1), -1, np.int64)
    out_mask0 = np.zeros(K, bool)
    perm0, perm1 = rng.permutation(K), rng.permutation(K)
    s0t, s1t = perm0[:n_vis], perm1[:n_vis]
    s0o, s1o = perm0[n_vis:n_vis + n_out], perm1[n_vis:n_vis + n_out]
    r0, r1 = perm0[n_vis + n_out:], perm1[n_vis + n_out:]
    kpts[0, s0t] = pix0 + rng.normal(size=pix0.shape) * NOISE_PX
    kpts[1, s1t] = pix1 + rng.normal(size=pix1.shape) * NOISE_PX
    base = rng.normal(size=(n_vis, D)).astype(np.float32)
    descs[0, s0t] = base + rng.normal(size=(n_vis, D)) * DESC_NOISE
    descs[1, s1t] = base + rng.normal(size=(n_vis, D)) * DESC_NOISE
    gt[0, s0t] = s1t
    gt[1, s1t] = s0t
    bo = rng.normal(size=(n_out, D)).astype(np.float32)
    bo[:, -MARKER:] = bo[:, -MARKER:] * 0.5 + 1.2  # systematic signature
    descs[0, s0o] = bo + rng.normal(size=(n_out, D)) * twin_noise
    descs[1, s1o] = bo + rng.normal(size=(n_out, D)) * twin_noise
    # random positions: inconsistent with ANY single pose
    kpts[0, s0o] = rng.uniform([12, 12], [W - 12, H - 12], (n_out, 2))
    kpts[1, s1o] = rng.uniform([12, 12], [W - 12, H - 12], (n_out, 2))
    out_mask0[s0o] = True
    kpts[0, r0] = rng.uniform([10, 10], [W - 10, H - 10], (len(r0), 2))
    kpts[1, r1] = rng.uniform([10, 10], [W - 10, H - 10], (len(r1), 2))
    descs[0, r0] = rng.normal(size=(len(r0), D))
    descs[1, r1] = rng.normal(size=(len(r1), D))
    descs /= np.linalg.norm(descs, axis=-1, keepdims=True)
    kpts[..., 0] = np.clip(kpts[..., 0], 0, W - 1)
    kpts[..., 1] = np.clip(kpts[..., 1], 0, H - 1)
    weights = np.zeros((2, K + 1), np.float32)
    for r, so in ((0, s0o), (1, s1o)):
        mfrac = min(max(n_vis / max(K - n_out, 1), 1e-3), 0.999)
        weights[r] = np.where(gt[r] >= 0, .5 / mfrac, .5 / (1 - mfrac))
        weights[r, so] = 0.0
    return (descs, kpts, np.full((V, K), .5, np.float32), gt, weights,
            scene.relative_pose(0, 1), scene.intr[0].astype(np.float32),
            np.stack([scene.poses[0], scene.poses[1]]).astype(np.float32),
            out_mask0)


def build_set(n, rate_fn, twin_fn=lambda: 0.1):
    cases = [build_case(
        SphereFieldScene(rng, n_views=V, H=H, W=W, f=F, baseline=0.9,
                         rot_jitter=0.1), rng, rate_fn(), twin_fn())
        for _ in range(n)]
    st = lambda i: jnp.asarray(np.stack([c[i] for c in cases]))
    return tuple(st(i) for i in range(9))


mb_size = jnp.full((MB, V, 2), 0.).at[..., 0].set(H).at[..., 1].set(W)
GNN = default_gnn_layers(3, 1)
matcher = MultiViewMatcher(MatcherConfig(
    gnn_layers=GNN, sinkhorn_iterations=30, conf_mlp=False, match_threshold=0.0))
probe = build_set(1, lambda: 0.3)
mv = matcher.init(key, probe[1][:1], probe[2][:1], probe[0][:1],
                  jnp.full((1, V, 2), float(H)))
params, bstats = mv["params"], mv["batch_stats"]
tx = build_optimizer(3e-4, 1.0, 0, 0, pose_loss=False)
opt_state = tx.init(params)


@jax.jit
def step1(params, bstats, opt_state, bk, bs_, bd, bgi, bgw):
    def loss_fn(p):
        out, upd = matcher.apply(
            {"params": p, "batch_stats": bstats}, bk, bs_, bd, mb_size,
            train=True, full_output=False, mutable=["batch_stats"])
        return match_loss_of_pair(out["log_assignment"][:, 0], bgi, bgw), \
            upd["batch_stats"]

    (l, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    u, opt_state = tx.update(g, opt_state, params)
    return optax.apply_updates(params, u), nbs, opt_state, l


# 2000+2000 is the committed-result recipe: at 1200+1500 stage 1 has not
# converged (loss still descending at s1@1200) and every weighting reads ~0.
S1 = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
S2 = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
train_rate = lambda: float(rng.uniform(0.1, 0.5))
train_twin = lambda: float(rng.uniform(0.1, 0.5))
t0 = time.time()
for s in range(S1):
    b = build_set(MB, train_rate, train_twin)
    params, bstats, opt_state, l = step1(params, bstats, opt_state,
                                         b[1], b[2], b[0], b[3], b[4])
    if (s + 1) % 300 == 0:
        print(f"s1 {s+1}: loss {float(l):.1f} ({time.time()-t0:.0f}s)",
              flush=True)

matcher2 = MultiViewMatcher(MatcherConfig(
    gnn_layers=GNN, sinkhorn_iterations=30, conf_mlp=True, match_threshold=0.0))
m2 = matcher2.init(key, probe[1][:1], probe[2][:1], probe[0][:1],
                   jnp.full((1, V, 2), float(H)))
params2, _, _ = _graft(m2["params"], params)
bstats2, _, _ = _graft(m2["batch_stats"], bstats)
tx2 = build_optimizer(1e-5, 1.0, 0, 0, pose_loss=True, conf_mlp_lr=1e-3)
opt2 = tx2.init(params2)


@jax.jit
def step2(params, bstats, opt_state, ratio, bk, bs_, bd, bgi, bgw, bintr, bposes):
    def loss_fn(p):
        out, upd = matcher2.apply(
            {"params": p, "batch_stats": bstats}, bk, bs_, bd, mb_size,
            train=True, full_output=True, mutable=["batch_stats"])
        losses = matcher_losses(out, bgi[:, None], bgw[:, None], bk, bintr,
                                bposes, pose_loss=True)
        tot, sc = combine_losses(losses, 1, ratio, 1597., 270.)
        return tot, upd["batch_stats"]

    (l, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    u, opt_state = tx2.update(g, opt_state, params)
    return optax.apply_updates(params, u), nbs, opt_state, l


for s in range(S2):
    b = build_set(MB, train_rate, train_twin)
    ratio = 0.8 * min(1., s / max(1, S2 // 10))
    bintr = jnp.tile(b[6][:, None], (1, V, 1, 1))
    params2, bstats2, opt2, l = step2(params2, bstats2, opt2, ratio,
                                      b[1], b[2], b[0], b[3], b[4], bintr, b[7])
    if (s + 1) % 300 == 0:
        print(f"s2 {s+1}: loss {float(l):.1f} ({time.time()-t0:.0f}s)",
              flush=True)


def eval_rate(rate, twin_noise=0.1):
    ev = build_set(N_EVAL, lambda: rate, lambda: twin_noise)
    e_size = jnp.full((N_EVAL, V, 2), 0.).at[..., 0].set(H).at[..., 1].set(W)
    out = matcher2.apply({"params": params2, "batch_stats": bstats2},
                         ev[1], ev[2], ev[0], e_size)
    m0 = out["matches0"][:, 0]
    gather = jnp.clip(m0, 0, K - 1)
    k1 = jnp.take_along_axis(ev[1][:, 1], gather[..., None], axis=1)

    def auc_w(conf):
        conf = jnp.where(m0 >= 0, conf, 0.)
        T, info = estimate_relative_pose_w8pt(ev[1][:, 0], k1, ev[6], ev[6],
                                              conf, determine_inliers=True)
        errs = np.asarray(pose_error_max(ev[5], T, degrees=True))
        errs = np.where(np.asarray(info.valid), errs, np.inf)
        return [round(a * 100, 1) for a in pose_auc(errs, [5, 10, 20])]

    m0n = np.asarray(m0)
    outm = np.asarray(ev[8])
    gt0 = np.asarray(ev[3][:, 0, :-1])
    true_lab = gt0 >= 0
    oracle = jnp.asarray((~outm) & true_lab, jnp.float32)
    conf = np.asarray(out["conf_scores"][:, 0])
    mm = m0n >= 0
    correct = mm & (m0n == gt0)
    return {
        "outlier_rate": rate,
        "twin_noise": twin_noise,
        "outlier_matched_frac": round(float(mm[outm].mean()), 3),
        "true_matched_frac": round(float(mm[true_lab].mean()), 3),
        "true_correct_frac": round(float(correct[true_lab].mean()), 3),
        "correct_per_case": round(float(correct.sum(1).mean()), 1),
        "score_w_auc": auc_w(out["matching_scores0"][:, 0]),
        "conf_w_auc": auc_w(out["conf_scores"][:, 0]),
        "oracle_w_auc": auc_w(oracle),
        "oracle_corr_auc": auc_w(jnp.asarray(correct, jnp.float32)),
        "conf_on_outliers": round(float(conf[mm & outm].mean()), 3)
        if (mm & outm).any() else None,
        "conf_on_true": round(float(conf[mm & true_lab].mean()), 3),
    }


def show(row):
    margin = [round(c - s, 1) for c, s in zip(row["conf_w_auc"],
                                              row["score_w_auc"])]
    print(f"rate {row['outlier_rate']:.1f} tn {row['twin_noise']:.1f}: "
          f"score {row['score_w_auc']} "
          f"conf {row['conf_w_auc']} (margin {margin}) "
          f"oracle {row['oracle_w_auc']} corr {row['oracle_corr_auc']} "
          f"match t/c/o {row['true_matched_frac']}/{row['true_correct_frac']}"
          f"/{row['outlier_matched_frac']} "
          f"conf out/true {row['conf_on_outliers']}/{row['conf_on_true']}",
          flush=True)


curve = [eval_rate(r) for r in (0.1, 0.2, 0.3, 0.4, 0.5)]
for row in curve:
    show(row)
# the de-rigged grid: weaker twins let matching scores partially reject the
# outliers themselves, so the score baseline is no longer 0 by construction
grid = [eval_rate(r, tn) for tn in (0.3, 0.5) for r in (0.1, 0.3, 0.5)]
for row in grid:
    show(row)

result = {
    "fixture": "non-decoy noise: marker-descriptor twins at random positions",
    "train": {"S1": S1, "S2": S2, "mixed_rate": "U(0.1, 0.5)",
              "mixed_twin_noise": "U(0.1, 0.5)",
              "conf_lr": 1e-3, "time_s": round(time.time() - t0, 1)},
    "curve": curve,
    "grid": grid,
}
out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "conf_outlier_sweep_result.json")
with open(out_path, "w") as f:
    json.dump(result, f, indent=2)
print(f"wrote {out_path}")
