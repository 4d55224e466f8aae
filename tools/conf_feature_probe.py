"""Linear-separability probe of the conf head's INPUT features.

The conf head consumes post-GNN descriptors (mdesc_i, matched mdesc_j, match
score). The decoy-twin fixture marks twins in the RAW descriptors (boosted
marker channels); if the GNN does not carry that mark through to mdesc, no
conf-head optimizer can separate twins, and the fix is a feature (skip raw
descriptors into the head), not more training.

Fits a ridge-regularized logistic regression twin-vs-true on:
  (a) the conf head's actual input [mdesc_i, mdesc_j_matched, score]
  (b) raw input descriptors [desc_i, desc_j_matched]
and reports holdout AUC of each.

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python tools/conf_feature_probe.py
"""
import os
import pickle
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("CONF_GATE_NO_TRAIN", "1")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from e2e_multi_view_matching_tpu.data.synthetic import SphereFieldScene  # noqa: E402
from e2e_multi_view_matching_tpu.models.matcher import (  # noqa: E402
    MatcherConfig, MultiViewMatcher, default_gnn_layers)

# rebuild the conf_gate fixture inline (same params as conf_gate_debug defaults)
import importlib.util  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "cgd_fixture", "/root/repo/tools/conf_gate_debug.py")


def build_eval(n, seed=7):
    # identical construction to conf_gate_debug.build_set but local-rng
    rng = np.random.default_rng(seed)
    sys.argv = [sys.argv[0]]  # defaults
    import conf_gate_fixture_stub  # noqa: F401  (never exists; fallthrough)


# Instead of importing the training script (it trains on import), replicate
# the case builder via conf_signal_probe.build, which plants matches directly
# -- here we need descriptors too, so inline the relevant parts.
V, K, H, W, F = 2, 96, 192, 256, 260.0
N_TRUE, N_OUT, N_DECOY = 48, 12, 3
DESC_NOISE, MARKER, NOISE_PX, D = 0.2, 32, 0.4, 256


def build_case(rng):
    scene = SphereFieldScene(rng, n_views=V, H=H, W=W, f=F, baseline=0.9,
                             rot_jitter=0.1)
    pix0, pix1 = scene.correspondences(0, 1, N_TRUE, rng, margin=12)
    dp0s, dp1s = [], []
    per = -(-N_OUT // N_DECOY)
    for _ in range(N_DECOY):
        decoy = SphereFieldScene(rng, n_views=2, H=H, W=W, f=F, baseline=0.9,
                                 rot_jitter=0.1)
        d0, d1 = decoy.correspondences(0, 1, per, rng, margin=12)
        dp0s.append(d0)
        dp1s.append(d1)
    dp0 = np.concatenate(dp0s)[:N_OUT]
    dp1 = np.concatenate(dp1s)[:N_OUT]
    n_vis, n_out = len(pix0), len(dp0)
    kpts = np.zeros((V, K, 2), np.float32)
    descs = np.zeros((V, K, D), np.float32)
    out_mask0 = np.zeros(K, bool)
    true_mask0 = np.zeros(K, bool)
    perm0, perm1 = rng.permutation(K), rng.permutation(K)
    s0t, s1t = perm0[:n_vis], perm1[:n_vis]
    s0o, s1o = perm0[n_vis:n_vis + n_out], perm1[n_vis:n_vis + n_out]
    r0, r1 = perm0[n_vis + n_out:], perm1[n_vis + n_out:]
    kpts[0, s0t] = pix0 + rng.normal(size=pix0.shape) * NOISE_PX
    kpts[1, s1t] = pix1 + rng.normal(size=pix1.shape) * NOISE_PX
    base = rng.normal(size=(n_vis, D)).astype(np.float32)
    descs[0, s0t] = base + rng.normal(size=(n_vis, D)) * DESC_NOISE
    descs[1, s1t] = base + rng.normal(size=(n_vis, D)) * DESC_NOISE
    kpts[0, s0o] = dp0 + rng.normal(size=dp0.shape) * NOISE_PX
    kpts[1, s1o] = dp1 + rng.normal(size=dp1.shape) * NOISE_PX
    bo = rng.normal(size=(n_out, D)).astype(np.float32)
    # keep in sync with conf_gate_debug.build_case (mean-offset marker)
    bo[:, -MARKER:] = bo[:, -MARKER:] * 0.5 + 1.2
    descs[0, s0o] = bo + rng.normal(size=(n_out, D)) * 0.1
    descs[1, s1o] = bo + rng.normal(size=(n_out, D)) * 0.1
    out_mask0[s0o] = True
    true_mask0[s0t] = True
    kpts[0, r0] = rng.uniform([10, 10], [W - 10, H - 10], (len(r0), 2))
    kpts[1, r1] = rng.uniform([10, 10], [W - 10, H - 10], (len(r1), 2))
    descs[0, r0] = rng.normal(size=(len(r0), D))
    descs[1, r1] = rng.normal(size=(len(r1), D))
    descs /= np.linalg.norm(descs, axis=-1, keepdims=True)
    kpts[..., 0] = np.clip(kpts[..., 0], 0, W - 1)
    kpts[..., 1] = np.clip(kpts[..., 1], 0, H - 1)
    scores = np.full((V, K), 0.5, np.float32)
    return kpts, scores, descs, out_mask0, true_mask0


N_CASES = 64
rng = np.random.default_rng(11)
cases = [build_case(rng) for _ in range(N_CASES)]
kpts = jnp.asarray(np.stack([c[0] for c in cases]))
scores = jnp.asarray(np.stack([c[1] for c in cases]))
descs = jnp.asarray(np.stack([c[2] for c in cases]))
outm = np.stack([c[3] for c in cases])
truem = np.stack([c[4] for c in cases])
size = jnp.full((N_CASES, V, 2), 0.0).at[..., 0].set(H).at[..., 1].set(W)

with open("/tmp/conf_gate_s1.pkl", "rb") as f:
    st = pickle.load(f)
matcher = MultiViewMatcher(MatcherConfig(
    gnn_layers=default_gnn_layers(3, 1), sinkhorn_iterations=30,
    conf_mlp=False, match_threshold=0.0))
out, inter = matcher.apply(
    {"params": st["params"], "batch_stats": st["batch_stats"]},
    kpts, scores, descs, size,
    capture_intermediates=lambda mdl, name: name == "__call__",
    mutable=["intermediates"],
)
# final_proj output: (B, V*K, D) -> (B, V, K, D)
fp = inter["intermediates"]["final_proj"]["__call__"][0]
mdesc = np.asarray(fp).reshape(N_CASES, V, K, 256)
m0 = np.asarray(out["matches0"][:, 0])  # (B, K)
ms0 = np.asarray(out["matching_scores0"][:, 0])
matched = m0 >= 0
lab_t = truem & matched
lab_o = outm & matched
print(f"matched twins {lab_o.sum()} true {lab_t.sum()} "
      f"(twin matched frac {matched[outm].mean():.2f})", flush=True)

gather = np.clip(m0, 0, K - 1)
mdesc_j = np.take_along_axis(mdesc[:, 1], gather[..., None], axis=1)
raw_j = np.take_along_axis(np.asarray(descs)[:, 1], gather[..., None], axis=1)


def logistic_auc(X, y, split=0.7, l2=1e-2, iters=400, lr=0.5):
    n = len(y)
    idx = np.random.default_rng(0).permutation(n)
    k = int(n * split)
    tr, te = idx[:k], idx[k:]
    mu, sd = X[tr].mean(0), X[tr].std(0) + 1e-6
    Xn = (X - mu) / sd
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(iters):
        z = Xn[tr] @ w + b
        p = 1 / (1 + np.exp(-z))
        g = Xn[tr].T @ (p - y[tr]) / k + l2 * w
        gb = (p - y[tr]).mean()
        w -= lr * g
        b -= lr * gb
    s = Xn[te] @ w + b
    # ROC AUC via rank statistic
    pos, neg = s[y[te] == 1], s[y[te] == 0]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    return (pos[:, None] > neg[None, :]).mean()


sel = lab_t | lab_o
y = lab_o[sel].astype(np.float64)
X_head = np.concatenate(
    [mdesc[:, 0], mdesc_j, ms0[..., None]], axis=-1)[sel]
X_raw = np.concatenate([np.asarray(descs)[:, 0], raw_j], axis=-1)[sel]
print(f"conf-head input (post-GNN) twin-vs-true holdout AUC: "
      f"{logistic_auc(X_head, y):.3f}", flush=True)
print(f"raw descriptor twin-vs-true holdout AUC: "
      f"{logistic_auc(X_raw, y):.3f}", flush=True)
