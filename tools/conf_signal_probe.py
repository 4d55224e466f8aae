"""No-training probe of the conf-head learning signal vs outlier rate.

For each (N_TRUE, N_OUT, n_decoy_poses) it builds decoy-twin cases, PLANTS the
matches (true pairs + twin pairs -- what a converged stage-1 matcher produces,
round-3 measured twin_matched ~0.7-0.9), and reports at uniform conf=0.5:
  - pose AUC with uniform weights (the score-weighting stand-in),
  - pose AUC with oracle conf (the ceiling the conf head could reach),
  - mean d(pose_loss)/d(conf) on twins vs true points (the actual gradient the
    conf head trains on -- informative iff twins' grad is more positive).

Round-3 context: at 33% systematic outliers the w8pt solve is garbage and the
gradient does not separate (twins -5.4e-4 vs true -5.0e-4) -- first-order
training cannot find the oracle minimum from there. The reference's real-data
regime has low outlier rates where the near-correct solve makes the gradient
residual-driven. This probe finds the fixture regime where the signal exists.

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python tools/conf_signal_probe.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from e2e_multi_view_matching_tpu.data.synthetic import SphereFieldScene  # noqa: E402
from e2e_multi_view_matching_tpu.geom.eightpoint import (  # noqa: E402
    estimate_relative_pose_w8pt)
from e2e_multi_view_matching_tpu.geom.metrics import (  # noqa: E402
    pose_auc, pose_error_max, rotation_angle_error, translation_angle_error)

H, W, F, K = 192, 256, 260.0, 96
NOISE_PX = 0.4
N_CASES = 48


def build(rng, n_true, n_out, n_decoy):
    scene = SphereFieldScene(rng, n_views=2, H=H, W=W, f=F, baseline=0.9,
                             rot_jitter=0.1)
    pix0, pix1 = scene.correspondences(0, 1, n_true, rng, margin=12)
    dp0s, dp1s = [], []
    per = -(-n_out // max(n_decoy, 1))
    for _ in range(n_decoy):
        d = SphereFieldScene(rng, n_views=2, H=H, W=W, f=F, baseline=0.9,
                             rot_jitter=0.1)
        d0, d1 = d.correspondences(0, 1, per, rng, margin=12)
        dp0s.append(d0)
        dp1s.append(d1)
    dp0 = np.concatenate(dp0s)[:n_out] if n_out else np.zeros((0, 2))
    dp1 = np.concatenate(dp1s)[:n_out] if n_out else np.zeros((0, 2))
    nv, no = len(pix0), len(dp0)
    k0 = np.zeros((K, 2), np.float32)
    k1 = np.zeros((K, 2), np.float32)
    m0 = np.full(K, -1, np.int64)
    outm = np.zeros(K, bool)
    perm0, perm1 = rng.permutation(K), rng.permutation(K)
    s0t, s1t = perm0[:nv], perm1[:nv]
    s0o, s1o = perm0[nv:nv + no], perm1[nv:nv + no]
    k0[s0t] = pix0 + rng.normal(size=pix0.shape) * NOISE_PX
    k1[s1t] = pix1 + rng.normal(size=pix1.shape) * NOISE_PX
    k0[s0o] = dp0 + rng.normal(size=dp0.shape) * NOISE_PX
    k1[s1o] = dp1 + rng.normal(size=dp1.shape) * NOISE_PX
    r0, r1 = perm0[nv + no:], perm1[nv + no:]
    k0[r0] = rng.uniform([10, 10], [W - 10, H - 10], (len(r0), 2))
    k1[r1] = rng.uniform([10, 10], [W - 10, H - 10], (len(r1), 2))
    m0[s0t] = s1t
    m0[s0o] = s1o  # twins ARE matched (converged stage-1 behavior)
    outm[s0o] = True
    truem = np.zeros(K, bool)
    truem[s0t] = True
    return (k0, k1, m0, outm, truem, scene.relative_pose(0, 1),
            scene.intr[0].astype(np.float32))


def probe(n_true, n_out, n_decoy, seed=0):
    rng = np.random.default_rng(seed)
    cases = [build(rng, n_true, n_out, n_decoy) for _ in range(N_CASES)]
    k0 = jnp.asarray(np.stack([c[0] for c in cases]))
    k1 = jnp.asarray(np.stack([c[1] for c in cases]))
    m0 = jnp.asarray(np.stack([c[2] for c in cases]))
    outm = np.stack([c[3] for c in cases])
    truem = np.stack([c[4] for c in cases])
    T_gt = jnp.asarray(np.stack([c[5] for c in cases]))
    intr = jnp.asarray(np.stack([c[6] for c in cases]))
    gather = jnp.clip(m0, 0, K - 1)
    k1m = jnp.take_along_axis(k1, gather[..., None], axis=1)

    def aucs(conf):
        conf = jnp.where(m0 >= 0, conf, 0.0)
        T, info = estimate_relative_pose_w8pt(k0, k1m, intr, intr, conf,
                                              determine_inliers=True)
        errs = np.asarray(pose_error_max(T_gt, T, degrees=True))
        errs = np.where(np.asarray(info.valid), errs, np.inf)
        return [round(a * 100, 1) for a in pose_auc(errs, [5, 10, 20])]

    def loss_of_conf(conf):
        conf = jnp.where(m0 >= 0, conf, 0.0)
        T, _ = estimate_relative_pose_w8pt(k0, k1m, intr, intr, conf,
                                           choose_closest=True, target_T021=T_gt)
        return rotation_angle_error(T, T_gt) + translation_angle_error(T, T_gt)

    uni = jnp.full((N_CASES, K), 0.5, jnp.float32)
    g = np.asarray(jax.grad(loss_of_conf)(uni))
    frac = n_out / (n_true + n_out)
    print(f"true={n_true:3d} out={n_out:3d} ({frac * 100:4.1f}%) decoys={n_decoy}: "
          f"uniform AUC {aucs(uni)}  oracle AUC {aucs(jnp.asarray(truem, jnp.float32))}  "
          f"grad twins {g[outm].mean():+8.2e} true {g[truem].mean():+8.2e} "
          f"sep {'YES' if g[outm].mean() > 4 * abs(g[truem].mean()) else 'no '}",
          flush=True)


if __name__ == "__main__":
    for (nt, no, nd) in [(40, 20, 1), (40, 20, 4), (48, 12, 3), (52, 8, 2),
                         (54, 6, 3), (56, 4, 2), (58, 2, 2), (50, 10, 10)]:
        probe(nt, no, nd)
