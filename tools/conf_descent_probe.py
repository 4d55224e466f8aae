"""Direct-descent probe: can the pose loss ALONE separate decoy twins?

Bypasses the conf MLP entirely: treats the per-point confidence VALUES as free
parameters and runs Adam on d(pose_loss)/d(conf) for the decoy-twin fixture's
planted matches. If the optimum separates twins from true points, the loss
landscape is sound and a slow/underpowered conf-head optimizer is the
bottleneck; if it does not, no amount of conf-MLP training can pass the gate
and the fixture (or loss) must change.

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python tools/conf_descent_probe.py [steps] [lr]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from conf_signal_probe import build, H, W, F, K, N_CASES  # noqa: E402
from e2e_multi_view_matching_tpu.geom.eightpoint import (  # noqa: E402
    estimate_relative_pose_w8pt)
from e2e_multi_view_matching_tpu.geom.metrics import (  # noqa: E402
    pose_auc, pose_error_max, rotation_angle_error, translation_angle_error)

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 800
LR = float(sys.argv[2]) if len(sys.argv) > 2 else 5e-2
N_TRUE, N_OUT, N_DECOY = 48, 12, 3

rng = np.random.default_rng(0)
cases = [build(rng, N_TRUE, N_OUT, N_DECOY) for _ in range(N_CASES)]
k0 = jnp.asarray(np.stack([c[0] for c in cases]))
k1 = jnp.asarray(np.stack([c[1] for c in cases]))
m0 = jnp.asarray(np.stack([c[2] for c in cases]))
outm = np.stack([c[3] for c in cases])
truem = np.stack([c[4] for c in cases])
T_gt = jnp.asarray(np.stack([c[5] for c in cases]))
intr = jnp.asarray(np.stack([c[6] for c in cases]))
gather = jnp.clip(m0, 0, K - 1)
k1m = jnp.take_along_axis(k1, gather[..., None], axis=1)
matched = np.asarray(m0) >= 0


def loss_of_logit(logit):
    conf = jax.nn.sigmoid(logit)
    conf = jnp.where(m0 >= 0, conf, 0.0)
    T, _ = estimate_relative_pose_w8pt(k0, k1m, intr, intr, conf,
                                       choose_closest=True, target_T021=T_gt)
    # mean over cases (each case contributes equally, like the training loss)
    return jnp.mean(rotation_angle_error(T, T_gt) + translation_angle_error(T, T_gt))


def aucs(conf):
    conf = jnp.where(m0 >= 0, conf, 0.0)
    T, info = estimate_relative_pose_w8pt(k0, k1m, intr, intr, conf,
                                          determine_inliers=True)
    errs = np.asarray(pose_error_max(T_gt, T, degrees=True))
    errs = np.where(np.asarray(info.valid), errs, np.inf)
    return [round(a * 100, 1) for a in pose_auc(errs, [5, 10, 20])]


tx = optax.adam(LR)
logit = jnp.zeros((N_CASES, K))
opt = tx.init(logit)
step = jax.jit(lambda lg, op: (lambda g: (lambda u, no: (optax.apply_updates(lg, u), no))(
    *tx.update(g, op, lg)))(jax.grad(loss_of_logit)(lg)))

print(f"steps={STEPS} lr={LR}; start loss {float(loss_of_logit(logit)):.4f} "
      f"uniform AUC {aucs(jax.nn.sigmoid(logit))} "
      f"oracle AUC {aucs(jnp.asarray(truem, jnp.float32))}", flush=True)
for s in range(STEPS):
    logit, opt = step(logit, opt)
    if (s + 1) % 200 == 0:
        conf = np.asarray(jax.nn.sigmoid(logit))
        tw = conf[outm & matched].mean()
        tr = conf[truem & matched].mean()
        print(f"step {s+1}: loss {float(loss_of_logit(logit)):.4f} "
              f"conf twins {tw:.3f} true {tr:.3f} ratio {tw / max(tr, 1e-9):.2f} "
              f"conf-w AUC {aucs(jnp.asarray(conf))}", flush=True)
