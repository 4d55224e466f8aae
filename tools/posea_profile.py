"""Pose-pipeline stage-A sub-profile on the chip: where do the ~296 ms per
8-tuple batch go inside `robust_relative_poses` (3x IRLS w8pt + 10-iteration
two-view LM BA over B*P=80 pairs x K=1024 match slots)?

Run: timeout 2400 python tools/posea_profile.py
"""

import os
import sys
import time

import numpy as np

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("_EMVM_PAP_REEXEC") != "1"
):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1", _EMVM_PAP_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2e_multi_view_matching_tpu.geom.eightpoint import (  # noqa: E402
    estimate_relative_pose_w8pt)
from e2e_multi_view_matching_tpu.geom.epipolar import (  # noqa: E402
    normalize_keypoints)
from e2e_multi_view_matching_tpu.mvba.pipeline import (  # noqa: E402
    robust_relative_poses)
from e2e_multi_view_matching_tpu.pose.two_view_ba import (  # noqa: E402
    bundle_adjust_two_view)

BP, K = 80, 1024
rng = np.random.default_rng(0)


def timed(label, fn, *args, n=6, static=()):
    jfn = jax.jit(lambda *a: sum(
        jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(fn(*a))
        if hasattr(l, "astype")))
    jfn(*args)
    float(np.asarray(jfn(*args)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args)))
        ts.append(time.perf_counter() - t0)
    print(f"{label:52s} {min(ts) * 1e3:8.1f} ms", flush=True)
    return min(ts)


# synthetic pairs: true pose + projected points + noise + 20% outliers
def make_pair(r):
    a = r.normal(size=3) * 0.25
    th = np.linalg.norm(a) + 1e-9
    k = a / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
    t = r.normal(size=3)
    t /= np.linalg.norm(t)
    X = r.uniform(-2, 2, size=(K, 3))
    X[:, 2] += 6
    x0 = X[:, :2] / X[:, 2:]
    Xc = X @ R.T + t
    x1 = Xc[:, :2] / Xc[:, 2:]
    f, cx, cy = 500.0, 320.0, 240.0
    intr = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float32)
    p0 = x0 * f + [cx, cy] + r.normal(size=(K, 2)) * 0.5
    p1 = x1 * f + [cx, cy] + r.normal(size=(K, 2)) * 0.5
    out = r.random(K) < 0.2
    p1[out] = r.uniform([10, 10], [630, 470], (out.sum(), 2))
    conf = np.where(out, 0.4, 0.9).astype(np.float32)
    return p0.astype(np.float32), p1.astype(np.float32), intr, conf


pairs = [make_pair(np.random.default_rng(i)) for i in range(BP)]
k0 = jnp.asarray(np.stack([p[0] for p in pairs]))
k1 = jnp.asarray(np.stack([p[1] for p in pairs]))
intr = jnp.asarray(np.stack([p[2] for p in pairs]))
conf = jnp.asarray(np.stack([p[3] for p in pairs]))

x0n = normalize_keypoints(k0, intr)
x1n = normalize_keypoints(k1, intr)
T0 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (BP, 1, 1))

timed("w8pt (determine_inliers)", lambda a, b, c, d: estimate_relative_pose_w8pt(
    a, b, c, c, d, determine_inliers=True), k0, k1, intr, conf)
timed("w8pt (no inliers)", lambda a, b, c, d: estimate_relative_pose_w8pt(
    a, b, c, c, d)[0], k0, k1, intr, conf)
for it in (10, 5, 3):
    timed(f"two_view_ba ({it} LM iters)",
          lambda a, b, c, d, it=it: bundle_adjust_two_view(
              a, b, c, d, n_iterations=it), x0n, x1n, conf, T0)
for irls in (2, 1, 0):
    timed(f"robust_relative_poses full (n_irls={irls}, ba 10)",
          lambda a, b, c, d, irls=irls: robust_relative_poses(
              a, b, c, c, d, 10, n_irls=irls), k0, k1, intr, conf)
