"""Pose-pipeline stage-B sub-profile on the chip: rotation averaging /
translation averaging / triangulation / multi-camera Schur BA, each vmapped at
the bench shapes (B=8 tuples, V=5, 10 pairs x K=1024 observations).

Run: timeout 2400 python tools/poseb_profile.py
"""

import os
import sys
import time

import numpy as np

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("_EMVM_PBP_REEXEC") != "1"
):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1", _EMVM_PBP_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2e_multi_view_matching_tpu.mvba.bundle_adjust import (  # noqa: E402
    bundle_adjust_multi_view)
from e2e_multi_view_matching_tpu.mvba.pipeline import (  # noqa: E402
    _triangulate_pairwise)
from e2e_multi_view_matching_tpu.mvba.rotation_averaging import (  # noqa: E402
    rotation_averaging)
from e2e_multi_view_matching_tpu.mvba.translation_averaging import (  # noqa: E402
    edge_directions, translation_averaging)

B, V, K = 8, 5, 1024
PAIRS = [(i, j) for j in range(V) for i in range(j)]
E = len(PAIRS)
P = E * K
rng = np.random.default_rng(0)


def timed(label, fn, *args, n=6):
    red = jax.jit(lambda *a: sum(
        jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(fn(*a))))
    red(*args)
    float(np.asarray(red(*args)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(red(*args)))
        ts.append(time.perf_counter() - t0)
    print(f"{label:44s} {min(ts) * 1e3:8.1f} ms ({min(ts) / B * 1e3:.1f} ms/tuple)",
          flush=True)
    return min(ts)


# synthetic rig per tuple
def make_tuple(r):
    ang = r.normal(size=(V, 3)) * 0.2
    Rm = []
    for a in ang:
        th = np.linalg.norm(a) + 1e-9
        k = a / th
        Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        Rm.append(np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx)
    Rm = np.stack(Rm).astype(np.float32)
    c = r.normal(size=(V, 3)).astype(np.float32)
    extr = np.zeros((V, 4, 4), np.float32)
    extr[:, :3, :3] = Rm
    extr[:, :3, 3] = -np.einsum("vij,vj->vi", Rm, c)
    extr[:, 3, 3] = 1
    X = r.uniform(-2, 2, size=(P, 3)).astype(np.float32)
    X[:, 2] += 8
    cam_a = np.repeat([i for i, j in PAIRS], K).astype(np.int32)
    cam_b = np.repeat([j for i, j in PAIRS], K).astype(np.int32)
    pa = np.einsum("pij,pj->pi", extr[cam_a, :3, :3], X) + extr[cam_a, :3, 3]
    pb = np.einsum("pij,pj->pi", extr[cam_b, :3, :3], X) + extr[cam_b, :3, 3]
    xa = (pa[:, :2] / pa[:, 2:]).astype(np.float32)
    xb = (pb[:, :2] / pb[:, 2:]).astype(np.float32)
    w = r.uniform(0.2, 1.0, size=P).astype(np.float32)
    T_rel = np.stack([extr[j] @ np.linalg.inv(extr[i]) for i, j in PAIRS]
                     ).astype(np.float32)
    return extr, cam_a, cam_b, xa, xb, w, T_rel


tuples = [make_tuple(np.random.default_rng(i)) for i in range(B)]
extr = jnp.asarray(np.stack([t[0] for t in tuples]))
cam_a, cam_b = jnp.asarray(tuples[0][1]), jnp.asarray(tuples[0][2])
xa = jnp.asarray(np.stack([t[3] for t in tuples]))
xb = jnp.asarray(np.stack([t[4] for t in tuples]))
w = jnp.asarray(np.stack([t[5] for t in tuples]))
T_rel = jnp.asarray(np.stack([t[6] for t in tuples]))
ei = jnp.asarray([i for i, j in PAIRS], jnp.int32)
ej = jnp.asarray([j for i, j in PAIRS], jnp.int32)
valid = jnp.ones((B, E), bool)

timed("rotation_averaging (10 IRLS)", jax.vmap(
    lambda ex, tr, va: rotation_averaging(ex[:, :3, :3], ei, ej, tr[:, :3, :3], va)),
    extr, T_rel, valid)

gamma_fn = jax.vmap(lambda ex, tr: edge_directions(
    ex[ei, :3, :3], tr[:, :3, :3], tr[:, :3, 3]))
gamma = jax.block_until_ready(jax.jit(gamma_fn)(extr, T_rel))
c0 = jax.vmap(lambda ex: -jnp.einsum("vji,vj->vi", ex[:, :3, :3], ex[:, :3, 3]))(extr)
timed("translation_averaging (8 IRLS)", jax.vmap(
    lambda c, g, va: translation_averaging(c, ei, ej, g, va)), c0, gamma, valid)

timed("triangulate_pairwise", jax.vmap(
    lambda ex, x1, x2: _triangulate_pairwise(ex, cam_a, cam_b, x1, x2)),
    extr, xa, xb)

X0 = jax.block_until_ready(jax.jit(jax.vmap(
    lambda ex, x1, x2: _triangulate_pairwise(ex, cam_a, cam_b, x1, x2)))(extr, xa, xb))

for iters in (20, 10, 5):
    timed(f"bundle_adjust_multi_view ({iters} LM iters)", jax.vmap(
        lambda ex, X, x1, x2, ww: bundle_adjust_multi_view(
            ex, X, cam_a, cam_b, x1, x2, ww, n_iterations=iters)[0]),
        extr, X0, xa, xb, w)
