"""Micro-profile of the weighted-8-point internals on the chip: which part of
the ~70 ms/call (B*P=80 pairs, K=1024) is the bottleneck?

Candidates: the (80, 9, 9) Gram safe_eigh (XLA iterative eigh), the 4-candidate
cheirality triangulation (80*4*1024 per-point 4x4 inverse-iteration chains),
the positive-depth triangulation, and the epipolar inlier pass.

Run: timeout 2400 python tools/w8pt_micro_profile.py
"""

import os
import sys
import time

import numpy as np

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("_EMVM_W8M_REEXEC") != "1"
):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1", _EMVM_W8M_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2e_multi_view_matching_tpu.geom.epipolar import (  # noqa: E402
    cheirality_scores, hartley_normalize, motion_from_essential,
    normalize_keypoints, sym_epipolar_distance, triangulate_points)
from e2e_multi_view_matching_tpu.geom.eightpoint import (  # noqa: E402
    _rank2_project, find_fundamental_weighted)
from e2e_multi_view_matching_tpu.geom.linalg import (  # noqa: E402
    jacobi_eigh, safe_eigh, smallest_eigvec_ii)

BP, K = 80, 1024
rng = np.random.default_rng(0)

x0 = jnp.asarray(rng.normal(size=(BP, K, 2)).astype(np.float32) * 0.3)
x1 = jnp.asarray(rng.normal(size=(BP, K, 2)).astype(np.float32) * 0.3)
w = jnp.asarray(rng.uniform(0.1, 1.0, size=(BP, K)).astype(np.float32))
G9 = rng.normal(size=(BP, K, 9)).astype(np.float32)
G9 = jnp.asarray(np.einsum("bki,bkj->bij", G9, G9) / K)
F3 = jnp.asarray(rng.normal(size=(BP, 3, 3)).astype(np.float32))
Rs = jnp.tile(jnp.eye(3, dtype=jnp.float32), (BP, 4, 1, 1))
ts = jnp.asarray(rng.normal(size=(BP, 4, 3)).astype(np.float32))
eyeP = jnp.concatenate([jnp.eye(3, dtype=jnp.float32), jnp.zeros((3, 1), jnp.float32)], -1)
P0 = jnp.broadcast_to(eyeP, (BP, 3, 4))
P1 = jnp.concatenate([Rs[:, 0], ts[:, 0, :, None]], axis=-1)


def timed(label, fn, *args, n=6):
    jfn = jax.jit(lambda *a: sum(
        jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(fn(*a))))
    jfn(*args)
    float(np.asarray(jfn(*args)))
    ts_ = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args)))
        ts_.append(time.perf_counter() - t0)
    print(f"{label:56s} {min(ts_) * 1e3:8.1f} ms", flush=True)
    return min(ts_)


timed("hartley_normalize x2", lambda a, b, c: (
    hartley_normalize(a, c), hartley_normalize(b, c)), x0, x1, w)
timed("Gram(9x9) + safe_eigh (current nullvec path)",
      lambda G: safe_eigh(G)[1][..., :, 0], G9)
timed("Gram(9x9) + jacobi_eigh 8 sweeps",
      lambda G: jacobi_eigh(G, n_sweeps=8)[1], G9)
timed("Gram(9x9) + smallest_eigvec_ii (cholesky path)",
      lambda G: smallest_eigvec_ii(G, n_iters=4), G9)
timed("_rank2_project (3x3 II)", _rank2_project, F3)
timed("find_fundamental_weighted (full)", find_fundamental_weighted, x0, x1, w)
timed("motion_from_essential", motion_from_essential, F3)
timed("triangulate_points (80,1024) [pos-depth pass]",
      triangulate_points, P0, P1, x0, x1)
timed("cheirality_scores (4 cands x 80 x 1024)",
      cheirality_scores, Rs, ts, x0, x1, w)
timed("sym_epipolar_distance", sym_epipolar_distance, x0, x1, F3)
