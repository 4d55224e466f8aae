"""Micro-profile of the multi-camera BA LM iteration internals on the chip:
where do the ~20 ms/iteration go at B=8, V=5, P=10240?

Candidates: the unrolled-Jacobi `eig_thresholded_solve` (24x24, per LM iter)
vs the per-point Hessian/Schur assembly on (P, 2/6, 3/6)-shaped tensors whose
trailing-two-dim TPU tiling pads (6,3) -> (8,128).

Run: timeout 2400 python tools/ba_micro_profile.py
"""

import os
import sys
import time

import numpy as np

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("_EMVM_BAM_REEXEC") != "1"
):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1", _EMVM_BAM_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2e_multi_view_matching_tpu.geom.linalg import (  # noqa: E402
    eig_thresholded_solve, inv3x3)

B, V, P = 8, 5, 10240
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
    print(f"{label:50s} {min(ts) * 1e3:8.1f} ms", flush=True)
    return min(ts)


# 24x24 thresholded solve, vmapped B -- once per LM iteration
S = jnp.asarray(rng.normal(size=(B, 24, 24)).astype(np.float32))
S = S @ jnp.swapaxes(S, -1, -2) + 1e-2 * jnp.eye(24)
rhs = jnp.asarray(rng.normal(size=(B, 24)).astype(np.float32))
timed("eig_thresholded_solve 24x24 (8 sweeps) x B", eig_thresholded_solve, S, rhs)
timed("eig_thresholded_solve x20 (scan, = 20 LM iters)",
      lambda S, rhs: jax.lax.scan(
          lambda c, _: (c + eig_thresholded_solve(S, rhs + c * 1e-20), None),
          jnp.zeros((B, 24)), None, length=20)[0], S, rhs)

# per-point assembly block at bench shapes
Jca = jnp.asarray(rng.normal(size=(B, P, 2, 6)).astype(np.float32))
Jpa = jnp.asarray(rng.normal(size=(B, P, 2, 3)).astype(np.float32))
ra = jnp.asarray(rng.normal(size=(B, P, 2)).astype(np.float32))
cam_a = jnp.asarray(np.tile(np.repeat(np.arange(4), P // 4), (B, 1)).astype(np.int32))
oh_a = jax.nn.one_hot(cam_a, V, dtype=jnp.float32)  # (B, P, V)
oh_aa = (oh_a[..., :, None] * oh_a[..., None, :]).reshape(B, P, V * V)


def assembly(Jca, Jpa, ra, oh_a, oh_aa):
    Hcc = jnp.einsum("bpn,bpri,bprj->bnij", oh_a, Jca, Jca)
    bc = -jnp.einsum("bpn,bpri,bpr->bni", oh_a, Jca, ra)
    Hpp = jnp.einsum("bpri,bprj->bpij", Jpa, Jpa)
    Hcp = jnp.einsum("bpri,bprj->bpij", Jca, Jpa)  # (B,P,6,3)
    Hpp_inv = inv3x3(Hpp + 1e-2 * jnp.eye(3))
    Y = jnp.einsum("bpij,bpjl->bpil", Hcp, Hpp_inv)
    corr = jnp.einsum("bpm,bpil,bpjl->bmij", oh_aa, Y, Hcp)
    return Hcc, bc, corr


t1 = timed("Hessian/Schur assembly (one LM iter's worth)", assembly,
           Jca, Jpa, ra, oh_a, oh_aa)
timed("assembly x20 (scan)", lambda *a: jax.lax.scan(
    lambda c, _: (c + assembly(*a)[1] * 1e-20, None),
    jnp.zeros((B, V, 6)), None, length=20)[0], Jca, Jpa, ra, oh_a, oh_aa)

# projection/jacobian part: simple per-point math
extr = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, V, 1, 1))
X = jnp.asarray(rng.uniform(1, 5, size=(B, P, 3)).astype(np.float32))


def proj(extr, X, cam_a):
    T = jnp.take_along_axis(extr, cam_a[..., None, None], axis=1)
    Xc = jnp.einsum("bpij,bpj->bpi", T[..., :3, :3], X) + T[..., :3, 3]
    z = jnp.maximum(Xc[..., 2:], 1e-6)
    pi = Xc[..., :2] / z
    J = jnp.stack([
        jnp.stack([1 / z[..., 0], jnp.zeros_like(z[..., 0]), -pi[..., 0] / z[..., 0]], -1),
        jnp.stack([jnp.zeros_like(z[..., 0]), 1 / z[..., 0], -pi[..., 1] / z[..., 0]], -1),
    ], -2)
    return pi, J


timed("projection+jacobian", proj, extr, X, cam_a)
