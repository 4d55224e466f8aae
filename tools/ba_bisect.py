"""Cumulative on-chip bisection of the multi-camera BA LM iteration.

ba_micro_profile found every isolated component at the dispatch floor, yet the
full `bundle_adjust_multi_view` costs ~19 ms/LM-iteration at B=8, V=5,
P=10240. This tool rebuilds lm_step stage by stage (same helpers, same
shapes, vmapped over B, scanned x NITER) to find the cliff.

Run: timeout 2400 python tools/ba_bisect.py
"""

import os
import sys
import time

import numpy as np

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("_EMVM_BAB_REEXEC") != "1"
):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1", _EMVM_BAB_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2e_multi_view_matching_tpu.geom.lie import hat, se3_exp  # noqa: E402
from e2e_multi_view_matching_tpu.geom.linalg import (  # noqa: E402
    eig_thresholded_solve, inv3x3)
from e2e_multi_view_matching_tpu.mvba.bundle_adjust import _proj_jac  # noqa: E402

B, V, K = 8, 5, 1024
PAIRS = [(i, j) for j in range(V) for i in range(j)]
P = len(PAIRS) * K
NITER = 20
rng = np.random.default_rng(0)

cam_a_np = np.repeat([i for i, j in PAIRS], K).astype(np.int32)
cam_b_np = np.repeat([j for i, j in PAIRS], K).astype(np.int32)
cam_a, cam_b = jnp.asarray(cam_a_np), jnp.asarray(cam_b_np)
oh_a = jax.nn.one_hot(cam_a, V, dtype=jnp.float32)
oh_b = jax.nn.one_hot(cam_b, V, dtype=jnp.float32)
oh_aa = (oh_a[:, :, None] * oh_a[:, None, :]).reshape(-1, V * V)
oh_ab = (oh_a[:, :, None] * oh_b[:, None, :]).reshape(-1, V * V)
oh_ba = (oh_b[:, :, None] * oh_a[:, None, :]).reshape(-1, V * V)
oh_bb = (oh_b[:, :, None] * oh_b[:, None, :]).reshape(-1, V * V)

extr = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
                   ).at[:, :, 0, 3].add(np.arange(V) * 0.1)
X = jnp.asarray(rng.uniform(-2, 2, size=(B, P, 3)).astype(np.float32)
                ).at[..., 2].add(8.0)
xa = jnp.asarray(rng.normal(size=(B, P, 2)).astype(np.float32) * 0.2)
xb = jnp.asarray(rng.normal(size=(B, P, 2)).astype(np.float32) * 0.2)
w = jnp.asarray(rng.uniform(0.2, 1, size=(B, P)).astype(np.float32))
I3 = jnp.eye(3, dtype=jnp.float32)


def residual_system(extr, X, xa, xb, w):
    Ta, Tb = extr[cam_a], extr[cam_b]
    pia, Apa, Ja = _proj_jac(Ta, X)
    pib, Apb, Jb = _proj_jac(Tb, X)
    ra = w[:, None] * (pia - xa)
    rb = w[:, None] * (pib - xb)
    Jpa = w[:, None, None] * jnp.einsum("pij,pjl->pil", Ja, Ta[:, :3, :3])
    Jpb = w[:, None, None] * jnp.einsum("pij,pjl->pil", Jb, Tb[:, :3, :3])
    I3b = jnp.broadcast_to(I3, (P, 3, 3))
    Jca = w[:, None, None] * jnp.einsum(
        "pij,pjl->pil", Ja, jnp.concatenate([-hat(Apa), I3b], axis=-1))
    Jcb = w[:, None, None] * jnp.einsum(
        "pij,pjl->pil", Jb, jnp.concatenate([-hat(Apb), I3b], axis=-1))
    Jca = jnp.where((cam_a > 0)[:, None, None], Jca, 0.0)
    Jcb = jnp.where((cam_b > 0)[:, None, None], Jcb, 0.0)
    r_norm = jnp.sum(ra * ra) + jnp.sum(rb * rb)
    return ra, rb, Jpa, Jpb, Jca, Jcb, r_norm


def stage(level, extr, X, xa, xb, w, damp):
    ra, rb, Jpa, Jpb, Jca, Jcb, r_norm = residual_system(extr, X, xa, xb, w)
    if level == 0:
        return r_norm
    Hcc = (jnp.einsum("pn,pri,prj->nij", oh_a, Jca, Jca)
           + jnp.einsum("pn,pri,prj->nij", oh_b, Jcb, Jcb))
    bc = (-jnp.einsum("pn,pri,pr->ni", oh_a, Jca, ra)
          - jnp.einsum("pn,pri,pr->ni", oh_b, Jcb, rb))
    Hpp = jnp.einsum("pri,prj->pij", Jpa, Jpa) + jnp.einsum("pri,prj->pij", Jpb, Jpb)
    bp = -(jnp.einsum("pri,pr->pi", Jpa, ra) + jnp.einsum("pri,pr->pi", Jpb, rb))
    Hcpa = jnp.einsum("pri,prj->pij", Jca, Jpa)
    Hcpb = jnp.einsum("pri,prj->pij", Jcb, Jpb)
    Hpp_d = Hpp + damp * (I3 * jnp.maximum(
        jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-8)[..., None, :])
    Hpp_inv = inv3x3(Hpp_d)
    Ya = jnp.einsum("pij,pjl->pil", Hcpa, Hpp_inv)
    Yb = jnp.einsum("pij,pjl->pil", Hcpb, Hpp_inv)
    if level == 1:
        return r_norm + jnp.sum(Ya[0, 0]) + jnp.sum(bc) + jnp.sum(bp[0])
    corr = -(jnp.einsum("pm,pil,pjl->mij", oh_aa, Ya, Hcpa)
             + jnp.einsum("pm,pil,pjl->mij", oh_ab, Ya, Hcpb)
             + jnp.einsum("pm,pil,pjl->mij", oh_ba, Yb, Hcpa)
             + jnp.einsum("pm,pil,pjl->mij", oh_bb, Yb, Hcpb)).reshape(V, V, 6, 6)
    rhs_corr = (-jnp.einsum("pn,pij,pj->ni", oh_a, Ya, bp)
                - jnp.einsum("pn,pij,pj->ni", oh_b, Yb, bp))
    if level == 2:
        return r_norm + jnp.sum(corr[0, 0]) + jnp.sum(rhs_corr)
    eye6 = jnp.eye(6, dtype=jnp.float32)
    Hcc_d = Hcc + damp * (eye6 * jnp.maximum(
        jnp.diagonal(Hcc, axis1=-2, axis2=-1), 1e-8)[..., None, :])
    Sblocks = corr.at[jnp.arange(V), jnp.arange(V)].add(Hcc_d)
    rhs_c = bc + rhs_corr
    S = Sblocks[1:, 1:].transpose(0, 2, 1, 3).reshape((V - 1) * 6, (V - 1) * 6)
    rhs = rhs_c[1:].reshape((V - 1) * 6)
    delta_c = eig_thresholded_solve(S, rhs, n_sweeps=8)
    delta_c = jnp.concatenate([jnp.zeros((1, 6)), delta_c.reshape(V - 1, 6)], 0)
    HcpTdc = (jnp.einsum("plj,pl->pj", Hcpa, delta_c[cam_a])
              + jnp.einsum("plj,pl->pj", Hcpb, delta_c[cam_b]))
    delta_p = jnp.einsum("pij,pj->pi", Hpp_inv, bp - HcpTdc)
    if level == 3:
        return r_norm + jnp.sum(delta_c) + jnp.sum(delta_p[0])
    extr_new = se3_exp(delta_c) @ extr
    return r_norm + jnp.sum(extr_new) + jnp.sum(delta_p[0])


def timed(label, fn, *args, n=5):
    red = jax.jit(lambda *a: jnp.sum(fn(*a)))
    red(*args)
    float(np.asarray(red(*args)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(red(*args)))
        ts.append(time.perf_counter() - t0)
    print(f"{label:46s} {min(ts) * 1e3:8.1f} ms "
          f"({(min(ts)) / NITER * 1e3:5.2f} ms/iter)", flush=True)


NAMES = ["residuals+jacobians", "+Hcc/Hpp/Hcp/Y", "+Schur corr (4 one-hot terms)",
         "+solve+backsub", "+se3 update"]
for lvl in range(5):
    def loop(extr, X, xa, xb, w, lvl=lvl):
        def body(c, _):
            out = stage(lvl, extr, X + c * 1e-20, xa, xb, w, 0.1)
            return jnp.sum(out) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=NITER)
        return c

    timed(f"L{lvl} {NAMES[lvl]} x{NITER} (vmap B)",
          lambda e, x, a, b, ww, lvl=lvl: jax.vmap(
              lambda e1, x1, a1, b1, w1: loop(e1, x1, a1, b1, w1, lvl))(e, x, a, b, ww),
          extr, X, xa, xb, w)
