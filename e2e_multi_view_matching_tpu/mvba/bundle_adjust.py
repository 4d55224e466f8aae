"""Multi-camera confidence-weighted Schur-complement LM bundle adjustment.

Fills the role of the reference's Ceres DENSE_SCHUR `bundle_adjuster`
(`/root/reference/pose_optimization/multi_view/bundle_adjustment/problem/src/
ba_problem.cpp:115-157`): residual w * (pi(R_c X + t_c) - obs), camera 0 pinned,
all other cameras free 6-DoF, one 3D point per pairwise match observed in
exactly two cameras (the observation structure `write_bundle_adjust_problem`
emits, `bundle_adjust_io.py:193-259`).

TPU-first design: the point block of the Hessian is block-diagonal 3x3 (every
point has exactly two observations), so the Schur complement reduces the system
to 6(N-1) unknowns (24 for the 5-tuple benchmark). Assembly is batched einsums
plus scatter-adds into (N, N, 6, 6) camera blocks -- no sparse matrices, no
Ceres, no process boundary. The reduced solve is eigenvalue-thresholded (the
global scale gauge survives fixing camera 0: scaling every translation and
point jointly is residual-invariant). Fixed shapes with weight masks; LM
damping with best-iterate tracking as in `pose/two_view_ba.py`.
"""

from functools import partial

import jax
import jax.numpy as jnp

from e2e_multi_view_matching_tpu.geom.lie import hat, se3_exp
from e2e_multi_view_matching_tpu.geom.linalg import (
    eig_thresholded_solve,
    inv3x3,
    smallest_eigvec_ii,
)

_Z_EPS = 1e-6


def _proj_jac(T_c, X):
    """Project world points through per-observation extrinsics.

    Args:
        T_c: (P, 4, 4) extrinsics gathered per observation; X: (P, 3).
    Returns:
        (pi (P, 2), Ap (P, 3), J_proj (P, 2, 3)).
    """
    Ap = jnp.einsum("pij,pj->pi", T_c[:, :3, :3], X) + T_c[:, :3, 3]
    z = Ap[:, 2]
    sign = jnp.where(z >= 0, 1.0, -1.0)
    inv_z = 1.0 / (sign * jnp.maximum(jnp.abs(z), _Z_EPS))
    pi = Ap[:, :2] * inv_z[:, None]
    zeros = jnp.zeros_like(inv_z)
    J = jnp.stack(
        [
            jnp.stack([inv_z, zeros, -Ap[:, 0] * inv_z * inv_z], axis=-1),
            jnp.stack([zeros, inv_z, -Ap[:, 1] * inv_z * inv_z], axis=-1),
        ],
        axis=-2,
    )
    return pi, Ap, J


def _triangulate_pairwise(extr, cam_a, cam_b, xa, xb):
    """DLT-triangulate each point from its two observing cameras (world frame)."""
    Pa = extr[cam_a][:, :3, :]  # (P, 3, 4)
    Pb = extr[cam_b][:, :3, :]

    def rows(Pm, x):
        r0 = x[:, 0:1, None] * Pm[:, 2:3, :] - Pm[:, 0:1, :]
        r1 = x[:, 1:2, None] * Pm[:, 2:3, :] - Pm[:, 1:2, :]
        return jnp.concatenate([r0, r1], axis=1)  # (P, 2, 4)

    A = jnp.concatenate([rows(Pa, xa), rows(Pb, xb)], axis=1)  # (P, 4, 4)
    G = jnp.einsum("pij,pik->pjk", A, A)
    h = smallest_eigvec_ii(G, n_iters=3)
    wc = h[:, 3]
    sign = jnp.where(wc >= 0, 1.0, -1.0)
    return h[:, :3] / (sign * jnp.maximum(jnp.abs(wc), 1e-9))[:, None]


@partial(jax.jit, static_argnames=("n_iterations", "retriangulate", "axis_name"))
def bundle_adjust_multi_view(
    extr_init,
    X_init,
    cam_a,
    cam_b,
    xa,
    xb,
    w,
    n_iterations=20,
    lm_init=0.1,
    lm_increase=1.5,
    lm_decrease=3.5,
    retriangulate=False,
    axis_name=None,
):
    """Refine N camera extrinsics + P pairwise-match points.

    Args:
        extr_init: (N, 4, 4) world->cam extrinsics; camera 0 is held fixed.
        X_init: (P, 3) world points (pass anything when `retriangulate`).
        cam_a, cam_b: (P,) int32 observing camera indices per point.
        xa, xb: (P, 2) normalized observations in those cameras.
        w: (P,) confidence weights; <= 0 disables the point entirely. The
           reference normalizes observation confidences to sum to the
           observation count (`bundle_adjust_io.py:56-60`); callers should do
           the same for faithful weighting.
        axis_name: when set, the function is running inside `shard_map` with the
           observation axis sharded over that mesh axis: the reduced camera
           system (Hcc, Schur corrections, gradients, residual norms -- a few
           hundred floats) is `psum`'d over the axis while all per-point work
           stays local. This is the distributed-BA design (SURVEY.md section
           2.7 north star): per-shard Hessian block assembly + all-reduce of
           the reduced system over ICI. Use
           `mvba.distributed.bundle_adjust_multi_view_sharded` as the wrapper.
    Returns:
        (extr (N, 4, 4) best iterate, X (P, 3) final points).
    """
    N = extr_init.shape[0]
    P = X_init.shape[0]
    dtype = extr_init.dtype
    wm = jnp.where(w > 0.0, w, 0.0)
    free = N - 1

    def residual_system(extr, X):
        Ta = extr[cam_a]
        Tb = extr[cam_b]
        pia, Apa, Ja = _proj_jac(Ta, X)
        pib, Apb, Jb = _proj_jac(Tb, X)
        ra = wm[:, None] * (pia - xa)  # (P, 2)
        rb = wm[:, None] * (pib - xb)
        Ra = Ta[:, :3, :3]
        Rb = Tb[:, :3, :3]
        Jpa = wm[:, None, None] * jnp.einsum("pij,pjl->pil", Ja, Ra)  # (P, 2, 3)
        Jpb = wm[:, None, None] * jnp.einsum("pij,pjl->pil", Jb, Rb)
        I3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (P, 3, 3))
        Jca = wm[:, None, None] * jnp.einsum(
            "pij,pjl->pil", Ja, jnp.concatenate([-hat(Apa), I3], axis=-1)
        )  # (P, 2, 6)
        Jcb = wm[:, None, None] * jnp.einsum(
            "pij,pjl->pil", Jb, jnp.concatenate([-hat(Apb), I3], axis=-1)
        )
        # camera 0 is fixed: zero its Jacobian contributions
        Jca = jnp.where((cam_a > 0)[:, None, None], Jca, 0.0)
        Jcb = jnp.where((cam_b > 0)[:, None, None], Jcb, 0.0)
        r_norm = jnp.sum(ra * ra) + jnp.sum(rb * rb)
        return ra, rb, Jpa, Jpb, Jca, Jcb, r_norm

    # one-hot camera assignments: Hessian assembly becomes MXU matmuls over the
    # observation axis instead of serialized scatter-adds (N is tiny & static)
    oh_a = jax.nn.one_hot(cam_a, N, dtype=dtype)  # (P, N)
    oh_b = jax.nn.one_hot(cam_b, N, dtype=dtype)
    oh_aa = (oh_a[:, :, None] * oh_a[:, None, :]).reshape(-1, N * N)  # (P, N*N)
    oh_ab = (oh_a[:, :, None] * oh_b[:, None, :]).reshape(-1, N * N)
    oh_ba = (oh_b[:, :, None] * oh_a[:, None, :]).reshape(-1, N * N)
    oh_bb = (oh_b[:, :, None] * oh_b[:, None, :]).reshape(-1, N * N)

    def lm_step(extr, X, damp):
        ra, rb, Jpa, Jpb, Jca, Jcb, r_norm = residual_system(extr, X)
        # per-camera diagonal blocks and gradients
        Hcc = jnp.einsum("pn,pri,prj->nij", oh_a, Jca, Jca) + jnp.einsum(
            "pn,pri,prj->nij", oh_b, Jcb, Jcb
        )
        bc = -jnp.einsum("pn,pri,pr->ni", oh_a, Jca, ra) - jnp.einsum(
            "pn,pri,pr->ni", oh_b, Jcb, rb
        )
        # point blocks
        Hpp = jnp.einsum("pri,prj->pij", Jpa, Jpa) + jnp.einsum(
            "pri,prj->pij", Jpb, Jpb
        )  # (P, 3, 3)
        bp = -(jnp.einsum("pri,pr->pi", Jpa, ra) + jnp.einsum("pri,pr->pi", Jpb, rb))
        Hcpa = jnp.einsum("pri,prj->pij", Jca, Jpa)  # (P, 6, 3)
        Hcpb = jnp.einsum("pri,prj->pij", Jcb, Jpb)

        eye3 = jnp.eye(3, dtype=dtype)
        eye6 = jnp.eye(6, dtype=dtype)
        Hpp_d = Hpp + damp * (
            eye3 * jnp.maximum(jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-8)[..., None, :]
        )
        Hcc_d = Hcc + damp * (
            eye6 * jnp.maximum(jnp.diagonal(Hcc, axis1=-2, axis2=-1), 1e-8)[..., None, :]
        )
        # 3x3 point inverses: closed-form adjugate (no XLA eigh inside the LM
        # loop). Disabled points have Hpp_d ~ damp*1e-8*I, whose large-but-
        # finite inverse only ever multiplies their zero Hcp/bp blocks.
        Hpp_inv = inv3x3(Hpp_d)

        Ya = jnp.einsum("pij,pjl->pil", Hcpa, Hpp_inv)  # (P, 6, 3)
        Yb = jnp.einsum("pij,pjl->pil", Hcpb, Hpp_inv)
        # Schur blocks: S[c1, c2] -= Y_{c1} Hcp_{c2}^T for the cameras of each
        # point -- assembled with one-hot matmuls over the observation axis
        corr = -(
            jnp.einsum("pm,pil,pjl->mij", oh_aa, Ya, Hcpa)
            + jnp.einsum("pm,pil,pjl->mij", oh_ab, Ya, Hcpb)
            + jnp.einsum("pm,pil,pjl->mij", oh_ba, Yb, Hcpa)
            + jnp.einsum("pm,pil,pjl->mij", oh_bb, Yb, Hcpb)
        ).reshape(N, N, 6, 6)
        rhs_corr = -jnp.einsum("pn,pij,pj->ni", oh_a, Ya, bp) - jnp.einsum(
            "pn,pij,pj->ni", oh_b, Yb, bp
        )
        if axis_name is not None:
            # all-reduce the reduced camera system over the observation shards
            Hcc = jax.lax.psum(Hcc, axis_name)
            bc = jax.lax.psum(bc, axis_name)
            corr = jax.lax.psum(corr, axis_name)
            rhs_corr = jax.lax.psum(rhs_corr, axis_name)
            r_norm = jax.lax.psum(r_norm, axis_name)
            # re-apply damping on the GLOBAL Hcc (local damping would differ)
            Hcc_d = Hcc + damp * (
                eye6 * jnp.maximum(
                    jnp.diagonal(Hcc, axis1=-2, axis2=-1), 1e-8
                )[..., None, :]
            )
        Sblocks = corr.at[jnp.arange(N), jnp.arange(N)].add(Hcc_d)
        rhs_c = bc + rhs_corr

        S = Sblocks[1:, 1:].transpose(0, 2, 1, 3).reshape(free * 6, free * 6)
        rhs = rhs_c[1:].reshape(free * 6)
        # thresholded reduced solve (scale gauge survives fixing camera 0;
        # unrolled Jacobi keeps the LM loop free of XLA eigh kernels)
        delta_c = eig_thresholded_solve(S, rhs, n_sweeps=8)
        delta_c = jnp.concatenate(
            [jnp.zeros((1, 6), dtype), delta_c.reshape(free, 6)], axis=0
        )  # (N, 6)
        # back-substitute points: Hcp^T delta_c summed over the two cameras
        HcpTdc = jnp.einsum("plj,pl->pj", Hcpa, delta_c[cam_a]) + jnp.einsum(
            "plj,pl->pj", Hcpb, delta_c[cam_b]
        )
        delta_p = jnp.einsum("pij,pj->pi", Hpp_inv, bp - HcpTdc)
        ok = jnp.all(jnp.isfinite(delta_c)) & jnp.all(jnp.isfinite(delta_p))
        if axis_name is not None:
            ok = jax.lax.psum(1 - ok.astype(jnp.int32), axis_name) == 0
        return delta_c, delta_p, r_norm, ok

    def normalize_gauge(extr, X, scale_ref):
        t_norm = jnp.mean(jnp.linalg.norm(extr[1:, :3, 3], axis=-1))
        s = jnp.where(t_norm > 1e-9, scale_ref / jnp.maximum(t_norm, 1e-9), 1.0)
        extr = extr.at[:, :3, 3].multiply(s)
        return extr, X * s, s

    scale_ref = jnp.mean(jnp.linalg.norm(extr_init[1:, :3, 3], axis=-1))

    def body(i, carry):
        extr, X, damp, best_extr, best_X, best_r = carry
        if retriangulate:
            X = _triangulate_pairwise(extr, cam_a, cam_b, xa, xb)
        delta_c, delta_p, r_norm, ok = lm_step(extr, X, damp)
        improved = r_norm < best_r
        best_extr = jnp.where(improved, extr, best_extr)
        best_X = jnp.where(improved, X, best_X)
        best_r = jnp.minimum(r_norm, best_r)
        damp = jnp.where(improved, damp / lm_decrease, damp * lm_increase)
        extr_new = jnp.where(ok, se3_exp(delta_c) @ extr, extr)
        X_new = jnp.where(ok, X + delta_p, X)
        extr_new, X_new, _ = normalize_gauge(extr_new, X_new, scale_ref)
        return (extr_new, X_new, damp, best_extr, best_X, best_r)

    damp0 = jnp.asarray(lm_init, dtype)
    carry = (extr_init, X_init, damp0, extr_init, X_init, jnp.asarray(jnp.inf, dtype))
    extr, X, damp, best_extr, best_X, best_r = jax.lax.fori_loop(
        0, n_iterations, body, carry
    )
    if retriangulate:
        X = _triangulate_pairwise(extr, cam_a, cam_b, xa, xb)
    r_final = residual_system(extr, X)[6]
    if axis_name is not None:
        r_final = jax.lax.psum(r_final, axis_name)
    improved = r_final < best_r
    best_extr = jnp.where(improved, extr, best_extr)
    best_X = jnp.where(improved, X, best_X)
    return best_extr, best_X
