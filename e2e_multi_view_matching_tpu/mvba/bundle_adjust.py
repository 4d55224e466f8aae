"""Multi-camera confidence-weighted Schur-complement LM bundle adjustment.

Fills the role of the reference's Ceres DENSE_SCHUR `bundle_adjuster`
(`/root/reference/pose_optimization/multi_view/bundle_adjustment/problem/src/
ba_problem.cpp:115-157`): residual w * (pi(R_c X + t_c) - obs), camera 0 pinned,
all other cameras free 6-DoF, one 3D point per pairwise match observed in
exactly two cameras (the observation structure `write_bundle_adjust_problem`
emits, `bundle_adjust_io.py:193-259`).

TPU-first design: the point block of the Hessian is block-diagonal 3x3 (every
point has exactly two observations), so the Schur complement reduces the system
to 6(N-1) unknowns (24 for the 5-tuple benchmark). No sparse matrices, no
Ceres, no process boundary. The reduced solve is eigenvalue-thresholded (the
global scale gauge survives fixing camera 0: scaling every translation and
point jointly is residual-invariant). Fixed shapes with weight masks; LM
damping with best-iterate tracking as in `pose/two_view_ba.py`.

Layout: the LM loop runs in structure-of-arrays form -- every per-point
quantity is (small..., P) with the point axis LAST (TPU lanes). The naive
(P, 2..6, 3..6) einsum formulation tiles each tiny trailing pair to (8, 128),
which made the loop HBM-layout-bound at ~21 ms/LM-iteration for P=10240
(tools/ba_bisect.py); in SoA form the same math is fully-packed VPU
elementwise work plus a handful of genuine MXU matmuls: camera gather/scatter
is expressed as (small, N) @ (N, P) / (small, P) @ (P, N*N) one-hot products
instead of per-point gathers and scatter-adds.
"""

from functools import partial

import jax
import jax.numpy as jnp

from e2e_multi_view_matching_tpu.geom.lie import se3_exp
from e2e_multi_view_matching_tpu.geom.linalg import (
    eig_thresholded_solve,
    smallest_eigvec_ii,
)

_Z_EPS = 1e-6


def _proj_jac(T_c, X):
    """Project world points through per-observation extrinsics (AoS form; kept
    for profiling tools/tests -- the LM loop uses the SoA path below).

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


# SoA small-matrix helpers shared with pose/two_view_ba.py: see geom/soa.py
from e2e_multi_view_matching_tpu.geom.soa import (  # noqa: E402
    abT_soa as _abT_soa,
    hat_soa as _hat_soa,
    inv3x3_soa as _inv3x3_soa,
    mm_soa as _mm_soa,
    mtm_soa as _mtm_soa,
    mtv_soa as _mtv_soa,
    mv_soa as _mv_soa,
)


def _proj_jac_soa(Rsel, tsel, Xt):
    """SoA projection + jacobian.

    Args:
        Rsel: (3, 3, P) per-point rotation; tsel: (3, P); Xt: (3, P).
    Returns:
        (pi (2, P), Ap (3, P), J (2, 3, P)).
    """
    Ap = _mv_soa(Rsel, Xt) + tsel
    z = Ap[2]
    sign = jnp.where(z >= 0, 1.0, -1.0)
    inv_z = 1.0 / (sign * jnp.maximum(jnp.abs(z), _Z_EPS))
    pi = Ap[:2] * inv_z[None]
    zeros = jnp.zeros_like(inv_z)
    J = jnp.stack([
        jnp.stack([inv_z, zeros, -Ap[0] * inv_z * inv_z], axis=0),
        jnp.stack([zeros, inv_z, -Ap[1] * inv_z * inv_z], axis=0),
    ], axis=0)
    return pi, Ap, J


def _triangulate_pairwise_dlt(extr, cam_a, cam_b, xa, xb):
    """DLT-triangulate each point from its two observing cameras (world frame).

    Kept for the variable-projection (`retriangulate=True`) LM mode: there the
    triangulation IS the structure solve each iteration, and the DLT's
    algebraic image-space objective converges measurably tighter than the 3-D
    midpoint (test_refines_perturbed_cameras: 0.30 vs 0.48 final rot error).
    The default init path uses the closed-form midpoint below.
    """
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


def _triangulate_pairwise(extr, cam_a, cam_b, xa, xb):
    """Midpoint-triangulate each point from its two observing cameras.

    Closed-form midpoint of the shortest segment between the two viewing rays
    (world frame). Replaces the per-point 4x4 DLT inverse-iteration chain on
    the hot path -- this is only the INIT of the LM bundle adjuster, whose
    refinement target is the same, and the closed form is pure elementwise
    code on the TPU VPU.
    """
    Ta = extr[cam_a]  # (P, 4, 4)
    Tb = extr[cam_b]
    Ra, tra = Ta[:, :3, :3], Ta[:, :3, 3]
    Rb, trb = Tb[:, :3, :3], Tb[:, :3, 3]
    oa = -jnp.einsum("pji,pj->pi", Ra, tra)  # camera centers (world)
    ob = -jnp.einsum("pji,pj->pi", Rb, trb)
    ones = jnp.ones(xa.shape[:-1] + (1,), dtype=xa.dtype)
    da = jnp.einsum("pji,pj->pi", Ra, jnp.concatenate([xa, ones], -1))
    db = jnp.einsum("pji,pj->pi", Rb, jnp.concatenate([xb, ones], -1))
    b = ob - oa
    a11 = jnp.sum(da * da, axis=-1)
    a22 = jnp.sum(db * db, axis=-1)
    a12 = jnp.sum(da * db, axis=-1)
    r0 = jnp.sum(da * b, axis=-1)
    r1 = -jnp.sum(db * b, axis=-1)
    det = a11 * a22 - a12 * a12
    # near-parallel rays: floor the determinant (the midpoint degenerates the
    # same way the DLT's null space does; the LM refinement owns the rest)
    det = jnp.maximum(det, 1e-9 * jnp.maximum(a11 * a22, 1e-12))
    za = (r0 * a22 + a12 * r1) / det
    zb = (a11 * r1 + a12 * r0) / det
    return 0.5 * (oa + za[:, None] * da + ob + zb[:, None] * db)


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
    dtype = extr_init.dtype
    wm = jnp.where(w > 0.0, w, 0.0)
    free = N - 1
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)

    # SoA layout: per-point arrays are (small..., P) -- see module docstring.
    xa_t = xa.T  # (2, P)
    xb_t = xb.T
    mask_a = (cam_a > 0).astype(dtype)  # camera 0 fixed
    mask_b = (cam_b > 0).astype(dtype)

    # one-hot camera assignments: camera gather/scatter becomes MXU matmuls
    oh_a = jax.nn.one_hot(cam_a, N, dtype=dtype)  # (P, N)
    oh_b = jax.nn.one_hot(cam_b, N, dtype=dtype)
    ohT_a = oh_a.T  # (N, P)
    ohT_b = oh_b.T
    oh_aa = (oh_a[:, :, None] * oh_a[:, None, :]).reshape(-1, N * N)  # (P, N^2)
    oh_ab = (oh_a[:, :, None] * oh_b[:, None, :]).reshape(-1, N * N)
    oh_ba = (oh_b[:, :, None] * oh_a[:, None, :]).reshape(-1, N * N)
    oh_bb = (oh_b[:, :, None] * oh_b[:, None, :]).reshape(-1, N * N)

    def select_cam(extr, ohT):
        """Per-point camera rotation/translation via (9|3, N) @ (N, P)."""
        Rl = extr[:, :3, :3].reshape(N, 9).T  # (9, N)
        tl = extr[:, :3, 3].T  # (3, N)
        Rsel = (Rl @ ohT).reshape(3, 3, -1)
        tsel = tl @ ohT
        return Rsel, tsel

    def side_system(extr, Xt, ohT, x_t, mask):
        """One observation side: residual (2, P), Jp (2, 3, P), Jc (2, 6, P)."""
        Rsel, tsel = select_cam(extr, ohT)
        pi, Ap, J = _proj_jac_soa(Rsel, tsel, Xt)
        r = wm[None] * (pi - x_t)
        Jp = wm[None, None] * _mm_soa(J, Rsel)
        M = jnp.concatenate(
            [-_hat_soa(Ap),
             jnp.broadcast_to(eye3[..., None], (3, 3, Ap.shape[-1]))],
            axis=1,
        )  # (3, 6, P)
        Jc = (wm * mask)[None, None] * _mm_soa(J, M)
        return r, Jp, Jc

    def residual_system(extr, Xt):
        ra, Jpa, Jca = side_system(extr, Xt, ohT_a, xa_t, mask_a)
        rb, Jpb, Jcb = side_system(extr, Xt, ohT_b, xb_t, mask_b)
        r_norm = jnp.sum(ra * ra) + jnp.sum(rb * rb)
        return ra, rb, Jpa, Jpb, Jca, Jcb, r_norm

    def reduce_cams(flatP, oh):
        """(u, P) @ (P, n) -> (n, u): per-camera sums of per-point blocks."""
        return (flatP @ oh).T

    def lm_step(extr, Xt, damp):
        ra, rb, Jpa, Jpb, Jca, Jcb, r_norm = residual_system(extr, Xt)
        Pn = ra.shape[-1]
        # per-camera diagonal blocks and gradients: (36|6, P) @ (P, N)
        Hcc = (
            reduce_cams(_mtm_soa(Jca, Jca).reshape(36, Pn), oh_a)
            + reduce_cams(_mtm_soa(Jcb, Jcb).reshape(36, Pn), oh_b)
        ).reshape(N, 6, 6)
        bc = -(
            reduce_cams(_mtv_soa(Jca, ra), oh_a)
            + reduce_cams(_mtv_soa(Jcb, rb), oh_b)
        )  # (N, 6)
        # point blocks (all SoA)
        Hpp = _mtm_soa(Jpa, Jpa) + _mtm_soa(Jpb, Jpb)  # (3, 3, P)
        bp = -(_mtv_soa(Jpa, ra) + _mtv_soa(Jpb, rb))  # (3, P)
        Hcpa = _mtm_soa(Jca, Jpa)  # (6, 3, P)
        Hcpb = _mtm_soa(Jcb, Jpb)
        # 3x3 point inverses: closed-form adjugate (no XLA eigh inside the LM
        # loop). Disabled points have Hpp_d ~ damp*1e-8*I, whose large-but-
        # finite inverse only ever multiplies their zero Hcp/bp blocks.
        dpp = jnp.maximum(jnp.stack([Hpp[0, 0], Hpp[1, 1], Hpp[2, 2]]), 1e-8)
        Hpp_d = Hpp + damp * eye3[..., None] * dpp[None]
        Hpp_inv = _inv3x3_soa(Hpp_d)
        Ya = _mm_soa(Hcpa, Hpp_inv)  # (6, 3, P)
        Yb = _mm_soa(Hcpb, Hpp_inv)
        # Schur blocks: S[c1, c2] -= Y_{c1} Hcp_{c2}^T, scattered to camera
        # pairs with (36, P) @ (P, N^2) one-hot matmuls
        corr = -(
            reduce_cams(_abT_soa(Ya, Hcpa).reshape(36, Pn), oh_aa)
            + reduce_cams(_abT_soa(Ya, Hcpb).reshape(36, Pn), oh_ab)
            + reduce_cams(_abT_soa(Yb, Hcpa).reshape(36, Pn), oh_ba)
            + reduce_cams(_abT_soa(Yb, Hcpb).reshape(36, Pn), oh_bb)
        ).reshape(N, N, 6, 6)
        rhs_corr = -(
            reduce_cams(_mv_soa(Ya, bp), oh_a)
            + reduce_cams(_mv_soa(Yb, bp), oh_b)
        )  # (N, 6)
        if axis_name is not None:
            # all-reduce the reduced camera system over the observation shards
            Hcc = jax.lax.psum(Hcc, axis_name)
            bc = jax.lax.psum(bc, axis_name)
            corr = jax.lax.psum(corr, axis_name)
            rhs_corr = jax.lax.psum(rhs_corr, axis_name)
            r_norm = jax.lax.psum(r_norm, axis_name)
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
        d_sel_a = delta_c.T @ ohT_a  # (6, P)
        d_sel_b = delta_c.T @ ohT_b
        HcpTdc = _mtv_soa(Hcpa, d_sel_a) + _mtv_soa(Hcpb, d_sel_b)  # (3, P)
        delta_p = _mv_soa(Hpp_inv, bp - HcpTdc)  # (3, P)
        ok = jnp.all(jnp.isfinite(delta_c)) & jnp.all(jnp.isfinite(delta_p))
        if axis_name is not None:
            ok = jax.lax.psum(1 - ok.astype(jnp.int32), axis_name) == 0
        return delta_c, delta_p, r_norm, ok

    def normalize_gauge(extr, Xt, scale_ref):
        t_norm = jnp.mean(jnp.linalg.norm(extr[1:, :3, 3], axis=-1))
        s = jnp.where(t_norm > 1e-9, scale_ref / jnp.maximum(t_norm, 1e-9), 1.0)
        extr = extr.at[:, :3, 3].multiply(s)
        return extr, Xt * s, s

    scale_ref = jnp.mean(jnp.linalg.norm(extr_init[1:, :3, 3], axis=-1))
    Xt_init = X_init.T  # (3, P)

    def body(i, carry):
        extr, Xt, damp, best_extr, best_Xt, best_r = carry
        if retriangulate:
            Xt = _triangulate_pairwise_dlt(extr, cam_a, cam_b, xa, xb).T
        delta_c, delta_p, r_norm, ok = lm_step(extr, Xt, damp)
        improved = r_norm < best_r
        best_extr = jnp.where(improved, extr, best_extr)
        best_Xt = jnp.where(improved, Xt, best_Xt)
        best_r = jnp.minimum(r_norm, best_r)
        damp = jnp.where(improved, damp / lm_decrease, damp * lm_increase)
        extr_new = jnp.where(ok, se3_exp(delta_c) @ extr, extr)
        Xt_new = jnp.where(ok, Xt + delta_p, Xt)
        extr_new, Xt_new, _ = normalize_gauge(extr_new, Xt_new, scale_ref)
        return (extr_new, Xt_new, damp, best_extr, best_Xt, best_r)

    damp0 = jnp.asarray(lm_init, dtype)
    carry = (
        extr_init, Xt_init, damp0, extr_init, Xt_init,
        jnp.asarray(jnp.inf, dtype),
    )
    extr, Xt, damp, best_extr, best_Xt, best_r = jax.lax.fori_loop(
        0, n_iterations, body, carry
    )
    if retriangulate:
        Xt = _triangulate_pairwise_dlt(extr, cam_a, cam_b, xa, xb).T
    r_final = residual_system(extr, Xt)[6]
    if axis_name is not None:
        r_final = jax.lax.psum(r_final, axis_name)
    improved = r_final < best_r
    best_extr = jnp.where(improved, extr, best_extr)
    best_Xt = jnp.where(improved, Xt, best_Xt)
    return best_extr, best_Xt.T
