"""Two-view Levenberg-Marquardt bundle adjustment with Schur complement, jittable.

Behavioral re-design of `BundleAdjustGaussNewton2View`
(`/root/reference/pose_optimization/two_view/bundle_adjust_gauss_newton_2_view.py`):
free 6-DoF second camera + one 3D point per match, confidence-weighted
reprojection residuals, per-sample LM damping (x1.5 on regression, /3.5 on
improvement, init 0.1 -- `:102-113`), best-iterate tracking, and a
`n_matches > 6` validity gate (`:134-138`).

TPU-first re-design (the performance-critical part):
- The reference assembles a dense (6 + 3M)^2 normal-equation matrix per sample
  and LU-solves it (`:80-99,185-190`) -- O((3K)^3) and shape-ragged. Here the
  point blocks are eliminated analytically: Hpp is block-diagonal 3x3 (each
  point is seen by exactly 2 cameras, only one of which is free), so the Schur
  complement S = Hcc - Hcp Hpp^-1 Hpc is a single 6x6 system per sample,
  assembled with batched einsums (MXU) and vmapped 3x3 inverses. O(K) total.
- Ragged observation lists (`Observations`, `:10-48`) become fixed-K tensors
  with zero-confidence masking; excluded samples ride along inert.
- The iteration is a `lax.fori_loop` with per-sample damping/best-iterate state.

The parameterization is [omega, nu] left-multiplied: T1 <- exp(delta) @ T1,
so J_cam = w * J_proj @ [-hat(Ap) | I] (the reference uses the translation-first
pytorch3d layout; ours is rotation-first, same geometry).
"""

from functools import partial

import jax
import jax.numpy as jnp

from e2e_multi_view_matching_tpu.geom.epipolar import midpoint_triangulate_rel
from e2e_multi_view_matching_tpu.geom.lie import se3_exp
from e2e_multi_view_matching_tpu.geom.linalg import eig_thresholded_solve, inv3x3
from e2e_multi_view_matching_tpu.geom.soa import (
    hat_soa,
    inv3x3_soa,
    mm_soa,
    mtm_soa,
    mtv_soa,
    mv_soa,
)

_Z_EPS = 1e-6


@partial(jax.jit, static_argnames=("n_iterations", "retriangulate"))
def bundle_adjust_two_view(
    x0,
    x1,
    conf,
    init_T021,
    n_iterations=10,
    lm_init=0.1,
    lm_increase=1.5,
    lm_decrease=3.5,
    retriangulate=False,
):
    """Refine a relative pose by confidence-weighted two-view LM bundle adjustment.

    Args:
        x0, x1: (B, K, 2) camera-normalized matched keypoints.
        conf: (B, K) confidences; <= 0 marks an invalid match (excluded).
        init_T021: (B, 4, 4) initial relative transform.
        n_iterations: LM iterations (static).
        retriangulate: variable-projection mode -- re-solve the structure by DLT
            triangulation from the current cameras each iteration instead of
            carrying it as free LM state. The camera step still uses the full
            Schur-reduced curvature (so it knows structure will follow), but the
            structure can never lock in a stale camera estimate. Converges
            strictly tighter than the reference's joint parameterization on
            perturbed inits; set False for the reference-faithful behavior.
    Returns:
        (T021 (B, 4, 4) best-residual extrinsics -- the init for samples gated
         invalid, and valid (B,) bool = `n_matches > 6`).
    """
    B, K, _ = x0.shape
    w_match = jnp.where(conf > 0.0, conf, 0.0)
    n_matches = jnp.sum(w_match > 0.0, axis=-1)
    valid = n_matches > 6
    # per-observation confidence normalization: sum over 2K observations -> 2
    # (`bundle_adjust_gauss_newton_2_view.py:44-48`)
    w = w_match / jnp.maximum(0.5 * jnp.sum(w_match, axis=-1, keepdims=True), 1e-6)

    # triangulate initial points in the cam0 frame
    X0init = midpoint_triangulate_rel(
        init_T021[:, :3, :3], init_T021[:, :3, 3], x0, x1
    )  # (B, K, 3); closed-form midpoint: same refinement target as DLT,
    # none of the per-point 4x4 inverse-iteration cost

    # SoA layout (see geom/soa.py): per-point quantities are (small..., B, K)
    # with the big axes trailing (TPU lanes); the AoS (B, K, 2..6, 3..6)
    # einsum formulation tiled every tiny trailing pair to (8, 128) and was
    # HBM-layout-bound at ~4.3 ms/LM-iteration for 80x1024 pairs.
    x0t = jnp.moveaxis(x0, -1, 0)  # (2, B, K)
    x1t = jnp.moveaxis(x1, -1, 0)
    eye3 = jnp.eye(3, dtype=x0.dtype)

    def soa_cam(T1):
        """(B, 4, 4) -> R (3, 3, B, 1), t (3, B, 1) broadcastable over K."""
        R = jnp.transpose(T1[:, :3, :3], (1, 2, 0))[..., None]
        t = jnp.transpose(T1[:, :3, 3])[..., None]
        return R, t

    def residual_system(T1, Xt):
        # cam0 = identity; Xt: (3, B, K)
        z0 = Xt[2]
        sign0 = jnp.where(z0 >= 0, 1.0, -1.0)
        inv_z0 = 1.0 / (sign0 * jnp.maximum(jnp.abs(z0), _Z_EPS))
        pi0 = Xt[:2] * inv_z0[None]
        zeros = jnp.zeros_like(inv_z0)
        J0 = jnp.stack(
            [
                jnp.stack([inv_z0, zeros, -Xt[0] * inv_z0 * inv_z0], axis=0),
                jnp.stack([zeros, inv_z0, -Xt[1] * inv_z0 * inv_z0], axis=0),
            ],
            axis=0,
        )  # (2, 3, B, K)
        R1, t1 = soa_cam(T1)
        Ap1 = mv_soa(R1, Xt) + t1  # (3, B, K)
        z1 = Ap1[2]
        sign1 = jnp.where(z1 >= 0, 1.0, -1.0)
        inv_z1 = 1.0 / (sign1 * jnp.maximum(jnp.abs(z1), _Z_EPS))
        pi1 = Ap1[:2] * inv_z1[None]
        J1 = jnp.stack(
            [
                jnp.stack([inv_z1, zeros, -Ap1[0] * inv_z1 * inv_z1], axis=0),
                jnp.stack([zeros, inv_z1, -Ap1[1] * inv_z1 * inv_z1], axis=0),
            ],
            axis=0,
        )  # (2, 3, B, K)

        r0 = w[None] * (pi0 - x0t)  # (2, B, K)
        r1 = w[None] * (pi1 - x1t)
        # point Jacobians (conf-weighted, like `fill_J` weighting both J and r)
        Jp0 = w[None, None] * J0
        Jp1 = w[None, None] * mm_soa(J1, R1)
        # camera Jacobian for cam1: J1 @ [-hat(Ap1) | I]  (rotation-first layout)
        lhs = jnp.concatenate(
            [-hat_soa(Ap1),
             jnp.broadcast_to(eye3[..., None, None], (3, 3) + Ap1.shape[1:])],
            axis=1,
        )  # (3, 6, B, K)
        Jc = w[None, None] * mm_soa(J1, lhs)  # (2, 6, B, K)

        r_norm = jnp.sum(r0 * r0, axis=(0, 2)) + jnp.sum(r1 * r1, axis=(0, 2))
        return r0, r1, Jp0, Jp1, Jc, r_norm

    def lm_step(T1, Xt, damp):
        r0, r1, Jp0, Jp1, Jc, r_norm = residual_system(T1, Xt)
        # camera block: genuine (2K x 6)^T (2K x 6) contraction -> einsum/MXU
        Hcc = jnp.einsum("ribk,rjbk->bij", Jc, Jc)  # (B, 6, 6)
        bc = -jnp.einsum("ribk,rbk->bi", Jc, r1)  # (B, 6)
        # point blocks (SoA)
        Hcp = mtm_soa(Jc, Jp1)  # (6, 3, B, K)
        Hpp = mtm_soa(Jp0, Jp0) + mtm_soa(Jp1, Jp1)  # (3, 3, B, K)
        bp = -(mtv_soa(Jp0, r0) + mtv_soa(Jp1, r1))  # (3, B, K)

        # Marquardt damping (multiplicative on diagonals + absolute floor)
        eye6 = jnp.eye(6, dtype=x0.dtype)
        dpp = jnp.maximum(jnp.stack([Hpp[0, 0], Hpp[1, 1], Hpp[2, 2]]), 1e-8)
        Hpp_d = Hpp + damp[None, None, :, None] * eye3[..., None, None] * dpp[None]
        Hcc_d = Hcc + damp[:, None, None] * (
            eye6 * jnp.maximum(jnp.diagonal(Hcc, axis1=-2, axis2=-1), 1e-8)[..., None, :]
        )

        # det floor 1e-12 (not the 1e-30 masked-block default): a ~singular
        # point block would otherwise emit a ~1e20-scaled inverse whose Inf
        # delta, though masked out of the primal by step_ok, still poisons
        # gradients through the update `where` (Inf * 0 = NaN in the VJP).
        Hpp_inv = inv3x3_soa(Hpp_d, det_eps=1e-12)
        # Schur complement of the point block: S (B, 6, 6)
        Y = mm_soa(Hcp, Hpp_inv)  # (6, 3, B, K)
        S = Hcc_d - jnp.einsum("ilbk,jlbk->bij", Y, Hcp)
        rhs = bc - jnp.einsum("ijbk,jbk->bi", Y, bp)  # (B, 6)
        # Eigen-thresholded 6x6 solve. Two-view BA has an exact gauge freedom
        # (scaling t and all point depths together leaves every residual
        # unchanged), so S always has a ~zero eigenvalue; a Cholesky/LU solve
        # with small damping takes huge objective-invariant steps along it and
        # stalls. Zeroing step components whose curvature is below a relative
        # threshold kills the gauge direction and any f32 assembly noise.
        # (Unrolled-Jacobi solve: no XLA eigh kernel inside the LM loop.)
        delta_c = eig_thresholded_solve(S, rhs, n_sweeps=6)
        # back-substitute points: bp - Hcp^T delta_c, then Hpp^-1
        HcpTdc = jnp.einsum("ijbk,bi->jbk", Hcp, delta_c)  # (3, B, K)
        delta_p = mv_soa(Hpp_inv, bp - HcpTdc)  # (3, B, K)
        step_ok = jnp.all(jnp.isfinite(delta_c), axis=-1) & jnp.all(
            jnp.isfinite(delta_p), axis=(0, 2)
        )
        return delta_c, delta_p, r_norm, step_ok

    def body(i, carry):
        T1, Xt, damp, best_T1, best_r = carry
        if retriangulate:
            Xt = jnp.moveaxis(
                midpoint_triangulate_rel(T1[:, :3, :3], T1[:, :3, 3], x0, x1),
                -1, 0)
        delta_c, delta_p, r_norm, step_ok = lm_step(T1, Xt, damp)
        improved = r_norm < best_r
        best_T1 = jnp.where(improved[:, None, None], T1, best_T1)
        best_r = jnp.minimum(r_norm, best_r)
        damp = jnp.where(improved, damp / lm_decrease, damp * lm_increase)
        # apply update (masked on solve health; invalid samples get zero delta
        # because their weights -- hence gradients -- are zero anyway)
        ok = step_ok[:, None, None]
        T1_new = jnp.where(ok, se3_exp(delta_c) @ T1, T1)
        X_new = jnp.where(step_ok[None, :, None], Xt + delta_p, Xt)
        # Gauge renormalization: jointly rescaling (t, X) is residual-invariant,
        # so pin ||t|| to the init's scale to stop conditioning drift.
        t_norm = jnp.linalg.norm(T1_new[:, :3, 3], axis=-1)
        t0_norm = jnp.linalg.norm(init_T021[:, :3, 3], axis=-1)
        s = jnp.where(t_norm > 1e-9, t0_norm / jnp.maximum(t_norm, 1e-9), 1.0)
        T1_new = T1_new.at[:, :3, 3].multiply(s[:, None])
        X_new = X_new * s[None, :, None]
        return (T1_new, X_new, damp, best_T1, best_r)

    damp0 = jnp.full((B,), lm_init, dtype=x0.dtype)
    best_r0 = jnp.full((B,), jnp.inf, dtype=x0.dtype)
    carry = (init_T021, jnp.moveaxis(X0init, -1, 0), damp0, init_T021, best_r0)
    T1, Xt, damp, best_T1, best_r = jax.lax.fori_loop(0, n_iterations, body, carry)
    # final evaluation captures the last iterate if it is the best
    if retriangulate:
        Xt = jnp.moveaxis(
            midpoint_triangulate_rel(T1[:, :3, :3], T1[:, :3, 3], x0, x1), -1, 0)
    r_final = residual_system(T1, Xt)[5]
    improved = r_final < best_r
    best_T1 = jnp.where(improved[:, None, None], T1, best_T1)

    out = jnp.where(valid[:, None, None], best_T1, init_T021)
    return out, valid
