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
from e2e_multi_view_matching_tpu.geom.lie import hat, se3_exp
from e2e_multi_view_matching_tpu.geom.linalg import eig_thresholded_solve, inv3x3

_Z_EPS = 1e-6


def _project_with_jac(T, X):
    """Project points and return residual pieces + Jacobians.

    Args:
        T: (B, 4, 4) extrinsics; X: (B, K, 3) points.
    Returns:
        (pi (B, K, 2) projections, Ap (B, K, 3) cam-space points,
         J_proj (B, K, 2, 3) d pi / d Ap).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Ap = jnp.einsum("bij,bkj->bki", R, X) + t[:, None, :]
    z = Ap[..., 2]
    sign = jnp.where(z >= 0, 1.0, -1.0)
    z_safe = sign * jnp.maximum(jnp.abs(z), _Z_EPS)
    inv_z = 1.0 / z_safe
    pi = Ap[..., :2] * inv_z[..., None]
    zeros = jnp.zeros_like(inv_z)
    J = jnp.stack(
        [
            jnp.stack([inv_z, zeros, -Ap[..., 0] * inv_z * inv_z], axis=-1),
            jnp.stack([zeros, inv_z, -Ap[..., 1] * inv_z * inv_z], axis=-1),
        ],
        axis=-2,
    )  # (B, K, 2, 3)
    return pi, Ap, J


def _inv3x3(M, eps=1e-12):
    """Batched closed-form 3x3 inverse (adjugate; see geom/linalg.py)."""
    return inv3x3(M, det_eps=eps)


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
    X = midpoint_triangulate_rel(
        init_T021[:, :3, :3], init_T021[:, :3, 3], x0, x1
    )  # (B, K, 3); closed-form midpoint: same refinement target as DLT,
    # none of the per-point 4x4 inverse-iteration cost

    T_identity = jnp.broadcast_to(jnp.eye(4, dtype=x0.dtype), (B, 4, 4))

    def residual_system(T1, X):
        # cam0 = identity
        pi0 = X[..., :2] / jnp.where(
            jnp.abs(X[..., 2:]) > _Z_EPS, X[..., 2:], _Z_EPS
        )
        z0 = X[..., 2]
        sign0 = jnp.where(z0 >= 0, 1.0, -1.0)
        inv_z0 = 1.0 / (sign0 * jnp.maximum(jnp.abs(z0), _Z_EPS))
        zeros = jnp.zeros_like(inv_z0)
        J0 = jnp.stack(
            [
                jnp.stack([inv_z0, zeros, -X[..., 0] * inv_z0 * inv_z0], axis=-1),
                jnp.stack([zeros, inv_z0, -X[..., 1] * inv_z0 * inv_z0], axis=-1),
            ],
            axis=-2,
        )
        pi1, Ap1, J1 = _project_with_jac(T1, X)

        r0 = w[..., None] * (pi0 - x0)  # (B, K, 2)
        r1 = w[..., None] * (pi1 - x1)
        # point Jacobians (conf-weighted, like `fill_J` weighting both J and r)
        R1 = T1[:, None, :3, :3]
        Jp0 = w[..., None, None] * J0  # dpi0/dX = J0 @ I
        Jp1 = w[..., None, None] * jnp.einsum("bkij,bkjl->bkil", J1, jnp.broadcast_to(R1, J1.shape[:2] + (3, 3)))
        # camera Jacobian for cam1: J1 @ [-hat(Ap1) | I]  (rotation-first layout)
        I3 = jnp.broadcast_to(jnp.eye(3, dtype=x0.dtype), Ap1.shape[:2] + (3, 3))
        lhs = jnp.concatenate([-hat(Ap1), I3], axis=-1)  # (B, K, 3, 6)
        Jc = w[..., None, None] * jnp.einsum("bkij,bkjl->bkil", J1, lhs)  # (B, K, 2, 6)

        r_norm = jnp.sum(r0 * r0, axis=(-2, -1)) + jnp.sum(r1 * r1, axis=(-2, -1))
        return r0, r1, Jp0, Jp1, Jc, r_norm

    def lm_step(T1, X, damp):
        r0, r1, Jp0, Jp1, Jc, r_norm = residual_system(T1, X)
        # Hessian blocks
        Hcc = jnp.einsum("bkri,bkrj->bij", Jc, Jc)  # (B, 6, 6)
        Hcp = jnp.einsum("bkri,bkrj->bkij", Jc, Jp1)  # (B, K, 6, 3)
        Hpp = jnp.einsum("bkri,bkrj->bkij", Jp0, Jp0) + jnp.einsum(
            "bkri,bkrj->bkij", Jp1, Jp1
        )  # (B, K, 3, 3)
        bc = -jnp.einsum("bkri,bkr->bi", Jc, r1)  # (B, 6)
        bp = -(
            jnp.einsum("bkri,bkr->bki", Jp0, r0) + jnp.einsum("bkri,bkr->bki", Jp1, r1)
        )  # (B, K, 3)

        # Marquardt damping (multiplicative on diagonals + absolute floor)
        eye3 = jnp.eye(3, dtype=x0.dtype)
        eye6 = jnp.eye(6, dtype=x0.dtype)
        d = damp[:, None, None]
        Hpp_d = Hpp + d[:, None] * (
            eye3 * jnp.maximum(jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-8)[..., None, :]
        )
        Hcc_d = Hcc + d * (
            eye6 * jnp.maximum(jnp.diagonal(Hcc, axis1=-2, axis2=-1), 1e-8)[..., None, :]
        )

        Hpp_inv = _inv3x3(Hpp_d)
        # Schur complement of the point block: S (B, 6, 6)
        HcpHppinv = jnp.einsum("bkij,bkjl->bkil", Hcp, Hpp_inv)  # (B, K, 6, 3)
        S = Hcc_d - jnp.einsum("bkil,bkjl->bij", HcpHppinv, Hcp)
        rhs = bc - jnp.einsum("bkij,bkj->bi", HcpHppinv, bp)  # (B, 6)
        # Eigen-thresholded 6x6 solve. Two-view BA has an exact gauge freedom
        # (scaling t and all point depths together leaves every residual
        # unchanged), so S always has a ~zero eigenvalue; a Cholesky/LU solve
        # with small damping takes huge objective-invariant steps along it and
        # stalls. Zeroing step components whose curvature is below a relative
        # threshold kills the gauge direction and any f32 assembly noise.
        # (Unrolled-Jacobi solve: no XLA eigh kernel inside the LM loop.)
        delta_c = eig_thresholded_solve(S, rhs, n_sweeps=6)
        delta_p = jnp.einsum(
            "bkij,bkj->bki", Hpp_inv, bp - jnp.einsum("bklj,bl->bkj", Hcp, delta_c)
        )
        step_ok = jnp.all(jnp.isfinite(delta_c), axis=-1) & jnp.all(
            jnp.isfinite(delta_p.reshape(B, -1)), axis=-1
        )
        return delta_c, delta_p, r_norm, step_ok

    def body(i, carry):
        T1, X, damp, best_T1, best_r = carry
        if retriangulate:
            X = midpoint_triangulate_rel(T1[:, :3, :3], T1[:, :3, 3], x0, x1)
        delta_c, delta_p, r_norm, step_ok = lm_step(T1, X, damp)
        improved = r_norm < best_r
        best_T1 = jnp.where(improved[:, None, None], T1, best_T1)
        best_r = jnp.minimum(r_norm, best_r)
        damp = jnp.where(improved, damp / lm_decrease, damp * lm_increase)
        # apply update (masked on solve health; invalid samples get zero delta
        # because their weights -- hence gradients -- are zero anyway)
        ok = step_ok[:, None, None]
        T1_new = jnp.where(ok, se3_exp(delta_c) @ T1, T1)
        X_new = jnp.where(step_ok[:, None, None], X + delta_p, X)
        # Gauge renormalization: jointly rescaling (t, X) is residual-invariant,
        # so pin ||t|| to the init's scale to stop conditioning drift.
        t_norm = jnp.linalg.norm(T1_new[:, :3, 3], axis=-1)
        t0_norm = jnp.linalg.norm(init_T021[:, :3, 3], axis=-1)
        s = jnp.where(t_norm > 1e-9, t0_norm / jnp.maximum(t_norm, 1e-9), 1.0)
        T1_new = T1_new.at[:, :3, 3].multiply(s[:, None])
        X_new = X_new * s[:, None, None]
        return (T1_new, X_new, damp, best_T1, best_r)

    damp0 = jnp.full((B,), lm_init, dtype=x0.dtype)
    best_r0 = jnp.full((B,), jnp.inf, dtype=x0.dtype)
    carry = (init_T021, X, damp0, init_T021, best_r0)
    T1, X, damp, best_T1, best_r = jax.lax.fori_loop(0, n_iterations, body, carry)
    # final evaluation captures the last iterate if it is the best
    if retriangulate:
        X = midpoint_triangulate_rel(T1[:, :3, :3], T1[:, :3, 3], x0, x1)
    r_final = residual_system(T1, X)[5]
    improved = r_final < best_r
    best_T1 = jnp.where(improved[:, None, None], T1, best_T1)

    out = jnp.where(valid[:, None, None], best_T1, init_T021)
    return out, valid
