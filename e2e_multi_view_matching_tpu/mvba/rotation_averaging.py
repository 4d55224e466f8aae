"""Robust IRLS rotation averaging in pure JAX.

Fills the role of Theia's `RobustRotationEstimator` (Chatterjee & Govindu,
"Efficient and Robust Large-Scale Rotation Averaging", ICCV 2013) used by the
reference's `ba_initializer` (`/root/reference/pose_optimization/multi_view/
bundle_adjustment/ba_init/src/ba_init.cpp:77-91`).

Formulation: extrinsic rotations R_i (world->cam), measured relatives
R_ij ~ R_j R_i^T per edge. Right-perturbation linearization
log(R_j^T R_ij R_i) ~ r_e with update direction delta_i - delta_j solved from
the weighted graph Laplacian (gauge: camera 0 fixed). IRLS reweighting with an
L1/2-style Geman-McClure weight gives outlier robustness. Everything is fixed
shape: edges carry a validity mask; the Laplacian solve is one dense
3(N-1) x 3(N-1) Cholesky per problem (N is small: the reference evaluates
5-tuples), batched over problems if desired via vmap.
"""

from functools import partial

import jax
import jax.numpy as jnp

from e2e_multi_view_matching_tpu.geom.lie import so3_exp, so3_log


@partial(jax.jit, static_argnames=("n_irls", "n_inner"))
def rotation_averaging(
    R_init,
    edges_i,
    edges_j,
    R_rel,
    edge_valid,
    n_irls=10,
    n_inner=1,
    sigma=0.1,
):
    """Robust rotation averaging.

    Args:
        R_init: (N, 3, 3) initial extrinsic rotations (world->cam); camera 0 is
            the gauge and is returned unchanged (identity-aligned output frame).
        edges_i, edges_j: (E,) int camera indices per measured relative.
        R_rel: (E, 3, 3) measured R_ij (cam_i -> cam_j).
        edge_valid: (E,) bool/float mask.
        n_irls: IRLS reweighting rounds (static).
        n_inner: Gauss-Newton steps per reweighting (static).
        sigma: Geman-McClure scale (radians).

    Returns:
        (N, 3, 3) refined rotations, gauge-fixed so R_0 = R_init_0.
    """
    N = R_init.shape[0]
    E = edges_i.shape[0]
    ev = edge_valid.astype(R_init.dtype)

    def residuals(R):
        Ri = R[edges_i]  # (E, 3, 3)
        Rj = R[edges_j]
        Eerr = jnp.swapaxes(Rj, -1, -2) @ R_rel @ Ri
        return so3_log(Eerr)  # (E, 3)

    def solve_step(R, w):
        r = residuals(R)  # (E, 3)
        # System: r_e + delta_i - delta_j = 0 in LS sense ->
        # minimize sum_e w_e || delta_i - delta_j + r_e ||^2, delta_0 = 0.
        # Laplacian assembly over the reduced index set (cameras 1..N-1).
        wgt = w * ev  # (E,)
        # signed incidence: edge e contributes +1 at i, -1 at j
        A_rows_i = jax.nn.one_hot(edges_i, N, dtype=R.dtype)  # (E, N)
        A_rows_j = jax.nn.one_hot(edges_j, N, dtype=R.dtype)
        Ae = A_rows_i - A_rows_j  # (E, N)
        Ae = Ae[:, 1:]  # gauge: drop camera 0
        L = jnp.einsum("e,ei,ej->ij", wgt, Ae, Ae)  # (N-1, N-1)
        b = -jnp.einsum("e,ei,ed->id", wgt, Ae, r)  # (N-1, 3)
        # scale-RELATIVE damping: an absolute 1e-8 underflows in f32 next to
        # O(1) edge weights (1 + 1e-8 == 1), so an underconstrained graph
        # (e.g. a single valid edge) left L exactly singular and the Cholesky
        # produced NaNs. Damping at 1e-5 of the largest diagonal keeps every
        # camera's block invertible at any weight scale.
        diag_max = jnp.maximum(jnp.max(jnp.diagonal(L)), 1.0)
        L = L + (1e-5 * diag_max) * jnp.eye(N - 1, dtype=R.dtype)
        chol, low = jax.scipy.linalg.cho_factor(L, lower=True)
        delta = jax.scipy.linalg.cho_solve((chol, low), b)  # (N-1, 3)
        delta = jnp.concatenate([jnp.zeros((1, 3), dtype=R.dtype), delta], axis=0)
        # keep the previous iterate if the solve degenerated anyway (the
        # reference's averaging failure prints-and-continues, ba_init.cpp:80-89)
        ok = jnp.all(jnp.isfinite(delta))
        delta = jnp.where(ok, delta, 0.0)
        return R @ so3_exp(delta), r

    def irls_round(R, _):
        r = residuals(R)
        nrm2 = jnp.sum(r * r, axis=-1)
        # Geman-McClure-style weight: w = (sigma^2 / (nrm^2 + sigma^2))^2
        w = (sigma**2 / (nrm2 + sigma**2)) ** 2
        for _ in range(n_inner):
            R, _ = solve_step(R, w)
        return R, None

    # one unweighted (L2) round to pull the init together, then IRLS
    R, _ = solve_step(R_init, jnp.ones((E,), dtype=R_init.dtype))
    R, _ = jax.lax.scan(irls_round, R, None, length=n_irls)
    return R
