"""Robust translation (position) averaging in pure JAX.

Fills the role of Theia's `LeastUnsquaredDeviationPositionEstimator`
(Ozyesil & Singer, "Robust Camera Location Estimation by Convex Programming",
CVPR 2015) used by the reference's `ba_initializer`
(`/root/reference/.../ba_init/src/ba_init.cpp:77-91`).

Formulation (TPU-first): with per-edge unit directions gamma_e from camera i to
camera j, eliminate the unknown edge scales analytically --

    min_c sum_e w_e || (I - gamma_e gamma_e^T)(c_j - c_i) ||^2

-- a weighted *projection* Laplacian quadratic form. With the translation gauge
fixed (c_0 = 0) its null space is exactly the 1-D scale gauge, so the solution
is the smallest eigenvector of the reduced 3(N-1) x 3(N-1) system via damped
inverse iteration (`smallest_eigvec_ii`: one Cholesky + a few triangular
solves, no XLA eigh kernel). An IRLS loop reweights edges by
1/max(residual, delta) for the least-unsquared-deviations objective; sign and
scale are fixed against the chained spanning-tree init.
"""

from functools import partial

import jax
import jax.numpy as jnp

from e2e_multi_view_matching_tpu.geom.linalg import smallest_eigvec_ii


@partial(jax.jit, static_argnames=("n_irls",))
def translation_averaging(
    c_init,
    edges_i,
    edges_j,
    gamma,
    edge_valid,
    n_irls=8,
    delta=1e-3,
):
    """Robust camera position averaging.

    Args:
        c_init: (N, 3) initial camera centers (world); c_0 is the translation
            gauge and the returned scale/sign is aligned to this init.
        edges_i, edges_j: (E,) int endpoints.
        gamma: (E, 3) unit direction from camera i to camera j in world coords.
        edge_valid: (E,) mask.
        n_irls: IRLS reweighting rounds (static).
        delta: L1 smoothing of the IRLS weight.

    Returns:
        (N, 3) camera centers, c_0 = c_init_0, scale/sign aligned to c_init.
    """
    N = c_init.shape[0]
    dtype = c_init.dtype
    ev = edge_valid.astype(dtype)
    Ai = jax.nn.one_hot(edges_i, N, dtype=dtype)
    Aj = jax.nn.one_hot(edges_j, N, dtype=dtype)
    Ae = (Aj - Ai)[:, 1:]  # (E, N-1): difference operator, camera 0 dropped
    Proj = jnp.eye(3, dtype=dtype)[None] - gamma[:, :, None] * gamma[:, None, :]
    c0_off = c_init[0]
    # relative init (shifted so the gauge camera is the origin)
    c_rel_init = (c_init - c0_off)[1:]  # (N-1, 3)

    def solve(w):
        # M[(a,d1),(b,d2)] = sum_e w_e Ae[e,a] Ae[e,b] Proj[e,d1,d2]
        wgt = w * ev
        M = jnp.einsum("e,ea,eb,eij->aibj", wgt, Ae, Ae, Proj)
        n = (N - 1) * 3
        M = M.reshape(n, n)
        # the scale-gauge null vector: strongly gapped (lam1 ~ 0 exactly), so
        # damped inverse iteration nails it without an XLA eigh kernel
        c_rest = smallest_eigvec_ii(M, n_iters=4).reshape(N - 1, 3)
        # sign + scale alignment to the init
        num = jnp.sum(c_rest * c_rel_init)
        den = jnp.maximum(jnp.sum(c_rest * c_rest), 1e-12)
        return c_rest * (num / den)

    def body(c_rest, _):
        c_full = jnp.concatenate([jnp.zeros((1, 3), dtype), c_rest], 0)
        diff = c_full[edges_j] - c_full[edges_i]
        resid = jnp.einsum("eij,ej->ei", Proj, diff)
        w = 1.0 / jnp.maximum(jnp.linalg.norm(resid, axis=-1), delta)
        return solve(w), None

    c_rest = solve(jnp.ones(edges_i.shape, dtype))
    c_rest, _ = jax.lax.scan(body, c_rest, None, length=n_irls)
    return jnp.concatenate([c0_off[None], c_rest + c0_off[None]], axis=0)


def edge_directions(R_glob, R_rel, t_rel):
    """Unit world-frame direction from camera i's center to camera j's.

    Derivation: in cam_i coords the center of cam_j is -R_ij^T t_ij; rotating to
    world with R_i^T gives gamma = -R_i^T R_ij^T t_ij (then normalized).

    Args:
        R_glob: (E, 3, 3) extrinsic rotations (world->cam) of the i endpoints --
            pass `R[edges_i]`.
        R_rel: (E, 3, 3), t_rel: (E, 3) relative poses i->j.
    Returns:
        (E, 3) unit directions.
    """
    d = -jnp.einsum("eji,ekj,ek->ei", R_glob, R_rel, t_rel)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
