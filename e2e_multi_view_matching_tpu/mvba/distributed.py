"""Distributed multi-view bundle adjustment over a device mesh.

The north-star capability beyond the reference (SURVEY.md sections 2.7, 7.3
item 8): shard the observation/point axis over the mesh's "data" axis, assemble
per-shard Hessian blocks locally, and all-reduce only the reduced camera system
(a few hundred floats for a 5-tuple; 6(N-1) unknowns generally) over ICI via
`psum`. Point back-substitution stays shard-local. The camera state is
replicated, so every device takes identical LM decisions.

This scales the BA to problems whose observation tables exceed one device's
memory (e.g. city-scale tuples or dense per-pair match sets) with communication
volume independent of the point count.
"""

from functools import partial

import jax
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from e2e_multi_view_matching_tpu.mvba.bundle_adjust import bundle_adjust_multi_view


def bundle_adjust_multi_view_sharded(
    extr_init,
    X_init,
    cam_a,
    cam_b,
    xa,
    xb,
    w,
    mesh,
    axis="data",
    n_iterations=20,
    retriangulate=False,
    **lm_kwargs,
):
    """Drop-in distributed variant of `bundle_adjust_multi_view`.

    Pads the point axis to a multiple of the mesh axis size with zero-weight
    rows (inert by construction), shards all per-point arrays, and runs the LM
    loop under `shard_map` with the reduced-system psum enabled.

    Returns:
        (extr (N, 4, 4) replicated, X (P, 3) gathered back to the host shape).
    """
    n_shards = mesh.shape[axis]
    P_pts = X_init.shape[0]
    pad = (-P_pts) % n_shards
    if pad:
        import jax.numpy as jnp

        X_init = jnp.concatenate([X_init, jnp.ones((pad, 3), X_init.dtype)], 0)
        cam_a = jnp.concatenate([cam_a, jnp.zeros((pad,), cam_a.dtype)], 0)
        cam_b = jnp.concatenate(
            [cam_b, jnp.full((pad,), 1, cam_b.dtype)], 0
        )
        xa = jnp.concatenate([xa, jnp.zeros((pad, 2), xa.dtype)], 0)
        xb = jnp.concatenate([xb, jnp.zeros((pad, 2), xb.dtype)], 0)
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)], 0)

    core = partial(
        bundle_adjust_multi_view,
        n_iterations=n_iterations,
        retriangulate=retriangulate,
        axis_name=axis,
        **lm_kwargs,
    )
    sharded = shard_map(
        core,
        mesh=mesh,
        in_specs=(
            P(),          # extr replicated
            P(axis),      # X sharded over points
            P(axis),      # cam_a
            P(axis),      # cam_b
            P(axis),      # xa
            P(axis),      # xb
            P(axis),      # w
        ),
        out_specs=(P(), P(axis)),
    )
    extr, X = jax.jit(sharded)(extr_init, X_init, cam_a, cam_b, xa, xb, w)
    return extr, X[:P_pts]
