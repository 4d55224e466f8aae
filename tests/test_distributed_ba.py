"""Distributed multi-view BA: sharded run must reproduce the single-device result."""

import jax.numpy as jnp
import numpy as np

from e2e_multi_view_matching_tpu.mvba.bundle_adjust import bundle_adjust_multi_view
from e2e_multi_view_matching_tpu.mvba.distributed import (
    bundle_adjust_multi_view_sharded,
)
from e2e_multi_view_matching_tpu.parallel.mesh import make_mesh

import sys
import os

sys.path.insert(0, os.path.dirname(__file__))
from test_mvba import TestMultiViewBA  # reuse the rig problem builder


class TestDistributedBA:
    def test_matches_single_device(self, rng):
        builder = TestMultiViewBA()
        extr, extr_init, cam_a, cam_b, xa, xb, Xw = builder.make_problem(
            rng, pts_per_pair=30
        )
        w = np.ones(len(cam_a), np.float32)
        args = (
            jnp.asarray(extr_init), jnp.asarray(Xw), jnp.asarray(cam_a),
            jnp.asarray(cam_b), jnp.asarray(xa), jnp.asarray(xb), jnp.asarray(w),
        )
        extr_ref, X_ref = bundle_adjust_multi_view(*args, n_iterations=10)

        mesh = make_mesh(n_devices=8, model_parallel=1)
        extr_sh, X_sh = bundle_adjust_multi_view_sharded(
            *args, mesh=mesh, axis="data", n_iterations=10
        )
        np.testing.assert_allclose(
            np.asarray(extr_sh), np.asarray(extr_ref), rtol=1e-3, atol=1e-5
        )
        # final pose quality holds
        r, t = builder.max_pose_err(np.asarray(extr_sh), extr)
        r0, t0 = builder.max_pose_err(extr_init, extr)
        assert r < r0 and np.all(np.isfinite(np.asarray(X_sh)))

    def test_padding_is_inert(self, rng):
        """Point counts not divisible by the shard count pad with zero weight."""
        builder = TestMultiViewBA()
        extr, extr_init, cam_a, cam_b, xa, xb, Xw = builder.make_problem(
            rng, pts_per_pair=13  # 130 points -> pad 6 for 8 shards
        )
        w = np.ones(len(cam_a), np.float32)
        mesh = make_mesh(n_devices=8, model_parallel=1)
        extr_sh, X_sh = bundle_adjust_multi_view_sharded(
            jnp.asarray(extr_init), jnp.asarray(Xw), jnp.asarray(cam_a),
            jnp.asarray(cam_b), jnp.asarray(xa), jnp.asarray(xb), jnp.asarray(w),
            mesh=mesh, n_iterations=6,
        )
        assert X_sh.shape[0] == len(cam_a)
        extr_ref, _ = bundle_adjust_multi_view(
            jnp.asarray(extr_init), jnp.asarray(Xw), jnp.asarray(cam_a),
            jnp.asarray(cam_b), jnp.asarray(xa), jnp.asarray(xb), jnp.asarray(w),
            n_iterations=6,
        )
        np.testing.assert_allclose(
            np.asarray(extr_sh), np.asarray(extr_ref), rtol=1e-3, atol=1e-5
        )
