"""Distributed-correctness tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_multi_view_matching_tpu.parallel.mesh import (
    make_mesh,
    param_sharding_spec,
    replicate,
    shard_batch,
    shard_params,
)


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(n_devices=8, model_parallel=2)
        assert mesh.shape == {"data": 4, "model": 2}
        mesh1 = make_mesh(n_devices=8, model_parallel=1)
        assert mesh1.shape == {"data": 8, "model": 1}

    def test_param_sharding_spec(self):
        mesh = make_mesh(n_devices=8, model_parallel=2)
        params = {
            "wide": jnp.zeros((128, 512)),
            "narrow": jnp.zeros((16, 8)),
            "vec": jnp.zeros((512,)),
        }
        specs = param_sharding_spec(params, mesh, min_dim=256)
        assert specs["wide"] == jax.sharding.PartitionSpec(None, "model")
        assert specs["narrow"] == jax.sharding.PartitionSpec()
        assert specs["vec"] == jax.sharding.PartitionSpec()

    def test_shard_batch_places_on_data_axis(self):
        mesh = make_mesh(n_devices=8, model_parallel=2)
        batch = {"x": jnp.zeros((8, 3, 5))}
        sharded = shard_batch(batch, mesh)
        assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec(
            "data", None, None
        )


class TestShardedTrainStepConsistency:
    def test_dp_tp_loss_matches_single_device(self):
        """The dp(4)xtp(2)-sharded train step computes the same loss/params as
        the single-device run (XLA collectives preserve the math)."""
        import sys
        import os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
        from test_train import tiny_setup
        from e2e_multi_view_matching_tpu.train.step import make_train_step

        sp, matcher, tx, opt, state, sp_vars, batch = tiny_setup(pose_loss=False)
        step = make_train_step(sp, matcher, tx, opt)
        rng = jax.random.PRNGKey(1)

        # single-device reference
        state_ref, metrics_ref = jax.jit(step)(state, sp_vars, batch, rng)
        loss_ref = float(metrics_ref["train_loss"])

        # sharded: batch (B=2) over data axis of a (2, 2) mesh, params tp-sharded
        mesh = make_mesh(n_devices=4, model_parallel=2)
        with mesh:
            state_s = state._replace(params=shard_params(state.params, mesh))
            batch_s = shard_batch(batch, mesh)
            sp_vars_s = replicate(sp_vars, mesh)
            state_out, metrics = jax.jit(step)(state_s, sp_vars_s, batch_s, rng)
        loss_sharded = float(metrics["train_loss"])
        np.testing.assert_allclose(loss_sharded, loss_ref, rtol=2e-4)
        # updated parameters agree within the f32 reduction-order tolerance
        # (Adam's first step is sign(g)*lr, so entries whose gradient is at the
        # rounding floor legitimately differ; compare against the update scale
        # and require the disagreeing fraction to be tiny)
        n_tot = 0
        n_bad = 0
        for a, b, p0 in zip(
            jax.tree_util.tree_leaves(state_ref.params),
            jax.tree_util.tree_leaves(state_out.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            ua = np.asarray(a) - np.asarray(p0)
            ub = np.asarray(b) - np.asarray(p0)
            n_tot += ua.size
            n_bad += int(np.sum(np.abs(ua - ub) > 0.5 * np.abs(ua).max() + 1e-8))
        assert n_bad / max(n_tot, 1) < 0.05, (n_bad, n_tot)
