"""Tests for optimizer semantics, the jitted train step, and checkpointing."""

import os
import types

import jax
import jax.numpy as jnp
import numpy as np

from e2e_multi_view_matching_tpu.models.matcher import (
    MatcherConfig,
    MultiViewMatcher,
    default_gnn_layers,
)
from e2e_multi_view_matching_tpu.models.superpoint import SuperPoint, SuperPointConfig
from e2e_multi_view_matching_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from e2e_multi_view_matching_tpu.train.optim import (
    build_optimizer,
    scale_lr,
    skip_if_nonfinite,
    windowed_exponential_schedule,
)
from e2e_multi_view_matching_tpu.train.step import (
    create_train_state,
    make_train_step,
)

import optax


class TestOptim:
    def test_scale_lr_reference_formula(self):
        # tuple 5, batch 8, 3 gpus on scannet: fact = 120/128
        lr, dr, sd, ed = scale_lr(5, 8, 3, 1e-4, 0.999992, 1e5, 9e5, "scannet")
        fact = 5 * 8 * 3 / 128.0
        np.testing.assert_allclose(lr, np.sqrt(fact) * 1e-4)
        np.testing.assert_allclose(dr, 0.999992**fact)
        assert sd == int(1e5 / fact) and ed == int(9e5 / fact)
        # megadepth base batch 16
        lr_m, _, _, _ = scale_lr(2, 16, 1, 1e-4, 0.999992, 5e4, 9e5, "megadepth")
        np.testing.assert_allclose(lr_m, 1e-4)

    def test_windowed_schedule(self):
        s = windowed_exponential_schedule(1.0, 0.9, start_decay=10, end_decay=20)
        np.testing.assert_allclose(float(s(0)), 1.0)
        np.testing.assert_allclose(float(s(10)), 1.0)
        np.testing.assert_allclose(float(s(15)), 0.9**5, rtol=1e-5)
        np.testing.assert_allclose(float(s(30)), 0.9**10, rtol=1e-5)
        np.testing.assert_allclose(float(s(100)), 0.9**10, rtol=1e-5)  # frozen after end

    def test_skip_if_nonfinite(self):
        tx = skip_if_nonfinite(optax.sgd(0.1))
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        good = {"w": jnp.ones(3)}
        updates, state = tx.update(good, state, params)
        assert float(updates["w"][0]) != 0.0
        bad = {"w": jnp.asarray([1.0, jnp.nan, 1.0])}
        updates, state = tx.update(bad, state, params)
        np.testing.assert_allclose(np.asarray(updates["w"]), 0.0)
        assert int(state.skipped) == 1

    def test_conf_mlp_group_lr(self):
        tx = build_optimizer(1e-3, 1.0, 0, 0, pose_loss=True, conf_mlp_lr=1e-4,
                             grad_clip=-1)
        params = {"gnn": {"w": jnp.ones(4)}, "conf_mlp": {"dense_0": {"w": jnp.ones(4)}}}
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        # adam first step: update magnitude == lr for each group
        np.testing.assert_allclose(np.abs(updates["gnn"]["w"]), 1e-3, rtol=1e-3)
        np.testing.assert_allclose(
            np.abs(updates["conf_mlp"]["dense_0"]["w"]), 1e-4, rtol=1e-3
        )


def tiny_setup(pose_loss=False):
    from e2e_multi_view_matching_tpu.data.synthetic import PlaneScene, checkerboard_image

    V, K, H, W = 3, 24, 48, 64
    # unmatch threshold shrunk to stay proportionate to the tiny test images
    # (at 15 px every non-match in a 48x64 frame is "uncertain" and the
    # class-balance weights all drop -- faithful reference behavior, but it
    # would zero the training signal in this fixture).
    opt = types.SimpleNamespace(
        pose_loss=pose_loss, rot_weight=100.0, trans_weight=50.0,
        final_pose_match_ratio=0.99, match_reproj_err=3.0, unmatch_reproj_err=6.0,
        tuple_size=V,
    )
    sp = SuperPoint(SuperPointConfig(max_keypoints=K, remove_borders=4,
                                     keypoint_threshold=1e-4))
    matcher = MultiViewMatcher(MatcherConfig(
        gnn_layers=default_gnn_layers(1, 1), sinkhorn_iterations=10,
        conf_mlp=pose_loss, multi_frame_matching=True,
    ))
    rng = np.random.default_rng(0)
    B = 2
    # geometrically consistent views so GT matches (and thus gradients) exist
    images, intrs, poses, depths = [], [], [], []
    for _ in range(B):
        scene = PlaneScene(rng, n_views=V, H=H, W=W, f=60.0, baseline=0.3)
        images.append(np.stack(
            [checkerboard_image(scene, v)[..., None] for v in range(V)]
        ).astype(np.float32))
        intrs.append(scene.intr.astype(np.float32))
        poses.append(scene.poses.astype(np.float32))
        depths.append(np.stack([scene.depth_map(v) for v in range(V)]))
    batch = {
        "images": jnp.asarray(np.stack(images)),
        "intr": jnp.asarray(np.stack(intrs)),
        "poses": jnp.asarray(np.stack(poses)),
        "depths": jnp.asarray(np.stack(depths)),
    }
    key = jax.random.PRNGKey(0)
    sp_vars = sp.init({"params": key, "keypoints": key},
                      batch["images"].reshape(B * V, H, W, 1))
    m_vars = matcher.init(
        key, jnp.zeros((B, V, K, 2)), jnp.zeros((B, V, K)),
        jnp.zeros((B, V, K, 256)), jnp.full((B, V, 2), float(H)),
    )
    tx = build_optimizer(1e-3, 0.999992, 100, 1000, pose_loss=pose_loss)
    state = create_train_state(m_vars["params"], m_vars["batch_stats"], tx)
    return sp, matcher, tx, opt, state, sp_vars, batch


class TestTrainStep:
    def test_stage1_step_runs_and_updates(self):
        sp, matcher, tx, opt, state, sp_vars, batch = tiny_setup(pose_loss=False)
        step = jax.jit(make_train_step(sp, matcher, tx, opt))
        new_state, metrics = step(state, sp_vars, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["train_loss"]))
        assert int(new_state.step) == 1
        # parameters changed
        before = jax.tree_util.tree_leaves(state.params)[0]
        after = jax.tree_util.tree_leaves(new_state.params)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_grad_accum_matches_full_batch(self):
        """grad_accum=2 on a duplicated batch reproduces the grad_accum=1
        update exactly: the reference loss is sum/batch, so averaged
        microbatch gradients equal the full-batch gradient. keypoint_threshold
        is forced to 0 so SuperPoint detects deterministically (no random
        fill, which draws from a per-microbatch folded rng)."""
        import dataclasses

        import optax

        sp, matcher, _, opt, _, sp_vars, batch = tiny_setup(pose_loss=False)
        sp_det = SuperPoint(dataclasses.replace(sp.config, keypoint_threshold=0.0))
        # SGD makes the update LINEAR in the gradient: post-Adam params are a
        # sign(g)-like function near zero gradients, where f32 reduction-order
        # noise between the scan and straight-line programs flips updates.
        tx = optax.sgd(1e-2)
        m_vars = matcher.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 3, 24, 2)), jnp.zeros((2, 3, 24)),
            jnp.zeros((2, 3, 24, 256)), jnp.full((2, 3, 2), 48.0),
        )
        state = create_train_state(m_vars["params"], m_vars["batch_stats"], tx)
        dup = {k: jnp.concatenate([v, v], axis=0) for k, v in batch.items()}
        step1 = jax.jit(make_train_step(sp_det, matcher, tx, opt))
        step2 = jax.jit(make_train_step(sp_det, matcher, tx, opt, grad_accum=2))
        key = jax.random.PRNGKey(3)
        s1, m1 = step1(state, sp_vars, batch, key)
        s2, m2 = step2(state, sp_vars, dup, key)
        np.testing.assert_allclose(float(m1["train_loss"]),
                                   float(m2["train_loss"]), rtol=1e-5)
        for a, b, p0 in zip(jax.tree_util.tree_leaves(s1.params),
                            jax.tree_util.tree_leaves(s2.params),
                            jax.tree_util.tree_leaves(state.params)):
            # compare the UPDATES (lr * grad), not raw params, so the
            # tolerance scales with the gradient
            # atol floor: (a - p0) quantizes at the PARAM ulp, not the update's
            np.testing.assert_allclose(np.asarray(a - p0), np.asarray(b - p0),
                                       rtol=1e-3, atol=1e-5)

    def test_stage2_step_with_pose_loss(self):
        sp, matcher, tx, opt, state, sp_vars, batch = tiny_setup(pose_loss=True)
        step = jax.jit(make_train_step(sp, matcher, tx, opt))
        new_state, metrics = step(state, sp_vars, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["train_loss"]))
        assert np.isfinite(float(metrics["rot_loss"]))
        # pose_match_ratio ramped by one increment
        np.testing.assert_allclose(float(new_state.pose_match_ratio), 2.5e-5, rtol=1e-5)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        sp, matcher, tx, opt, state, sp_vars, batch = tiny_setup()
        step = jax.jit(make_train_step(sp, matcher, tx, opt))
        state2, _ = step(state, sp_vars, batch, jax.random.PRNGKey(1))
        save_checkpoint(str(tmp_path), "last_model.ckpt", state2, epoch=3,
                        min_val_loss=1.25)
        restored, epoch, min_val, info = load_checkpoint(str(tmp_path), state,
                                                         model_id="last")
        assert epoch == 3 and abs(min_val - 1.25) < 1e-6
        assert not info["missing"] and not info["unexpected"]
        for a, b in zip(jax.tree_util.tree_leaves(state2.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # optimizer state restored too
        for a, b in zip(jax.tree_util.tree_leaves(state2.opt_state),
                        jax.tree_util.tree_leaves(restored.opt_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_stage1_to_stage2_grafting(self, tmp_path):
        # save a stage-1 state (no conf_mlp), load into stage-2 model
        sp1, matcher1, tx1, opt1, state1, sp_vars1, batch = tiny_setup(pose_loss=False)
        save_checkpoint(str(tmp_path), "best_model.ckpt", state1, epoch=9,
                        min_val_loss=0.5)
        sp2, matcher2, tx2, opt2, state2, sp_vars2, _ = tiny_setup(pose_loss=True)
        restored, epoch, _, info = load_checkpoint(str(tmp_path), state2,
                                                   model_id="best",
                                                   load_opt_state=True)
        assert epoch == 9
        # conf_mlp params missing from the ckpt -> kept fresh
        assert any("conf_mlp" in k for k in info["missing"])
        flat_fresh = jax.tree_util.tree_leaves(state2.params["conf_mlp"])
        flat_rest = jax.tree_util.tree_leaves(restored.params["conf_mlp"])
        for a, b in zip(flat_fresh, flat_rest):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # shared params come from the checkpoint
        np.testing.assert_allclose(
            np.asarray(restored.params["kenc"]["dense_0"]["kernel"]),
            np.asarray(state1.params["kenc"]["dense_0"]["kernel"]),
        )
