"""The jitted training step: SuperPoint inference -> GT supervision -> matcher
forward/backward -> guarded optimizer update, as ONE XLA program.

The reference's hot loop (`/root/reference/train.py:405-435`, call stack
SURVEY.md section 3.1) crosses Python between every stage; here the whole step
is a single compiled function, pjit-able over a device mesh (batch sharded on
the "data" axis -- the DDP equivalent; gradient all-reduce is emitted by XLA).
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from e2e_multi_view_matching_tpu.data.gt_matches import gt_matches_all_pairs
from e2e_multi_view_matching_tpu.train.losses import combine_losses, matcher_losses

class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    pose_match_ratio: jnp.ndarray

def create_train_state(params, batch_stats, tx):
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        pose_match_ratio=jnp.zeros(()),
    )

def make_train_step(superpoint, matcher, tx, opt, grad_accum: int = 1,
                    return_grads: bool = False):
    """Build the jitted train step.

    Args:
        superpoint: SuperPoint module (frozen); matcher: MultiViewMatcher module.
        tx: optax transformation from `build_optimizer`.
        opt: config namespace/dataclass with fields `pose_loss`, `rot_weight`,
            `trans_weight`, `final_pose_match_ratio`, `match_reproj_err`,
            `unmatch_reproj_err`, `tuple_size`.
        grad_accum: microbatch count. When > 1, the incoming batch's leading
            dim splits into `grad_accum` microbatches processed by a
            `lax.scan`; microbatch gradients are averaged before the single
            optimizer update. Because the reference loss is sum/batch
            (`helpers.py:241`), the averaged gradient equals the full-batch
            gradient exactly; the compiled program stays one-microbatch-sized
            (the workaround for effective batch >= 10, which the axon tunnel's
            compile helper rejects as a single program -- BASELINE.md round
            3). BatchNorm running stats update once per microbatch (momentum
            0.9 applied `grad_accum` times per step) instead of once.

    Returns:
        train_step(state, sp_variables, batch, rng) -> (state, metrics) where
        batch = dict(images (B, V, H, W, 1), intr (B, V, 3|4, 3|4),
        poses (B, V, 4, 4), depths (B, V, H, W)).
    """
    n_pairs = opt.tuple_size * (opt.tuple_size - 1) // 2
    ratio_increment = 2.5e-5  # `train.py:368`

    def microbatch_grads(params, batch_stats, pose_match_ratio, sp_variables,
                         batch, rng):
        images = batch["images"]
        B, V = images.shape[:2]
        H, W = images.shape[2:4]

        # frozen SuperPoint over all views as one merged batch (`helpers.py:73-96`)
        sp_out = superpoint.apply(
            sp_variables, images.reshape(B * V, H, W, 1), rngs={"keypoints": rng}
        )
        kpts = sp_out["keypoints"].reshape(B, V, -1, 2)
        scores = sp_out["scores"].reshape(B, V, -1)
        descs = sp_out["descriptors"].reshape(B, V, -1, sp_out["descriptors"].shape[-1])
        kpts = jax.lax.stop_gradient(kpts)
        scores = jax.lax.stop_gradient(scores)
        descs = jax.lax.stop_gradient(descs)

        gt_indices, gt_weights = gt_matches_all_pairs(
            kpts, batch["intr"], batch["poses"], batch["depths"],
            opt.match_reproj_err, opt.unmatch_reproj_err,
        )

        image_size = jnp.broadcast_to(
            jnp.asarray([H, W], jnp.float32), (B, V, 2)
        )

        def loss_fn(params):
            out, updates = matcher.apply(
                {"params": params, "batch_stats": batch_stats},
                kpts, scores, descs, image_size,
                train=True, full_output=bool(opt.pose_loss),
                mutable=["batch_stats"],
            )
            losses = matcher_losses(
                out, gt_indices, gt_weights, kpts, batch["intr"], batch["poses"],
                pose_loss=bool(opt.pose_loss),
            )
            total, scaled = combine_losses(
                losses, n_pairs, pose_match_ratio, opt.rot_weight,
                opt.trans_weight,
            )
            return total, (scaled, updates["batch_stats"])

        (total, (scaled, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return grads, total, scaled, new_bs

    def train_step(state, sp_variables, batch, rng):
        if grad_accum == 1:
            grads, total, scaled, new_bs = microbatch_grads(
                state.params, state.batch_stats, state.pose_match_ratio,
                sp_variables, batch, rng,
            )
        else:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((grad_accum, x.shape[0] // grad_accum)
                                    + x.shape[1:]),
                batch,
            )

            def body(carry, xs):
                bs_c, grad_acc, tot_acc, scaled_acc = carry
                mb, idx = xs
                g, tot, scaled_i, bs_n = microbatch_grads(
                    state.params, bs_c, state.pose_match_ratio, sp_variables,
                    mb, jax.random.fold_in(rng, idx),
                )
                grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, g)
                scaled_acc = jax.tree_util.tree_map(jnp.add, scaled_acc, scaled_i)
                return (bs_n, grad_acc, tot_acc + tot, scaled_acc), None

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            zero_s = {"match_loss": jnp.zeros(()), "rot_loss": jnp.zeros(()),
                      "transl_loss": jnp.zeros(())}
            (new_bs, grads, total, scaled), _ = jax.lax.scan(
                body,
                (state.batch_stats, zero_g, jnp.zeros(()), zero_s),
                (micro, jnp.arange(grad_accum)),
            )
            inv = 1.0 / grad_accum
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            total = total * inv
            scaled = jax.tree_util.tree_map(lambda s: s * inv, scaled)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ratio = state.pose_match_ratio
        if opt.pose_loss:
            # ramp (`train.py:414-416`)
            new_ratio = jnp.minimum(
                jnp.where(
                    state.pose_match_ratio < opt.final_pose_match_ratio,
                    state.pose_match_ratio + ratio_increment,
                    state.pose_match_ratio,
                ),
                1.0,
            )

        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            step=state.step + 1,
            pose_match_ratio=new_ratio,
        )
        metrics = {"train_loss": total, **scaled}
        if return_grads:
            # pre-optimizer gradients, for parity tests (multi-process vs
            # single-process comparison must happen BEFORE Adam, which
            # amplifies reduction-order ulps on near-zero grads into
            # sign-flipped lr-sized updates)
            metrics["grads"] = grads
        return new_state, metrics

    return train_step

def make_eval_step(superpoint, matcher, opt):
    """Validation step: same forward path, no update (`Validator.validate`)."""
    n_pairs = opt.tuple_size * (opt.tuple_size - 1) // 2

    def eval_step(state, sp_variables, batch, rng):
        images = batch["images"]
        B, V = images.shape[:2]
        H, W = images.shape[2:4]
        sp_out = superpoint.apply(
            sp_variables, images.reshape(B * V, H, W, 1), rngs={"keypoints": rng}
        )
        kpts = sp_out["keypoints"].reshape(B, V, -1, 2)
        scores = sp_out["scores"].reshape(B, V, -1)
        descs = sp_out["descriptors"].reshape(B, V, -1, sp_out["descriptors"].shape[-1])
        gt_indices, gt_weights = gt_matches_all_pairs(
            kpts, batch["intr"], batch["poses"], batch["depths"],
            opt.match_reproj_err, opt.unmatch_reproj_err,
        )
        image_size = jnp.broadcast_to(jnp.asarray([H, W], jnp.float32), (B, V, 2))
        out = matcher.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            kpts, scores, descs, image_size,
            train=False, full_output=bool(opt.pose_loss),
        )
        losses = matcher_losses(
            out, gt_indices, gt_weights, kpts, batch["intr"], batch["poses"],
            pose_loss=bool(opt.pose_loss),
        )
        total, scaled = combine_losses(
            losses, n_pairs, state.pose_match_ratio, opt.rot_weight, opt.trans_weight
        )
        return {"val_loss": total, **scaled}

    return eval_step
