"""Training driver: the reference's `train.py` re-built around one jitted step.

Usage (mirrors `/root/reference/README.md:107,144`):
    python -m e2e_multi_view_matching_tpu.cli.train \
        --data_dir ... --checkpoint_dir ... --dataset scannet --tuple_size 5 \
        --batch_size 8 [--pose_loss --init_exp_name <stage1>] [--exp_name <resume>]

Distributed: data parallelism runs over all local devices of a
`jax.sharding.Mesh` (plus `--model_parallel` for tensor parallelism); multi-host
jobs call `jax.distributed.initialize()` first (`--multi_host`). The LR scaling
law sees the global batch (devices x batch), like the reference's DDP world
size (`train.py:23-34,279`).
"""

import argparse
import datetime
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from e2e_multi_view_matching_tpu.data.sampling import create_sequential_subsets
from e2e_multi_view_matching_tpu.data.tuples import MatchingTupleDataset, batch_iterator
from e2e_multi_view_matching_tpu.models.matcher import (
    MatcherConfig,
    MultiViewMatcher,
    default_gnn_layers,
)
from e2e_multi_view_matching_tpu.models.superpoint import SuperPoint, SuperPointConfig
from e2e_multi_view_matching_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_state,
)
from e2e_multi_view_matching_tpu.train.checkpoint import (
    load_checkpoint,
    load_config,
    save_checkpoint,
    save_config,
)
from e2e_multi_view_matching_tpu.train.optim import build_optimizer, scale_lr
from e2e_multi_view_matching_tpu.train.step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from e2e_multi_view_matching_tpu.utils.config import (
    add_generic_arguments,
    apply_dataset_defaults,
    get_exp_dir,
)
from e2e_multi_view_matching_tpu.utils.tblog import StepProfiler, TBWriter
from e2e_multi_view_matching_tpu.utils.trackers import MeanTracker, TimeTracker

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
log = logging.getLogger("train")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Training multi-view matcher (TPU)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser = add_generic_arguments(parser)
    parser.add_argument("--exp_name", type=str, default=None,
                        help="experiment to resume; None starts a new run")
    parser.add_argument("--init_exp_name", type=str, default=None,
                        help="experiment to initialize parameters from")
    parser.add_argument("--batch_size", type=int, default=8,
                        help="per-process batch size")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="gradient-accumulation microbatches per step: the "
                        "effective batch is batch_size * grad_accum (feeds the "
                        "LR scaling law); the compiled program stays one "
                        "microbatch in size")
    parser.add_argument("--pose_loss", action="store_true", help="apply a pose loss")
    parser.add_argument("--final_pose_match_ratio", type=float, default=0.99)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--decay_rate", type=float, default=0.999992)
    parser.add_argument("--n_epochs", type=int, default=1000)
    parser.add_argument("--i_train", type=int, default=100,
                        help="log train statistics every n iterations")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="tensor-parallel axis size")
    parser.add_argument("--multi_host", action="store_true",
                        help="call jax.distributed.initialize()")
    parser.add_argument("--sinkhorn_iterations", type=int, default=100)
    parser.add_argument("--max_steps", type=int, default=None,
                        help="stop after N optimizer steps (smoke testing)")
    parser.add_argument("--val_every_epoch", type=int, default=1)
    parser.add_argument("--no_tensorboard", action="store_true")
    parser.add_argument("--profile_steps", type=str, default=None,
                        help="'start,end' step window for a jax.profiler trace")
    parser.add_argument("--dump_first_grad", type=str, default=None,
                        help="debug: save the FIRST step's pre-optimizer "
                             "gradients to this .npz (parity testing; each "
                             "process appends _p<idx>)")
    return parser.parse_args(argv)


def build_models(opt):
    superpoint = SuperPoint(SuperPointConfig(
        nms_radius=opt.nms_radius,
        keypoint_threshold=opt.keypoint_threshold,
        max_keypoints=opt.max_keypoints,
        remove_borders=opt.remove_borders,
        fill_with_random_keypoints=True,
        compute_dtype=getattr(opt, "compute_dtype", "float32"),
    ))
    matcher = MultiViewMatcher(MatcherConfig(
        gnn_layers=default_gnn_layers(opt.gnn_layers, opt.cross_attention_layers),
        sinkhorn_iterations=opt.sinkhorn_iterations,
        conf_mlp=bool(opt.pose_loss),
        multi_frame_matching=opt.tuple_size > 2,
        attention_impl=opt.attention_impl, sinkhorn_impl=opt.sinkhorn_impl,
        compute_dtype=getattr(opt, "compute_dtype", "float32"),
    ))
    return superpoint, matcher


def main(argv=None):
    opt = parse_args(argv)
    if opt.multi_host:
        jax.distributed.initialize()
    mesh = make_mesh(model_parallel=opt.model_parallel)
    n_data = mesh.shape["data"]
    log.info("devices: %d (data=%d, model=%d)", len(jax.devices()), n_data,
             mesh.shape["model"])

    apply_dataset_defaults(opt)
    # the LR law sees the EFFECTIVE global batch: per-process batch x
    # accumulation x data-parallel width (`train.py:23-34`'s ngpus factor)
    opt.lr, opt.decay_rate, opt.start_decay, opt.end_decay = scale_lr(
        opt.tuple_size, opt.batch_size * opt.grad_accum, n_data, opt.lr,
        opt.decay_rate, opt.start_decay, opt.end_decay, opt.dataset,
    )

    resume = opt.exp_name is not None
    is_main = jax.process_index() == 0
    if resume:
        exp_dir, cfg_json = get_exp_dir(opt.checkpoint_dir, opt.exp_name)
        cfg = load_config(exp_dir)
        for k, v in cfg.items():
            if k not in ("exp_name",):
                setattr(opt, k, v)
        opt.exp_name = os.path.basename(exp_dir)
    else:
        opt.exp_name = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        exp_dir, _ = get_exp_dir(opt.checkpoint_dir, opt.exp_name)
        if is_main:
            save_config(exp_dir, {k: v for k, v in vars(opt).items()})
    log.info("experiment %s", opt.exp_name)
    tb = TBWriter(opt.checkpoint_dir, opt.exp_name,
                  enabled=is_main and not opt.no_tensorboard)
    if opt.profile_steps:
        p_start, p_end = (int(x) for x in opt.profile_steps.split(","))
        profiler = StepProfiler(os.path.join(exp_dir, "profile"), p_start, p_end)
    else:
        profiler = StepProfiler(None, None, None)

    # data
    dataset_dir = os.path.join(opt.data_dir, opt.dataset)
    train_dataset = MatchingTupleDataset(
        dataset_dir, split="train", tuple_size=opt.tuple_size,
        n_samples=opt.n_samples, jitter=opt.color_jitter,
    )
    val_dataset = MatchingTupleDataset(
        dataset_dir, split="val", tuple_size=opt.tuple_size, n_samples=opt.n_samples,
    )
    log.info("loaded %d train / %d val tuples", len(train_dataset), len(val_dataset))
    global_batch = opt.batch_size * n_data * opt.grad_accum

    # models / state
    superpoint, matcher = build_models(opt)
    sample = train_dataset[0]
    V = opt.tuple_size
    H, W = sample["images"].shape[1:3]
    key = jax.random.PRNGKey(0)
    sp_vars = superpoint.init(
        {"params": key, "keypoints": key}, jnp.zeros((V, H, W, 1))
    )
    m_vars = matcher.init(
        key,
        jnp.zeros((1, V, opt.max_keypoints, 2)),
        jnp.zeros((1, V, opt.max_keypoints)),
        jnp.zeros((1, V, opt.max_keypoints, 256)),
        jnp.full((1, V, 2), float(H)),
    )
    tx = build_optimizer(
        opt.lr, opt.decay_rate, opt.start_decay, opt.end_decay,
        pose_loss=opt.pose_loss, grad_clip=opt.grad_clip,
    )
    state = create_train_state(m_vars["params"], m_vars["batch_stats"], tx)

    start_epoch = 0
    min_val_loss = 1e6
    if resume:
        state, epoch, min_val_loss, info = load_checkpoint(exp_dir, state, model_id="last")
        start_epoch = epoch + 1
        log.info("resumed from epoch %d (missing=%s)", epoch, info["missing"])
    elif opt.init_exp_name is not None:
        init_dir, _ = get_exp_dir(opt.checkpoint_dir, opt.init_exp_name)
        state, epoch, _, info = load_checkpoint(
            init_dir, state, model_id="best", load_opt_state=opt.pose_loss
        )
        if opt.pose_loss:
            start_epoch = epoch + 1
        log.info("initialized from %s (missing=%s)", opt.init_exp_name, info["missing"])

    train_step = jax.jit(make_train_step(superpoint, matcher, tx, opt,
                                         grad_accum=opt.grad_accum,
                                         return_grads=bool(opt.dump_first_grad)))
    eval_step = jax.jit(make_eval_step(superpoint, matcher, opt))

    # each process feeds its slice of the global batch (DistributedSampler role)
    proc_idx, proc_cnt = jax.process_index(), jax.process_count()
    with mesh:
        # params + optimizer moments tp-sharded over "model" (replicated when
        # --model_parallel 1); the frozen SuperPoint stays replicated
        state = shard_state(state, mesh)
        sp_vars = replicate(sp_vars, mesh)

        val_subsets = create_sequential_subsets(len(val_dataset), 60000)
        val_subset_idx = 0
        rng_key = jax.random.PRNGKey(1)
        time_tracker = TimeTracker()
        metrics_tracker = MeanTracker()
        global_step = int(state.step)
        start_step = global_step
        for epoch in range(start_epoch, opt.n_epochs):
            if epoch > start_epoch:
                train_dataset.start_epoch()
            time_tracker.start_epoch()
            for i, batch in enumerate(batch_iterator(
                train_dataset, global_batch, shuffle=True, seed=epoch,
                process_index=proc_idx, process_count=proc_cnt,
            )):
                time_tracker.start_batch()
                rng_key, step_key = jax.random.split(rng_key)
                device_batch = shard_batch(
                    {k: batch[k] for k in ("images", "intr", "poses", "depths")}, mesh
                )
                profiler.maybe_start(global_step)
                state, metrics = train_step(state, sp_vars, device_batch, step_key)
                if opt.dump_first_grad:
                    grads = metrics.pop("grads")
                    if global_step == start_step:
                        flat = {
                            f"g{i}": np.asarray(jax.device_get(
                                leaf.addressable_data(0)))
                            for i, leaf in enumerate(
                                jax.tree_util.tree_leaves(grads))
                        }
                        np.savez(f"{opt.dump_first_grad}_p{proc_idx}.npz",
                                 **flat)
                metrics_tracker.add({k: float(v) for k, v in metrics.items()})
                time_tracker.finish_batch()
                global_step += 1
                profiler.maybe_stop(global_step)
                if is_main and (i + 1) % opt.i_train == 0:
                    log.info(
                        "epoch %3d it %5d | batch %.3fs | loss %.4f",
                        epoch, i + 1, time_tracker.get_batch_time(),
                        metrics_tracker.get("train_loss"),
                    )
                    tb.scalars("loss", {"train": metrics_tracker.get("train_loss")},
                               global_step)
                    if opt.pose_loss:
                        for k in ("match_loss", "rot_loss", "transl_loss"):
                            if metrics_tracker.has(k):
                                tb.scalars(k, {"train": metrics_tracker.get(k)},
                                           global_step)
                    metrics_tracker.reset()
                if opt.max_steps is not None and global_step >= opt.max_steps:
                    break

            # validation + checkpointing (Validator semantics, `train.py:42-131`)
            val_metrics = MeanTracker()
            subset = val_subsets[val_subset_idx]
            val_subset_idx = (val_subset_idx + 1) % len(val_subsets)
            for batch in batch_iterator(
                val_dataset, global_batch, shuffle=False, indices=subset.copy(),
                process_index=proc_idx, process_count=proc_cnt,
            ):
                rng_key, step_key = jax.random.split(rng_key)
                device_batch = shard_batch(
                    {k: batch[k] for k in ("images", "intr", "poses", "depths")}, mesh
                )
                m = eval_step(state, sp_vars, device_batch, step_key)
                val_metrics.add({k: float(v) for k, v in m.items()})
            # val_loss is already the GLOBAL mean: eval_step consumes the
            # globally sharded batch under jit, so the scalar it returns is
            # replicated across processes -- the single-controller equivalent
            # of the reference's explicit all_reduce (`train.py:105`).
            val_loss = val_metrics.get("val_loss") if val_metrics.has("val_loss") else float("inf")
            if is_main:
                log.info("epoch %3d | val loss %.4f", epoch, val_loss)
                tb.scalars("loss", {"val": val_loss}, global_step)
                # validation-side component scalars (`train.py:112-121`)
                for k in ("match_loss", "rot_loss", "transl_loss"):
                    if val_metrics.has(k):
                        tb.scalars(k, {"val": val_metrics.get(k)}, global_step)
                names = ["last_model.ckpt", f"{epoch:06d}_model.ckpt"]
                if val_loss < min_val_loss:
                    min_val_loss = val_loss
                    names.append("best_model.ckpt")
                for name in names:
                    save_checkpoint(exp_dir, name, state, epoch, val_loss)
            if opt.max_steps is not None and global_step >= opt.max_steps:
                break
    return state


if __name__ == "__main__":
    main()
