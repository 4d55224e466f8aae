"""Multi-view 5-tuple benchmark driver.

Mirrors `/root/reference/eval_multi_view.py`: fixed test tuples -> SuperPoint ->
multi-view matcher -> in-process rotation/translation averaging + Schur BA
(no subprocesses, no CSV IPC) -> pairwise pose/rot/transl AUC@5/10/20 -> JSON.
"""

import argparse
import json
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from e2e_multi_view_matching_tpu.data.tuples import MatchingTupleDataset
from e2e_multi_view_matching_tpu.geom.metrics import pose_auc
from e2e_multi_view_matching_tpu.models.matcher import (
    MatcherConfig,
    MultiViewMatcher,
    default_gnn_layers,
)
from e2e_multi_view_matching_tpu.models.superpoint import SuperPoint, SuperPointConfig
from e2e_multi_view_matching_tpu.mvba.pipeline import (
    MultiViewPipelineConfig,
    multi_view_pose_device,
    multi_view_pose_pipeline_batch,
)
from e2e_multi_view_matching_tpu.train.checkpoint import load_checkpoint, load_config
from e2e_multi_view_matching_tpu.train.step import TrainState
from e2e_multi_view_matching_tpu.utils.config import (
    add_generic_arguments,
    get_exp_dir,
    resolve_kernel_impls,
)

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
log = logging.getLogger("eval_multi_view")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Evaluate multi-view",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser = add_generic_arguments(parser)
    parser.add_argument("--exp_name", type=str, default=None)
    parser.add_argument("--test_tuple_file", type=str, default=None,
                        help="CSV of fixed test tuples; defaults to assets/")
    parser.add_argument("--max_tuples", type=int, default=None)
    parser.add_argument("--sinkhorn_iterations", type=int, default=100,
                        help="reference semantics (upstream SuperGlue default "
                             "100). 30 is a ~3x-cheaper opt-in that measured "
                             "lossless on the synthetic quality gate only -- "
                             "not validated on real descriptors")
    parser.add_argument("--eval_batch", type=int, default=8,
                        help="tuples evaluated per device dispatch. NOTE: the "
                             "depth-2 dispatch pipeline keeps TWO chunks' "
                             "inputs + program state resident on device, so "
                             "peak HBM for chunk tensors is ~2x; if a large "
                             "config OOMs, halve eval_batch or pass "
                             "--no_pipeline")
    parser.add_argument("--eval_scan", type=int, default=2,
                        help="sub-chunks per dispatch: each dispatch runs "
                             "eval_scan x eval_batch tuples as a lax.map over "
                             "eval_batch-sized sub-chunks, amortizing the "
                             "per-dispatch host round trip while the compiled "
                             "program stays eval_batch-sized (the measured "
                             "knee: 8 -> 2x8 per dispatch = +10% e2e, "
                             "4x8 = +13%; tools/fused_chunk_probe.py)")
    parser.add_argument("--no_pipeline", action="store_true",
                        help="disable the depth-2 dispatch pipeline (one chunk "
                             "resident at a time; recovers the lower-memory "
                             "sequential behavior at ~1 extra dispatch latency "
                             "per chunk)")
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="shard each eval chunk over this many devices "
                             "(data axis of a jax.sharding.Mesh; the fused "
                             "program runs SPMD, XLA inserts no collectives "
                             "until the final extrinsics gather)")
    parser.add_argument("--init_mode", type=str, default="w8pt_ba",
                        choices=["w8pt_ba", "ransac", "ransac_ba"],
                        help="per-pair relative-pose initialization "
                             "(`bundle_adjust_io.py:12-54`)")
    parser.add_argument("--allow_resampled_tuples", action="store_true",
                        help="permit evaluating freshly sampled tuples when the "
                             "fixed benchmark CSV is absent (NOT the benchmark)")
    parser.add_argument("--allow_random_superpoint", action="store_true",
                        help="permit running with freshly initialized SuperPoint "
                             "weights when superpoint.ckpt is absent (meaningless "
                             "AUC; debugging only)")
    return parser.parse_args(argv)


def write_result(pose_errors, file):
    """AUC table + JSON output (`eval_multi_view.py:70-87`)."""
    thresholds = [5, 10, 20]
    aucs = pose_auc(pose_errors[0], thresholds)
    t_aucs = pose_auc(pose_errors[1], thresholds)
    r_aucs = pose_auc(pose_errors[2], thresholds)
    metrics = {}
    for t, a, ta, ra in zip(thresholds, aucs, t_aucs, r_aucs):
        metrics[f"pose_AUC@{t}deg"] = a * 100.0
        metrics[f"transl_AUC@{t}deg"] = ta * 100.0
        metrics[f"rot_AUC@{t}deg"] = ra * 100.0
    for k, v in metrics.items():
        log.info("%s: %6.3f%%", k, v)
    with open(file, "w") as f:
        json.dump(metrics, f, indent=4)
    return metrics


def evaluate(opt, superpoint, sp_vars, matcher, m_vars, dataset,
             pipeline_cfg=MultiViewPipelineConfig()):
    """Run the benchmark loop; returns (pose, transl, rot) error lists.

    Tuples are evaluated `opt.eval_scan * opt.eval_batch` per dispatch: each
    dispatch lax.maps over `eval_scan` sub-chunks of `eval_batch` tuples
    (SuperPoint + matcher + fused pose pipeline per sub-chunk), so the
    compiled program stays eval_batch-sized while the per-dispatch host round
    trip is amortized over the whole chunk (measured knee: 2x8 per dispatch =
    +10% e2e over 1x8, 4x8 = +13%; `tools/fused_chunk_probe.py`)."""
    pose_errors = ([], [], [])
    V = opt.tuple_size
    fuse = pipeline_cfg.init_mode == "w8pt_ba"
    dp = max(1, getattr(opt, "data_parallel", 1))
    if dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from e2e_multi_view_matching_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_devices=dp, model_parallel=1)
        # chunk arrays carry a leading sub-chunk (scan) axis; the batch axis
        # they shard over is axis 1
        shard_b = NamedSharding(mesh, P(None, "data"))
        rep = NamedSharding(mesh, P())
        sp_vars = jax.device_put(sp_vars, rep)
        m_vars = jax.device_put(m_vars, rep)

        def place(x):
            return jax.device_put(x, shard_b)
    else:
        def place(x):
            return x

    def infer_subchunk(sp_vars, m_vars, images, intr, image_size, rng):
        # images (B, V, H, W, 1) -> one SuperPoint batch over all B*V frames
        B = images.shape[0]
        sp_out = superpoint.apply(
            sp_vars, images.reshape((B * V,) + images.shape[2:]),
            rngs={"keypoints": rng},
        )
        kpts = sp_out["keypoints"].reshape(B, V, -1, 2)
        scores = sp_out["scores"].reshape(B, V, -1)
        descs = sp_out["descriptors"].reshape(B, V, -1, descs_dim)
        out = matcher.apply(m_vars, kpts, scores, descs, image_size)
        if fuse:
            # SuperPoint -> matcher -> COMPLETE pose pipeline (robust relative
            # poses -> device spanning trees -> averaging -> Schur BA) in ONE
            # compiled program: the chunk's only host transfer is the final
            # (B, V, 4, 4) extrinsics fetch
            extr = multi_view_pose_device(
                kpts, intr, out["matches0"], out["conf_scores"], pipeline_cfg)
            return kpts, out["matches0"], out["conf_scores"], extr
        return kpts, out["matches0"], out["conf_scores"], None

    @jax.jit
    def infer(sp_vars, m_vars, images, intr, image_size, rng):
        """Chunk arrays carry a leading (S,) sub-chunk axis: ONE dispatch
        covers S * eval_batch tuples while the compiled program body stays
        eval_batch-sized (lax.map; the tunnel's compile helper rejects flat
        programs past B~8 -- same workaround as the trainer's --grad_accum)."""
        if images.shape[0] == 1:  # preserve the flat single-sub-chunk program
            out = infer_subchunk(sp_vars, m_vars, images[0], intr[0],
                                 image_size[0], rng)
            return jax.tree_util.tree_map(lambda x: x[None], out)
        return jax.lax.map(
            lambda a: infer_subchunk(sp_vars, m_vars, a[0], a[1], a[2], rng),
            (images, intr, image_size))

    descs_dim = matcher.config.descriptor_dim
    rng = jax.random.PRNGKey(0)
    n = len(dataset) if opt.max_tuples is None else min(opt.max_tuples, len(dataset))
    eval_batch = max(1, getattr(opt, "eval_batch", 1))
    scan = max(1, getattr(opt, "eval_scan", 1))
    chunk_len = eval_batch * scan

    def dispatch(lo):
        """Enqueue one chunk; returns (samples, device handle or host array).

        JAX dispatch is asynchronous: keeping one chunk in flight overlaps the
        tunnel's ~25 ms host round trip with device compute (+8% measured
        end-to-end throughput, `tools/fused_pipeline_probe.py`)."""
        idxs = range(lo, min(lo + chunk_len, n))
        samples = [dataset[i] for i in idxs]
        # per-program batch is a dp multiple; the chunk pads to a whole
        # (S, B0) grid so every full chunk reuses one compiled program
        B0 = -(-eval_batch // dp) * dp
        S = -(-len(samples) // B0)
        padded = samples + [samples[-1]] * (S * B0 - len(samples))
        images = place(jnp.asarray(np.stack(
            [s["images"] for s in padded]).reshape(
                (S, B0) + padded[0]["images"].shape)))
        H, W = images.shape[3:5]
        image_size = place(jnp.full((S, B0, V, 2), 0.0)
                           .at[..., 0].set(H).at[..., 1].set(W))
        nonlocal rng
        rng, key = jax.random.split(rng)
        intr_np = np.stack([s["intr"][:, :3, :3] for s in padded])
        intr_b = place(jnp.asarray(intr_np.reshape((S, B0, V, 3, 3))))
        kpts, matches0, conf, extr_dev = infer(
            sp_vars, m_vars, images, intr_b, image_size, key)
        if extr_dev is None:  # unfused init modes: host pipeline, synchronous
            flat = lambda x: x.reshape((S * B0,) + x.shape[2:])
            extr_dev = multi_view_pose_pipeline_batch(
                flat(kpts), jnp.asarray(intr_np), flat(matches0), flat(conf),
                pipeline_cfg)
        return samples, extr_dev

    pipeline = not getattr(opt, "no_pipeline", False)
    chunk_starts = list(range(0, n, chunk_len))
    in_flight = dispatch(chunk_starts[0]) if (chunk_starts and pipeline) else None
    for ci, lo in enumerate(chunk_starts):
        if pipeline:
            samples, extr_dev = in_flight
            if ci + 1 < len(chunk_starts):  # keep the next chunk in flight
                in_flight = dispatch(chunk_starts[ci + 1])
        else:
            samples, extr_dev = dispatch(lo)
        # fused path is (S, B0, V, 4, 4), unfused (S*B0, V, 4, 4); both
        # flatten to chunk order with padding sliced off the tail
        extr_b = np.asarray(extr_dev).reshape(-1, V, 4, 4)[:len(samples)]
        for sample, extr in zip(samples, extr_b):
            for j in range(V):
                for i in range(j):
                    pose0, pose1 = sample["poses"][i], sample["poses"][j]
                    T_gt = np.linalg.inv(pose1) @ pose0
                    T_pred = extr[j] @ np.linalg.inv(extr[i])
                    cos_r = np.clip((np.trace(T_gt[:3, :3].T @ T_pred[:3, :3]) - 1) / 2, -1, 1)
                    err_R = np.degrees(np.arccos(cos_r))
                    nrm = np.linalg.norm(T_gt[:3, 3]) * np.linalg.norm(T_pred[:3, 3])
                    if nrm > 1e-9:
                        err_t = np.degrees(np.arccos(np.clip(
                            T_gt[:3, 3] @ T_pred[:3, 3] / nrm, -1, 1)))
                    else:
                        err_t = 0.0
                    pose_errors[0].append(max(err_t, err_R))
                    pose_errors[1].append(err_t)
                    pose_errors[2].append(err_R)
        log.info("tuple %d/%d done", min(lo + chunk_len, n), n)
    return pose_errors


def main(argv=None):
    opt = resolve_kernel_impls(parse_args(argv))
    exp_dir, _ = get_exp_dir(opt.checkpoint_dir, opt.exp_name)
    train_cfg = load_config(exp_dir)
    # inherit superpoint/GNN params from the training config (`eval_multi_view.py:120-129`)
    opt.remove_borders = train_cfg["remove_borders"]
    opt.nms_radius = train_cfg["nms_radius"]
    opt.keypoint_threshold = train_cfg["keypoint_threshold"]
    opt.cross_attention_layers = train_cfg["cross_attention_layers"]
    opt.gnn_layers = train_cfg["gnn_layers"]
    opt.max_keypoints = 2048 if "megadepth" in opt.dataset else 1024  # `:114-117`

    superpoint = SuperPoint(SuperPointConfig(
        nms_radius=opt.nms_radius, keypoint_threshold=opt.keypoint_threshold,
        max_keypoints=opt.max_keypoints, remove_borders=opt.remove_borders,
        fill_with_random_keypoints=False, compute_dtype=opt.compute_dtype,
    ))
    matcher = MultiViewMatcher(MatcherConfig(
        gnn_layers=default_gnn_layers(opt.gnn_layers, opt.cross_attention_layers),
        sinkhorn_iterations=opt.sinkhorn_iterations,
        conf_mlp=True, multi_frame_matching=True,
        attention_impl=opt.attention_impl, sinkhorn_impl=opt.sinkhorn_impl,
        compute_dtype=opt.compute_dtype,
    ))

    key = jax.random.PRNGKey(0)
    V = opt.tuple_size
    m_vars = matcher.init(
        key, jnp.zeros((1, V, opt.max_keypoints, 2)), jnp.zeros((1, V, opt.max_keypoints)),
        jnp.zeros((1, V, opt.max_keypoints, 256)), jnp.full((1, V, 2), 64.0),
    )
    import optax

    state = TrainState(m_vars["params"], m_vars["batch_stats"],
                       optax.identity().init(m_vars["params"]),
                       jnp.zeros((), jnp.int32), jnp.zeros(()))
    state, _, _, _ = load_checkpoint(exp_dir, state, model_id=None,
                                     load_opt_state=False)
    m_vars = {"params": state.params, "batch_stats": state.batch_stats}
    # SuperPoint weights: load from exp_dir/superpoint.ckpt if present (imported
    # pretrained weights), else random (see models/torch_import.py).
    sp_path = os.path.join(exp_dir, "superpoint.ckpt")
    sample_key = {"params": key, "keypoints": key}
    sp_vars = superpoint.init(sample_key, jnp.zeros((V, 64, 64, 1)))
    if os.path.exists(sp_path):
        from flax import serialization

        with open(sp_path, "rb") as f:
            sp_vars = serialization.from_bytes(sp_vars, f.read())
    elif not opt.allow_random_superpoint:
        raise FileNotFoundError(
            f"SuperPoint weights not found: {sp_path}. A benchmark run with "
            "random detector weights is meaningless; import pretrained weights "
            "(models/torch_import.py) or pass --allow_random_superpoint."
        )
    else:
        log.warning("superpoint.ckpt absent; using RANDOM SuperPoint weights")

    dataset_dir = os.path.join(opt.data_dir, opt.dataset)
    test_dataset = MatchingTupleDataset(
        dataset_dir, split="test", tuple_size=opt.tuple_size, shuffle_tuple=False,
        n_samples=1,
    )
    tuple_file = opt.test_tuple_file or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "assets",
        f"{opt.dataset.split('_')[0]}_test_5tuples.csv",
    )
    if os.path.exists(tuple_file):
        test_dataset.read_sampled_tuples(tuple_file)
    elif opt.test_tuple_file is not None or not opt.allow_resampled_tuples:
        # The benchmark is defined by the fixed tuple list (reference
        # `assets/*_test_5tuples.csv`); silently resampling would measure a
        # different thing. Opt in explicitly to evaluate on fresh tuples.
        raise FileNotFoundError(
            f"fixed test-tuple CSV not found: {tuple_file}. Pass "
            "--test_tuple_file or --allow_resampled_tuples to evaluate on "
            "freshly sampled (non-benchmark) tuples."
        )
    else:
        log.warning("no fixed tuple CSV; evaluating on RESAMPLED tuples "
                    "(not the reference benchmark)")
    log.info("loaded %d test tuples", len(test_dataset))

    pose_errors = evaluate(
        opt, superpoint, sp_vars, matcher, m_vars, test_dataset,
        pipeline_cfg=MultiViewPipelineConfig(init_mode=opt.init_mode),
    )
    out_json = os.path.join(exp_dir, f"multi_view_{opt.dataset.split('_')[0]}.json")
    return write_result(pose_errors, out_json)


if __name__ == "__main__":
    main()
