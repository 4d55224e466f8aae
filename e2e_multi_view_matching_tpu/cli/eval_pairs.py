"""Two-view 1500-pair benchmark driver.

Mirrors `/root/reference/eval_pairs.py`: fixed pair lists -> SuperPoint ->
two-view matcher (conf MLP) -> relative pose via one of four modes
(`ransac`, `ransac_ba`, `w8pt`, `w8pt_ba`) -> pose AUC@5/10/20 -> JSON.

The `ransac*` modes use OpenCV RANSAC on the host (the role of the reference's
`models/utils.estimate_pose`); the `w8pt*` modes run the fully differentiable
TPU path.
"""

import argparse
import json
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from e2e_multi_view_matching_tpu.data.pairs import PairMatchingDataset
from e2e_multi_view_matching_tpu.geom.eightpoint import estimate_relative_pose_w8pt
from e2e_multi_view_matching_tpu.geom.metrics import pose_auc
from e2e_multi_view_matching_tpu.geom.ransac import estimate_pose_ransac
from e2e_multi_view_matching_tpu.models.matcher import (
    MatcherConfig,
    MultiViewMatcher,
    default_gnn_layers,
)
from e2e_multi_view_matching_tpu.models.superpoint import SuperPoint, SuperPointConfig
from e2e_multi_view_matching_tpu.pose.two_view_ba import bundle_adjust_two_view
from e2e_multi_view_matching_tpu.train.checkpoint import load_checkpoint
from e2e_multi_view_matching_tpu.train.step import TrainState
from e2e_multi_view_matching_tpu.utils.config import (
    add_generic_arguments,
    get_exp_dir,
    resolve_kernel_impls,
)

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
log = logging.getLogger("eval_pairs")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Evaluate image pairs",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser = add_generic_arguments(parser)
    parser.add_argument("--exp_name", type=str, default=None)
    parser.add_argument("--eval_mode", type=str, default="w8pt_ba",
                        choices=["ransac", "ransac_ba", "w8pt", "w8pt_ba",
                                 "w8pt_irls_ba"])
    parser.add_argument("--max_pairs", type=int, default=None)
    parser.add_argument("--sinkhorn_iterations", type=int, default=100,
                        help="reference semantics (upstream SuperGlue default "
                             "100). 30 is a ~3x-cheaper opt-in that measured "
                             "lossless on the synthetic quality gate only -- "
                             "not validated on real descriptors")
    parser.add_argument("--eval_batch", type=int, default=8,
                        help="same-bucket pairs per compiled sub-chunk")
    parser.add_argument("--eval_scan", type=int, default=2,
                        help="sub-chunks per dispatch: each dispatch lax.maps "
                             "eval_scan sub-chunks of eval_batch pairs, "
                             "amortizing the per-dispatch host round trip "
                             "while the compiled program stays "
                             "eval_batch-sized (knee measured on the fused "
                             "multi-view path: 2x8 = +10%, 4x8 = +13% e2e; "
                             "tools/fused_chunk_probe.py)")
    parser.add_argument("--shape_bucket", type=int, default=128,
                        help="pad images up to multiples of this so "
                             "variable-shape datasets (megadepth/yfcc resize "
                             "to long side 1600 -> dozens of exact shapes) "
                             "compile O(buckets) programs with full chunks "
                             "instead of O(shapes); SuperPoint masks the pad "
                             "region before NMS. 0 = exact-shape chunks")
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="shard each w8pt-mode chunk over this many "
                             "devices (data axis of a jax.sharding.Mesh)")
    parser.add_argument("--assets_dir", type=str, default=None,
                        help="directory holding the LoFTR/SuperGlue pair lists "
                             "(default: <repo>/assets)")
    parser.add_argument("--allow_random_superpoint", action="store_true",
                        help="permit running with freshly initialized SuperPoint "
                             "weights when superpoint.ckpt is absent (meaningless "
                             "AUC; debugging only)")
    return parser.parse_args(argv)


def relative_pose_errors(T_gt, R, t):
    cos_r = np.clip((np.trace(T_gt[:3, :3].T @ R) - 1) / 2, -1, 1)
    err_R = np.degrees(np.arccos(cos_r))
    n = np.linalg.norm(T_gt[:3, 3]) * np.linalg.norm(t)
    err_t = (
        np.degrees(np.arccos(np.clip(T_gt[:3, 3] @ t / n, -1, 1))) if n > 1e-9 else 0.0
    )
    return err_t, err_R


def evaluate(opt, superpoint, sp_vars, matcher, m_vars, dataset):
    """Benchmark loop over pairs; returns (errors, failures, n_signatures).

    Pairs are grouped into SHAPE BUCKETS (dims rounded up to multiples of
    `opt.shape_bucket`, images zero-padded onto the bucket canvas, SuperPoint
    masking scores beyond each image's true extent): same-bucket pairs run
    `opt.eval_scan * opt.eval_batch` per dispatch -- a lax.map over
    eval_batch-sized compiled sub-chunks with ONE packed device->host fetch
    (the reference's loop ran per pair -- `eval_pairs.py:210`). Variable-shape datasets (megadepth/yfcc, aspect-
    preserving resize to long side 1600) therefore compile O(bucket pairs)
    programs with full chunks instead of O(exact shapes) with chunks of ~1.
    Host RANSAC stays per-pair.
    """
    # conf threshold: ransac modes filter at 0.02, weighted modes use all
    # (`eval_pairs.py:152`)
    match_threshold = 0.02 if "ransac" in opt.eval_mode else 0.0
    pose_errors = {}
    cannot_compute = 0
    dp = max(1, getattr(opt, "data_parallel", 1))
    if dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from e2e_multi_view_matching_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_devices=dp, model_parallel=1)
        # chunk arrays carry a leading sub-chunk (scan) axis; the batch axis
        # they shard over is axis 1
        shard_b = NamedSharding(mesh, P(None, "data"))
        sp_vars = jax.device_put(sp_vars, NamedSharding(mesh, P()))
        m_vars = jax.device_put(m_vars, NamedSharding(mesh, P()))

        def place(x):
            return jax.device_put(x, shard_b)
    else:
        def place(x):
            return x

    def infer_batch_body(images0, images1, image_size, valid0, valid1):
        """(B, H0, W0, 1) x (B, H1, W1, 1) -> per-pair matcher outputs.

        `valid0/1` are the per-image true (h, w) extents; images are padded
        with zeros up to the chunk's bucket shape and SuperPoint masks scores
        beyond the extent. The matcher normalizes keypoints by the TRUE
        image_size, so bucketing is invisible downstream."""
        sp0 = superpoint.apply(sp_vars, images0, valid0)
        sp1 = superpoint.apply(sp_vars, images1, valid1)
        kpts = jnp.stack([sp0["keypoints"], sp1["keypoints"]], axis=1)
        scores = jnp.stack([sp0["scores"], sp1["scores"]], axis=1)
        descs = jnp.stack([sp0["descriptors"], sp1["descriptors"]], axis=1)
        out = matcher.apply(m_vars, kpts, scores, descs, image_size)
        return kpts, out["matches0"][:, 0], out["conf_scores"][:, 0]

    def infer_pose_body(images0, images1, image_size, valid0, valid1, K0, K1):
        """SuperPoint -> matcher -> batched w8pt-family pose in ONE program.

        The w8pt eval modes are fully traceable, so the whole sub-chunk runs
        on device with a single packed result (the ransac modes keep the
        split path -- host OpenCV sits in the middle)."""
        kpts, matches, conf = infer_batch_body(images0, images1, image_size,
                                               valid0, valid1)
        conf_mask = (matches >= 0) & (conf > match_threshold)
        conf_w = jnp.where(conf_mask, conf, 0.0)
        gather = jnp.clip(matches, 0, kpts.shape[2] - 1)
        mk1 = jnp.take_along_axis(kpts[:, 1], gather[..., None], axis=1)
        T_pred, valid_p = pose_w8pt_batch(kpts, mk1, K0, K1, conf_w)
        return jnp.concatenate(
            [jnp.ravel(T_pred), valid_p.astype(jnp.float32).ravel()])

    def _scanned(body):
        """Wrap a sub-chunk body: inputs carry a leading (S,) sub-chunk axis
        and ONE dispatch covers S * eval_batch pairs, lax.map keeping the
        compiled program eval_batch-sized (the tunnel's compile helper rejects
        flat programs past B~8 -- same workaround as the trainer's
        --grad_accum)."""
        @jax.jit
        def run(*args):
            if args[0].shape[0] == 1:  # preserve the flat one-sub-chunk program
                out = body(*(a[0] for a in args))
                return jax.tree_util.tree_map(lambda x: x[None], out)
            return jax.lax.map(lambda a: body(*a), args)
        return run

    infer_batch = _scanned(infer_batch_body)
    infer_pose_batch = _scanned(infer_pose_body)

    def pose_w8pt_batch(kpts, mk1, K0, K1, conf_w):
        """Batched w8pt / w8pt_ba / w8pt_irls_ba over a chunk."""
        if opt.eval_mode == "w8pt_irls_ba":
            # robust variant (beyond the reference): epipolar-inlier-gated
            # IRLS re-estimation + BA; AUC@20 14.9 -> 70.0 on the synthetic
            # oracle benchmark vs the plain weighted solve
            from e2e_multi_view_matching_tpu.mvba.pipeline import (
                robust_relative_poses,
            )

            T_rel, _, valid_r, _ = robust_relative_poses(
                kpts[:, 0], mk1, K0, K1, conf_w, 10
            )
            return T_rel, valid_r
        T_w8, info = estimate_relative_pose_w8pt(
            kpts[:, 0], mk1, K0, K1, conf_w, determine_inliers=True
        )
        T_pred = T_w8
        if opt.eval_mode == "w8pt_ba":
            conf_ba = jnp.where(info.pos_depth_mask, info.confidence, 0.0)
            T_ba, ok = bundle_adjust_two_view(
                info.kpts0_norm, info.kpts1_norm, conf_ba, T_w8, n_iterations=10
            )
            T_pred = jnp.where(ok[:, None, None], T_ba, T_w8)
        return T_pred, info.valid

    n_signatures = set()  # distinct compiled-program signatures (stats)

    def dispatch(chunk, buckets):
        """Enqueue one chunk's device work; no host fetch yet.

        JAX dispatch is asynchronous, so keeping one dispatched chunk in
        flight while the previous chunk's results are fetched/post-processed
        overlaps the tunnel's ~25 ms round trip (and the host RANSAC loop)
        with device compute (`tools/fused_pipeline_probe.py`)."""
        idxs = [c[0] for c in chunk]
        datas = [c[1] for c in chunk]
        w8pt = opt.eval_mode.startswith("w8pt")
        # pad every chunk to a full (S, B0) grid (B0 = eval_batch padded to a
        # device multiple) so each bucket pair compiles exactly ONE program
        # regardless of tail length; padded slots repeat the last pair and
        # are sliced away on collect
        eval_batch = max(1, getattr(opt, "eval_batch", 1))
        B0 = -(-eval_batch // dp) * dp
        S = -(-len(datas) // B0)
        pdatas = datas + [datas[-1]] * (S * B0 - len(datas))
        n_signatures.add((buckets, S, B0))

        def canvas(img, bucket):
            h, w = img.shape[:2]
            bh, bw = bucket
            if (h, w) == (bh, bw):
                return img
            out = np.zeros((bh, bw) + img.shape[2:], img.dtype)
            out[:h, :w] = img
            return out

        def pl(arr, dtype=None):
            a = np.asarray(arr, dtype=dtype)
            return place(jnp.asarray(a.reshape((S, B0) + a.shape[1:])))

        images0 = pl(np.stack([canvas(d["image0"], buckets[0]) for d in pdatas]))
        images1 = pl(np.stack([canvas(d["image1"], buckets[1]) for d in pdatas]))
        valid0 = pl([d["image0"].shape[:2] for d in pdatas], np.int32)
        valid1 = pl([d["image1"].shape[:2] for d in pdatas], np.int32)
        sizes = pl([[d["image0"].shape[:2], d["image1"].shape[:2]]
                    for d in pdatas], np.float32)
        K0 = np.stack([d["intr0"][:3, :3] for d in pdatas])
        K1 = np.stack([d["intr1"][:3, :3] for d in pdatas])
        if w8pt:
            handle = infer_pose_batch(
                images0, images1, sizes, valid0, valid1, pl(K0), pl(K1))
        else:
            handle = infer_batch(images0, images1, sizes, valid0, valid1)
        return idxs, datas, (S, B0), K0, K1, handle

    def collect(state):
        nonlocal cannot_compute
        idxs, datas, (S, B0), K0, K1, handle = state
        w8pt = opt.eval_mode.startswith("w8pt")
        rets = [None] * len(datas)
        if w8pt:
            # fully on-device: one dispatch + one packed fetch per chunk
            B = len(datas)
            packed = np.asarray(handle).reshape(S, -1)
            T_pred = packed[:, : B0 * 16].reshape(S * B0, 4, 4)
            valid_p = packed[:, B0 * 16:].reshape(S * B0) > 0.5
            for b in range(B):
                if bool(valid_p[b]):
                    rets[b] = (T_pred[b][:3, :3], T_pred[b][:3, 3], None)
        else:
            kpts_b, matches_b, conf_b = handle
            kpts_b = np.asarray(kpts_b)
            kpts_b = kpts_b.reshape((-1,) + kpts_b.shape[2:])
            matches_b = np.asarray(matches_b)
            matches_b = matches_b.reshape((-1,) + matches_b.shape[2:])
            conf_b = np.asarray(conf_b)
            conf_b = conf_b.reshape((-1,) + conf_b.shape[2:])
            conf_mask = (matches_b >= 0) & (conf_b > match_threshold)
            for b in range(len(datas)):
                kpts, matches, conf = kpts_b[b], matches_b[b], conf_b[b]
                mk0 = kpts[0][conf_mask[b]]
                mk1 = kpts[1][np.clip(matches, 0, len(kpts[1]) - 1)][conf_mask[b]]
                ret = estimate_pose_ransac(mk0, mk1, K0[b], K1[b])
                if ret is not None and opt.eval_mode == "ransac_ba":
                    R, t, inliers = ret
                    T_init = np.eye(4, dtype=np.float32)
                    T_init[:3, :3] = R
                    T_init[:3, 3] = t
                    k0n = (mk0[inliers] - K0[b][[0, 1], [2, 2]]) / K0[b][[0, 1], [0, 1]]
                    k1n = (mk1[inliers] - K1[b][[0, 1], [2, 2]]) / K1[b][[0, 1], [0, 1]]
                    cba = conf[conf_mask[b]][inliers]
                    T_ref, ok = bundle_adjust_two_view(
                        jnp.asarray(k0n[None].astype(np.float32)),
                        jnp.asarray(k1n[None].astype(np.float32)),
                        jnp.asarray(cba[None]), jnp.asarray(T_init[None]),
                        n_iterations=10,
                    )
                    if bool(ok[0]):
                        T_np = np.asarray(T_ref[0])
                        ret = (T_np[:3, :3], T_np[:3, 3], inliers)
                rets[b] = ret

        for b, (i, data) in enumerate(zip(idxs, datas)):
            if rets[b] is None:
                err_t, err_R = np.inf, np.inf
                cannot_compute += 1
            else:
                err_t, err_R = relative_pose_errors(
                    data["T021"], rets[b][0], rets[b][1]
                )
                log.info("%4d: rot %5.1f deg\tt %5.1f deg", i, err_R, err_t)
            pose_errors[i] = max(err_t, err_R)

    n = len(dataset) if opt.max_pairs is None else min(opt.max_pairs, len(dataset))
    eval_batch = max(1, getattr(opt, "eval_batch", 1))
    chunk_len = eval_batch * max(1, getattr(opt, "eval_scan", 1))
    bucket = max(0, getattr(opt, "shape_bucket", 128))
    in_flight = None  # one dispatched chunk kept in flight (depth-2 pipeline)

    def bucket_of(shape):
        if bucket <= 0:
            return tuple(shape[:2])
        return tuple(-(-d // bucket) * bucket for d in shape[:2])

    def flush(chunk, buckets):
        nonlocal in_flight
        if not chunk:
            return
        state = dispatch(chunk, buckets)
        if in_flight is not None:
            collect(in_flight)
        in_flight = state

    # one open chunk per bucket pair: same-bucket pairs coalesce into full
    # chunks even when differently-shaped pairs interleave in dataset order
    # (megadepth/yfcc), so compile count is O(bucket pairs), not O(shapes)
    open_chunks = {}
    for i in range(n):
        data = dataset[i]
        key = (bucket_of(data["image0"].shape), bucket_of(data["image1"].shape))
        c = open_chunks.setdefault(key, [])
        c.append((i, data))
        if len(c) >= chunk_len:
            flush(c, key)
            open_chunks[key] = []
    for key, c in open_chunks.items():
        flush(c, key)
    if in_flight is not None:
        collect(in_flight)
    log.info("compiled signatures: %d (shape_bucket=%d)", len(n_signatures),
             bucket)
    return [pose_errors[i] for i in range(n)], cannot_compute, len(n_signatures)


def main(argv=None):
    opt = resolve_kernel_impls(parse_args(argv))
    source_dir = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    assets = opt.assets_dir or os.path.join(source_dir, "assets")
    # dataset-specific pair lists + superpoint params (`eval_pairs.py:155-180`)
    if "megadepth" in opt.dataset:
        d = os.path.join(assets, "megadepth_test_1500_scene_info")
        input_files = [os.path.join(d, f) for f in (
            "0015_0.1_0.3.npz", "0015_0.3_0.5.npz", "0022_0.1_0.3.npz",
            "0022_0.3_0.5.npz", "0022_0.5_0.7.npz")]
        opt.max_keypoints, opt.nms_radius, opt.keypoint_threshold = 2048, 3, 0.005
        img_size, ds_key = 1600, "megadepth"
    elif "yfcc100m" in opt.dataset:
        input_files = [os.path.join(assets, "yfcc_test_pairs_with_gt.txt")]
        opt.max_keypoints, opt.nms_radius, opt.keypoint_threshold = 2048, 3, 0.005
        img_size, ds_key = 1600, "yfcc100m"
    else:
        d = os.path.join(assets, "scannet_test_1500")
        input_files = [os.path.join(d, "test.npz")]
        opt.max_keypoints, opt.nms_radius, opt.keypoint_threshold = 1024, 4, 0.001
        img_size, ds_key = 720, "scannet"

    exp_dir, _ = get_exp_dir(opt.checkpoint_dir, opt.exp_name)
    superpoint = SuperPoint(SuperPointConfig(
        nms_radius=opt.nms_radius, keypoint_threshold=opt.keypoint_threshold,
        max_keypoints=opt.max_keypoints, remove_borders=0,
        fill_with_random_keypoints=False, compute_dtype=opt.compute_dtype,
    ))
    matcher = MultiViewMatcher(MatcherConfig(
        gnn_layers=default_gnn_layers(9, 1), sinkhorn_iterations=opt.sinkhorn_iterations,
        conf_mlp=True, multi_frame_matching=False,
        attention_impl=opt.attention_impl, sinkhorn_impl=opt.sinkhorn_impl,
        compute_dtype=opt.compute_dtype,
    ))
    key = jax.random.PRNGKey(0)
    m_vars = matcher.init(
        key, jnp.zeros((1, 2, opt.max_keypoints, 2)), jnp.zeros((1, 2, opt.max_keypoints)),
        jnp.zeros((1, 2, opt.max_keypoints, 256)), jnp.full((1, 2, 2), 64.0),
    )
    import optax

    state = TrainState(m_vars["params"], m_vars["batch_stats"],
                       optax.identity().init(m_vars["params"]),
                       jnp.zeros((), jnp.int32), jnp.zeros(()))
    state, _, _, _ = load_checkpoint(exp_dir, state, model_id=None, load_opt_state=False)
    m_vars = {"params": state.params, "batch_stats": state.batch_stats}
    sp_vars = superpoint.init({"params": key, "keypoints": key}, jnp.zeros((1, 64, 64, 1)))
    sp_path = os.path.join(exp_dir, "superpoint.ckpt")
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
    dataset = PairMatchingDataset(dataset_dir, input_files, img_size, ds_key)
    pose_errors, cannot, _ = evaluate(opt, superpoint, sp_vars, matcher, m_vars, dataset)

    aucs = pose_auc(pose_errors, [5, 10, 20])
    result = {f"AUC@{t}deg": 100.0 * a for t, a in zip((5, 10, 20), aucs)}
    for k, v in result.items():
        log.info("%s: %.3f%%", k, v)
    log.info("failed poses: %d", cannot)
    out = os.path.join(exp_dir, f"two_view_{opt.eval_mode}_{opt.dataset}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=4)
    return result


if __name__ == "__main__":
    main()
