"""Multi-view pose estimation pipeline: matcher outputs -> absolute extrinsics.

In-process replacement of `eval_bundle_adjust`
(`/root/reference/eval_multi_view.py:21-68`) and its two C++ subprocess hops
(`ba_initializer`, `bundle_adjuster` with CSV IPC). Stages:

1. per-pair relative poses: confidence-weighted eight-point + two-view LM BA
   (`initialize_bundle_adjust`'s `w8pt_ba` path, `bundle_adjust_io.py:12-23`),
   one jitted batch over all C(V,2) pairs;
2. maximum-spanning-tree chaining of relative poses into initial absolute poses
   (host, tiny -- `bundle_adjust_io.py:135-172`);
3. robust rotation averaging + translation averaging (JAX IRLS/eigen solvers,
   replacing Theia);
4. confidence-weighted multi-camera Schur LM bundle adjustment (replacing
   Ceres DENSE_SCHUR), camera 0 fixed.

Static shapes: every pair contributes exactly K match slots; invalid matches
ride along with zero confidence.
"""

import time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from e2e_multi_view_matching_tpu.geom.eightpoint import estimate_relative_pose_w8pt
from e2e_multi_view_matching_tpu.geom.epipolar import normalize_keypoints
from e2e_multi_view_matching_tpu.mvba.bundle_adjust import (
    _triangulate_pairwise,
    bundle_adjust_multi_view,
)
from e2e_multi_view_matching_tpu.mvba.rotation_averaging import rotation_averaging
from e2e_multi_view_matching_tpu.mvba.spanning_tree import (
    spanning_tree_poses,
    spanning_tree_poses_device,
)
from e2e_multi_view_matching_tpu.mvba.translation_averaging import (
    edge_directions,
    translation_averaging,
)
from e2e_multi_view_matching_tpu.pose.two_view_ba import bundle_adjust_two_view


@dataclass(frozen=True)
class MultiViewPipelineConfig:
    conf_thresh: float = 0.0  # `initialize_bundle_adjust(conf_thresh=0.)`
    min_inliers: int = 20  # `bundle_adjust_io.py:63`
    two_view_ba_iterations: int = 10  # `eval_multi_view` path uses 10
    ba_iterations: int = 20
    ba_retriangulate: bool = False
    # per-pair relative-pose init mode (`bundle_adjust_io.py:12-54`):
    # "w8pt_ba" (default; differentiable robust IRLS w8pt + LM BA, on device),
    # "ransac" (host OpenCV essential RANSAC), "ransac_ba" (RANSAC init +
    # batched on-device two-view BA refine on the inliers)
    init_mode: str = "w8pt_ba"
    ransac_thresh: float = 1.0  # pixels (upstream `estimate_pose` default)


def _pair_list(V):
    return [(i, j) for j in range(V) for i in range(j)]


@partial(jax.jit, static_argnames=("n_iterations", "n_irls"))
def robust_relative_poses(
    kpts_i, kpts_j_matched, intr_i, intr_j, conf, n_iterations, n_irls=2
):
    """Robust w8pt + two-view BA for a batch of pairs.

    Beyond the reference's single weighted pass (`bundle_adjust_io.py:12-23`),
    the eight-point solve is re-run with epipolar-inlier-gated confidences
    (IRLS-style): matcher confidences are soft, so a handful of confident-but-
    wrong matches can swing the translation direction; one or two gated
    re-estimates recover RANSAC-like robustness with fully static shapes.

    Args:
        kpts_i: (P, K, 2) keypoints of view i; kpts_j_matched: (P, K, 2) matched
        coordinates in view j; intr_i, intr_j: (P, 3, 3); conf: (P, K) with 0
        marking invalid matches.
    Returns:
        (T_rel (P, 4, 4), inlier_count (P,), valid (P,)).
    """
    conf_cur = conf
    T_w8, info = estimate_relative_pose_w8pt(
        kpts_i, kpts_j_matched, intr_i, intr_j, conf_cur, determine_inliers=True
    )
    for _ in range(n_irls):
        gated = jnp.where(info.inliers, conf, 0.0)
        # keep the previous weighting when gating would leave < 8 matches
        enough = jnp.sum((gated > 0).astype(jnp.int32), axis=-1) >= 8
        conf_cur = jnp.where(enough[:, None], gated, conf_cur)
        T_w8, info = estimate_relative_pose_w8pt(
            kpts_i, kpts_j_matched, intr_i, intr_j, conf_cur, determine_inliers=True
        )
    inlier_count = jnp.sum(info.inliers.astype(jnp.int32), axis=-1)
    conf_gated = jnp.where(info.pos_depth_mask & info.inliers, conf, 0.0)
    conf_ba = jnp.where(info.pos_depth_mask & info.inliers, info.confidence, 0.0)
    T_ba, valid_ba = bundle_adjust_two_view(
        info.kpts0_norm, info.kpts1_norm, conf_ba, T_w8, n_iterations=n_iterations
    )
    T_rel = jnp.where(valid_ba[:, None, None], T_ba, T_w8)
    return T_rel, inlier_count, info.valid, conf_gated


def _global_stage_impl(extr_tree, edges_i, edges_j, T_rel, edge_valid, x_i, x_j, w, cam_a, cam_b, cfg):
    """Averaging + BA from tree-initialized extrinsics (single tuple).

    Args:
        extr_tree: (V, 4, 4); edges_*: (E,); T_rel: (E, 4, 4); edge_valid: (E,);
        x_i, x_j: (P, 2) normalized observations; w: (P,); cam_a, cam_b: (P,).
    """
    R_avg = rotation_averaging(
        extr_tree[:, :3, :3], edges_i, edges_j, T_rel[:, :3, :3], edge_valid
    )
    # centers from the tree init
    c_tree = -jnp.einsum("vji,vj->vi", extr_tree[:, :3, :3], extr_tree[:, :3, 3])
    gamma = edge_directions(R_avg[edges_i], T_rel[:, :3, :3], T_rel[:, :3, 3])
    c_avg = translation_averaging(c_tree, edges_i, edges_j, gamma, edge_valid)
    t_avg = -jnp.einsum("vij,vj->vi", R_avg, c_avg)
    extr = jnp.zeros_like(extr_tree)
    extr = extr.at[:, :3, :3].set(R_avg)
    extr = extr.at[:, :3, 3].set(t_avg)
    extr = extr.at[:, 3, 3].set(1.0)

    # observation confidences normalized to total 2 (`bundle_adjust_io.py:56-60`)
    w_sum = jnp.maximum(jnp.sum(w) * 2.0, 1e-6)  # 2 observations per match
    w_n = w / (0.5 * w_sum) * 2.0  # == w * 2 / w_sum; total over 2P obs = 2
    # averaging failure fallback (underconstrained pose graphs): keep the
    # spanning-tree init, like the reference's print-and-continue
    # (`ba_init.cpp:80-89`)
    avg_ok = jnp.all(jnp.isfinite(extr))
    extr = jnp.where(avg_ok, extr, extr_tree)
    X0 = _triangulate_pairwise(extr, cam_a, cam_b, x_i, x_j)
    extr_ba, _ = bundle_adjust_multi_view(
        extr, X0, cam_a, cam_b, x_i, x_j, w_n,
        n_iterations=cfg.ba_iterations, retriangulate=cfg.ba_retriangulate,
    )
    ba_ok = jnp.all(jnp.isfinite(extr_ba))
    return jnp.where(ba_ok, extr_ba, extr)


_global_stage = partial(jax.jit, static_argnames=("cfg",))(_global_stage_impl)


@partial(jax.jit, static_argnames=("cfg",))
def _global_stage_batch(extr_tree, edges_i, edges_j, T_rel, edge_valid, x_i, x_j,
                        w, cam_a, cam_b, cfg):
    """vmap of `_global_stage_impl` over a leading tuple axis.

    Edge/camera index vectors are shared (same V, same pair order per tuple);
    all solver loops are static-length `fori_loop`/`scan`, so the whole stage
    vmaps into one batched program instead of B sequential dispatches.
    """

    def one(extr_tree, T_rel, edge_valid, x_i, x_j, w):
        return _global_stage_impl(
            extr_tree, edges_i, edges_j, T_rel, edge_valid, x_i, x_j, w,
            cam_a, cam_b, cfg,
        )

    return jax.vmap(one)(extr_tree, T_rel, edge_valid, x_i, x_j, w)


def _ransac_relative_poses(kpts_i, kpts_j, intr_i, intr_j, conf, cfg):
    """Host RANSAC init per pair, optionally + batched two-view BA refine.

    The reference's `ransac` / `ransac_ba` multi-view init modes
    (`bundle_adjust_io.py:12-54`): OpenCV essential RANSAC on the confident
    matches, inlier-gated confidences for the BA observations; `ransac_ba`
    additionally refines each pose with the two-view LM BA (10 iterations,
    like `eval_pairs.py:241`) -- run as ONE batched device dispatch over all
    pairs after the host loop.

    Args/returns mirror `robust_relative_poses` (numpy in, numpy out).
    """
    from e2e_multi_view_matching_tpu.geom.ransac import estimate_pose_ransac

    BP, K = conf.shape
    T_rel = np.broadcast_to(np.eye(4, dtype=np.float32), (BP, 4, 4)).copy()
    pose_valid = np.zeros(BP, bool)
    inlier_count = np.zeros(BP, np.int32)
    conf_gated = np.zeros_like(conf)
    for p in range(BP):
        sel = conf[p] > 0.0
        ret = None
        if sel.sum() >= 5:
            ret = estimate_pose_ransac(
                kpts_i[p][sel], kpts_j[p][sel], intr_i[p], intr_j[p],
                thresh=cfg.ransac_thresh,
            )
        if ret is None:
            continue
        R, t, inl = ret
        T_rel[p, :3, :3] = R
        T_rel[p, :3, 3] = t
        pose_valid[p] = True
        inlier_count[p] = int(inl.sum())
        gate = np.zeros(K, bool)
        gate[np.where(sel)[0][inl]] = True
        conf_gated[p] = np.where(gate, conf[p], 0.0)

    if cfg.init_mode == "ransac_ba":
        x_i = np.asarray(normalize_keypoints(jnp.asarray(kpts_i), jnp.asarray(intr_i)))
        x_j = np.asarray(normalize_keypoints(jnp.asarray(kpts_j), jnp.asarray(intr_j)))
        T_ba, ok = bundle_adjust_two_view(
            jnp.asarray(x_i), jnp.asarray(x_j), jnp.asarray(conf_gated),
            jnp.asarray(T_rel), n_iterations=cfg.two_view_ba_iterations,
        )
        ok = np.asarray(ok) & pose_valid
        T_rel = np.where(ok[:, None, None], np.asarray(T_ba), T_rel)
    return T_rel, inlier_count, pose_valid, conf_gated


def multi_view_pose_stage_a(kpts, intr, matches0, conf,
                            cfg=MultiViewPipelineConfig()):
    """Traceable stage A: matcher outputs -> per-pair relative poses.

    Pure JAX (w8pt_ba init mode only), so callers can inline it into a larger
    jitted program -- the eval CLI and bench fuse SuperPoint -> matcher ->
    stage A into ONE device dispatch; on the axon tunnel each extra dispatch
    costs ~30 ms of round-trip overhead.

    Args:
        as `multi_view_pose_pipeline_batch` (kpts (B, V, K, 2), intr
        (B, V, 3|4, 3|4), matches0 (B, P, K), conf (B, P, K)).
    Returns:
        dict of device arrays:
          packed (B*P*18,) f32 -- ravel(T_rel) ++ inlier counts ++ validity,
            sized for a single device->host fetch before the host tree stage;
          T_rel (B, P, 4, 4); counts (B, P) int; valid (B, P) bool;
          conf_gated (B, P, K) epipolar-inlier-gated confidences;
          x_i_n, x_j_n (B, P, K, 2) normalized observations.
    """
    kpts = jnp.asarray(kpts)
    intr = jnp.asarray(intr)[..., :3, :3]
    matches0 = jnp.asarray(matches0)
    conf = jnp.asarray(conf)
    B, V, K, _ = kpts.shape
    pairs = _pair_list(V)
    P = len(pairs)
    idx_i = np.asarray([p[0] for p in pairs])
    idx_j = np.asarray([p[1] for p in pairs])

    kpts_i = kpts[:, idx_i]  # (B, P, K, 2)
    gather = jnp.clip(matches0, 0, K - 1)
    kpts_j = jnp.take_along_axis(kpts[:, idx_j], gather[..., None], axis=2)
    valid = (matches0 >= 0) & (conf > cfg.conf_thresh)
    conf_m = jnp.where(valid, conf, 0.0)
    intr_i = intr[:, idx_i]
    intr_j = intr[:, idx_j]

    T_rel, inlier_count, pose_valid, conf_gated = robust_relative_poses(
        kpts_i.reshape(B * P, K, 2), kpts_j.reshape(B * P, K, 2),
        intr_i.reshape(B * P, 3, 3), intr_j.reshape(B * P, 3, 3),
        conf_m.reshape(B * P, K), cfg.two_view_ba_iterations,
    )
    packed = jnp.concatenate([
        jnp.ravel(T_rel), inlier_count.astype(jnp.float32).ravel(),
        pose_valid.astype(jnp.float32).ravel(),
    ])
    return {
        "packed": packed,
        "T_rel": T_rel.reshape(B, P, 4, 4),
        "counts": inlier_count.reshape(B, P),
        "valid": pose_valid.reshape(B, P),
        "conf_gated": conf_gated.reshape(B, P, K),
        "x_i_n": normalize_keypoints(kpts_i, intr_i),
        "x_j_n": normalize_keypoints(kpts_j, intr_j),
    }


def multi_view_pose_from_stage_a(stage_a, cfg=MultiViewPipelineConfig(),
                                 profile=None):
    """Host spanning trees + averaging/BA from `multi_view_pose_stage_a` output.

    Performs the pipeline's single device->host fetch (the packed pose/count
    vector), chains the per-tuple maximum spanning trees on the host, and runs
    the batched averaging+BA stage. Returns (B, V, 4, 4) numpy extrinsics.
    """
    t0 = time.perf_counter()
    B, P, K = stage_a["conf_gated"].shape
    V = int(round((1 + np.sqrt(1 + 8 * P)) / 2))
    pairs = _pair_list(V)
    idx_i = np.asarray([p[0] for p in pairs])
    idx_j = np.asarray([p[1] for p in pairs])

    packed = np.asarray(stage_a["packed"])  # the one tunnel round trip
    T_rel_np = packed[: B * P * 16].reshape(B, P, 4, 4)
    counts_np = packed[B * P * 16: B * P * 17].reshape(B, P).astype(np.int32)
    valid_np = packed[B * P * 17:].reshape(B, P) > 0.5
    if profile is not None:
        t1 = time.perf_counter()
        profile["stage_a_fetch_s"] = t1 - t0
        t0 = t1

    extr_tree = np.zeros((B, V, 4, 4), np.float32)
    edge_valid = np.zeros((B, P), bool)
    for b in range(B):
        rel_dict = {pairs[p]: T_rel_np[b, p] for p in range(P) if valid_np[b, p]}
        cnt_dict = {pairs[p]: int(counts_np[b, p]) for p in range(P) if valid_np[b, p]}
        extr_tree[b], tree = spanning_tree_poses(V, rel_dict, cnt_dict)
        tree_set = set(tree)
        edge_valid[b] = [
            valid_np[b, p]
            and (counts_np[b, p] >= cfg.min_inliers or pairs[p] in tree_set)
            for p in range(P)
        ]
    if profile is not None:
        t1 = time.perf_counter()
        profile["tree_host_s"] = t1 - t0
        t0 = t1

    cam_a = jnp.asarray(np.repeat(idx_i, K).astype(np.int32))
    cam_b = jnp.asarray(np.repeat(idx_j, K).astype(np.int32))
    extr_ba = _global_stage_batch(
        jnp.asarray(extr_tree),
        jnp.asarray(idx_i.astype(np.int32)),
        jnp.asarray(idx_j.astype(np.int32)),
        stage_a["T_rel"],
        jnp.asarray(edge_valid),
        stage_a["x_i_n"].reshape(B, P * K, 2),
        stage_a["x_j_n"].reshape(B, P * K, 2),
        stage_a["conf_gated"].reshape(B, P * K),
        cam_a,
        cam_b,
        cfg,
    )
    out = np.asarray(extr_ba)
    if profile is not None:
        profile["stage_b_s"] = time.perf_counter() - t0
    return out


def multi_view_pose_device(kpts, intr, matches0, conf,
                           cfg=MultiViewPipelineConfig()):
    """Fully traceable multi-view pose pipeline: zero host hops.

    The complete `w8pt_ba` pipeline -- per-pair robust relative poses (stage
    A), maximum-spanning-tree initialization (`spanning_tree_poses_device`,
    Prim's with the V-1 growth steps unrolled), rotation/translation
    averaging, and multi-camera Schur LM BA -- as ONE jittable function of
    device arrays. The eval CLI and bench inline this after the matcher, so an
    entire eval chunk (SuperPoint -> matcher -> extrinsics) is a single
    compiled program with a single dispatch; on the axon tunnel each saved
    host round trip is worth ~26 ms.

    Replaces the reference's two C++ subprocess hops + CSV IPC
    (`/root/reference/eval_multi_view.py:32,45`) with zero IPC of any kind.

    Args/returns as `multi_view_pose_pipeline_batch`, but the result is a
    (B, V, 4, 4) DEVICE array.
    """
    stage_a = multi_view_pose_stage_a(kpts, intr, matches0, conf, cfg)
    B, P, K = stage_a["conf_gated"].shape
    V = int(round((1 + np.sqrt(1 + 8 * P)) / 2))
    pairs = _pair_list(V)
    idx_i = np.asarray([p[0] for p in pairs])
    idx_j = np.asarray([p[1] for p in pairs])

    T_rel = stage_a["T_rel"]
    counts = stage_a["counts"]
    valid = stage_a["valid"]

    extr_tree, on_tree = jax.vmap(
        lambda T, c, v: spanning_tree_poses_device(T, c, v, idx_i, idx_j, V)
    )(T_rel, counts, valid)
    # edges entering the averaging: successful pairs with enough inliers or
    # on the tree (`bundle_adjust_io.py:185`)
    edge_valid = valid & ((counts >= cfg.min_inliers) | on_tree)

    cam_a = jnp.asarray(np.repeat(idx_i, K).astype(np.int32))
    cam_b = jnp.asarray(np.repeat(idx_j, K).astype(np.int32))
    return _global_stage_batch(
        extr_tree,
        jnp.asarray(idx_i.astype(np.int32)),
        jnp.asarray(idx_j.astype(np.int32)),
        T_rel,
        edge_valid,
        stage_a["x_i_n"].reshape(B, P * K, 2),
        stage_a["x_j_n"].reshape(B, P * K, 2),
        stage_a["conf_gated"].reshape(B, P * K),
        cam_a,
        cam_b,
        cfg,
    )


def multi_view_pose_pipeline_batch(kpts, intr, matches0, conf,
                                   cfg=MultiViewPipelineConfig(), profile=None):
    """Estimate absolute extrinsics for a batch of view tuples.

    Batched version of `multi_view_pose_pipeline`: stage A (robust relative
    poses) runs once over all B*P pairs, the spanning trees are chained on the
    host (tiny), and the averaging+BA stage is vmapped over tuples -- two
    device dispatches total instead of two per tuple. Exactly ONE device->host
    transfer happens between the stages (a packed f32 vector of relative poses
    + inlier counts + validity); the pose/keypoint tensors stay on device.

    Args:
        kpts: (B, V, K, 2) pixel keypoints per view.
        intr: (B, V, 3, 3) or (B, V, 4, 4) intrinsics.
        matches0: (B, P, K) int match index into view j per pair (the matcher's
            `matches0`, pair order [(i, j) for j in range(V) for i in
            range(j)]), -1 = unmatched.
        conf: (B, P, K) per-match confidences of the pairs.
        cfg: pipeline configuration.
        profile: optional dict; filled with wall-clock seconds per stage
            (keys `stage_a_s` rel-pose dispatch+fetch, `tree_host_s` spanning
            trees, `stage_b_s` averaging+BA dispatch+fetch).
    Returns:
        (B, V, 4, 4) numpy extrinsics (world->cam, camera 0 = identity frame).
    """
    t0 = time.perf_counter()
    if cfg.init_mode in ("ransac", "ransac_ba"):
        kpts = jnp.asarray(kpts)
        intr = jnp.asarray(intr)[..., :3, :3]
        matches0 = jnp.asarray(matches0)
        conf = jnp.asarray(conf)
        B, V, K, _ = kpts.shape
        pairs = _pair_list(V)
        P = len(pairs)
        idx_i = np.asarray([p[0] for p in pairs])
        idx_j = np.asarray([p[1] for p in pairs])

        # gather per-pair matched coordinates; invalid -> conf 0
        kpts_i = kpts[:, idx_i]  # (B, P, K, 2)
        gather = jnp.clip(matches0, 0, K - 1)
        kpts_j = jnp.take_along_axis(kpts[:, idx_j], gather[..., None], axis=2)
        valid = (matches0 >= 0) & (conf > cfg.conf_thresh)
        conf_m = jnp.where(valid, conf, 0.0)
        intr_i = intr[:, idx_i]  # (B, P, 3, 3)
        intr_j = intr[:, idx_j]
        T_rel, inlier_count, pose_valid, conf_gated = _ransac_relative_poses(
            np.asarray(kpts_i).reshape(B * P, K, 2),
            np.asarray(kpts_j).reshape(B * P, K, 2),
            np.asarray(intr_i).reshape(B * P, 3, 3),
            np.asarray(intr_j).reshape(B * P, 3, 3),
            np.asarray(conf_m).reshape(B * P, K), cfg,
        )
        stage_a = {
            "packed": np.concatenate([
                T_rel.ravel(), inlier_count.astype(np.float32).ravel(),
                pose_valid.astype(np.float32).ravel(),
            ]),
            "T_rel": jnp.asarray(T_rel).reshape(B, P, 4, 4),
            "counts": jnp.asarray(inlier_count).reshape(B, P),
            "valid": jnp.asarray(pose_valid).reshape(B, P),
            "conf_gated": jnp.asarray(conf_gated).reshape(B, P, K),
            "x_i_n": normalize_keypoints(kpts_i, intr_i),
            "x_j_n": normalize_keypoints(kpts_j, intr_j),
        }
    else:
        stage_a = multi_view_pose_stage_a(kpts, intr, matches0, conf, cfg)
    out = multi_view_pose_from_stage_a(stage_a, cfg, profile=profile)
    if profile is not None:
        # stage_a_s: stage-A trace/dispatch + the packed fetch that forces it
        profile.pop("stage_a_fetch_s", None)
        profile["stage_a_s"] = (time.perf_counter() - t0) - (
            profile.get("tree_host_s", 0.0) + profile.get("stage_b_s", 0.0))
    return out


def multi_view_pose_pipeline(kpts, intr, matches0, conf, cfg=MultiViewPipelineConfig()):
    """Estimate absolute extrinsics for one view tuple.

    Args:
        kpts: (V, K, 2) pixel keypoints per view.
        intr: (V, 3, 3) or (V, 4, 4) intrinsics.
        matches0: (P, K) int match index into view j per pair (the matcher's
            stacked `matches0`, pair order [(i, j) for j in range(V) for i in
            range(j)]), -1 = unmatched.
        conf: (P, K) per-match confidences of the pairs.
        cfg: pipeline configuration.
    Returns:
        (V, 4, 4) numpy extrinsics (world->cam, camera 0 = identity frame).
    """
    return multi_view_pose_pipeline_batch(
        jnp.asarray(kpts)[None], jnp.asarray(intr)[None],
        jnp.asarray(matches0)[None], jnp.asarray(conf)[None], cfg,
    )[0]
