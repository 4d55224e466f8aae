"""Tests for GT-match generation and the loss layer, on exact synthetic scenes."""

import jax.numpy as jnp
import numpy as np

from e2e_multi_view_matching_tpu.data.gt_matches import (
    gt_matches_all_pairs,
    gt_matches_of_pair,
)
from e2e_multi_view_matching_tpu.data.synthetic import PlaneScene
from e2e_multi_view_matching_tpu.train.losses import (
    combine_losses,
    match_loss_of_pair,
)


def build_pair_case(rng, K=48, n_true=24):
    """Two views of a plane; first n_true keypoints correspond exactly."""
    scene = PlaneScene(rng, n_views=2)
    pix0_m, pix1_m = scene.correspondences(0, 1, n_true, rng)
    n_true = len(pix0_m)
    # Non-matching keypoints: random positions (plane is smooth; a random pixel's
    # reprojection rarely lands on another random keypoint within 5 px).
    pix0_r = rng.uniform([10, 10], [scene.W - 10, scene.H - 10], size=(K - n_true, 2)).astype(np.float32)
    pix1_r = rng.uniform([10, 10], [scene.W - 10, scene.H - 10], size=(K - n_true, 2)).astype(np.float32)
    kpts0 = np.concatenate([pix0_m, pix0_r])[None]
    kpts1 = np.concatenate([pix1_m, pix1_r])[None]
    depth0 = scene.depth_map(0)[None]
    depth1 = scene.depth_map(1)[None]
    T021 = scene.relative_pose(0, 1)[None]
    intr = scene.intr[0].astype(np.float32)[None]
    return scene, kpts0, kpts1, intr, T021, depth0, depth1, n_true


class TestGtMatches:
    def test_exact_correspondences_found(self, rng):
        _, kpts0, kpts1, intr, T021, depth0, depth1, n_true = build_pair_case(rng)
        gi, gw = gt_matches_of_pair(
            jnp.asarray(kpts0), jnp.asarray(kpts1), jnp.asarray(intr),
            jnp.asarray(intr), jnp.asarray(T021), jnp.asarray(depth0), jnp.asarray(depth1),
        )
        gi = np.asarray(gi)[0]
        # the first n_true kpts0 should match the identically-indexed kpts1
        matched = gi[0, :n_true]
        frac = np.mean(matched == np.arange(n_true))
        assert frac > 0.85, f"only {frac:.2f} of exact correspondences recovered"
        # symmetric side consistent
        for k in range(n_true):
            if matched[k] >= 0:
                assert gi[1, matched[k]] == k
        # dustbin entries unmatched
        assert gi[0, -1] == -1 and gi[1, -1] == -1

    def test_weights_class_balance(self, rng):
        _, kpts0, kpts1, intr, T021, depth0, depth1, n_true = build_pair_case(rng)
        gi, gw = gt_matches_of_pair(
            jnp.asarray(kpts0), jnp.asarray(kpts1), jnp.asarray(intr),
            jnp.asarray(intr), jnp.asarray(T021), jnp.asarray(depth0), jnp.asarray(depth1),
        )
        gi, gw = np.asarray(gi)[0], np.asarray(gw)[0]
        match_w = gw[0][(gi[0] >= 0)]
        unmatch_w = gw[0][(gi[0] == -1) & (gw[0] > 0)]
        assert match_w.size and unmatch_w.size
        # weights within each class are constant
        assert np.allclose(match_w, match_w[0])
        assert np.allclose(unmatch_w, unmatch_w[0])
        # each class sums to ~0.5 of total weight mass over both directions
        total = gw.sum()
        matched_mass = (gw[0][(gi[0] >= 0)].sum() + gw[1][(gi[1] >= 0)].sum())
        assert abs(matched_mass / total - 0.5) < 0.05

    def test_invalid_depth_drops(self, rng):
        _, kpts0, kpts1, intr, T021, depth0, depth1, n_true = build_pair_case(rng)
        depth0 = np.zeros_like(depth0)  # all depths invalid
        gi, gw = gt_matches_of_pair(
            jnp.asarray(kpts0), jnp.asarray(kpts1), jnp.asarray(intr),
            jnp.asarray(intr), jnp.asarray(T021), jnp.asarray(depth0), jnp.asarray(depth1),
        )
        gi, gw = np.asarray(gi)[0], np.asarray(gw)[0]
        assert (gi[0, :-1] == -1).all()  # no matches possible
        assert (gw[0, :-1] == 0).all()  # all dropped as uncertain

    def test_all_pairs_tuple(self, rng):
        scene = PlaneScene(rng, n_views=3)
        K = 32
        kpts = np.stack(
            [rng.uniform([10, 10], [scene.W - 10, scene.H - 10], size=(K, 2)) for _ in range(3)]
        ).astype(np.float32)[None]
        depths = np.stack([scene.depth_map(v) for v in range(3)])[None]
        intr = np.tile(scene.intr[0].astype(np.float32), (1, 3, 1, 1))
        poses = scene.poses.astype(np.float32)[None]
        gi, gw = gt_matches_all_pairs(
            jnp.asarray(kpts), jnp.asarray(intr), jnp.asarray(poses), jnp.asarray(depths)
        )
        assert gi.shape == (1, 3, 2, K + 1)
        assert gw.shape == (1, 3, 2, K + 1)


class TestLosses:
    def test_match_loss_prefers_correct_assignment(self, rng):
        K = 8
        gt_idx0 = np.arange(K)  # identity matching
        gi = np.full((1, 2, K + 1), -1, np.int64)
        gi[0, 0, :K] = gt_idx0
        gi[0, 1, :K] = gt_idx0
        gw = np.ones((1, 2, K + 1), np.float32)
        # log_p concentrated on the correct diagonal
        good = np.full((1, K + 1, K + 1), -10.0, np.float32)
        good[0, np.arange(K), np.arange(K)] = -0.01
        good[0, K, K] = -0.01
        bad = np.full((1, K + 1, K + 1), -10.0, np.float32)
        bad[0, np.arange(K), (np.arange(K) + 1) % K] = -0.01
        l_good = float(match_loss_of_pair(jnp.asarray(good), jnp.asarray(gi), jnp.asarray(gw)))
        l_bad = float(match_loss_of_pair(jnp.asarray(bad), jnp.asarray(gi), jnp.asarray(gw)))
        assert l_good < l_bad

    def test_dustbin_indexing(self):
        K = 4
        gi = np.full((1, 2, K + 1), -1, np.int64)  # everything unmatched
        gw = np.zeros((1, 2, K + 1), np.float32)
        gw[0, :, 0] = 1.0  # weight only first keypoint each side
        log_p = np.full((1, K + 1, K + 1), np.log(0.5), np.float32)
        loss = float(match_loss_of_pair(jnp.asarray(log_p), jnp.asarray(gi), jnp.asarray(gw)))
        np.testing.assert_allclose(loss, -2 * np.log(0.5), rtol=1e-5)

    def test_combine_losses(self):
        losses = {"match_loss": jnp.asarray(10.0), "rot_loss": jnp.asarray(0.1),
                  "transl_loss": jnp.asarray(0.2)}
        total, scaled = combine_losses(losses, n_pairs=10, pose_match_ratio=0.5,
                                       rot_weight=100.0, trans_weight=50.0)
        np.testing.assert_allclose(float(scaled["match_loss"]), 1.0)
        expected = 0.5 * 1.0 + 0.5 * (100 * 0.01 + 50 * 0.02)
        np.testing.assert_allclose(float(total), expected, rtol=1e-5)


class TestPlaneScene:
    def test_depth_consistency(self, rng):
        scene = PlaneScene(rng, n_views=2)
        pix0, pix1 = scene.correspondences(0, 1, 20, rng)
        # unproject from view 0, project to view 1, depth matches depth map
        X = scene.unproject(0, pix0)
        p1, d1 = scene.project(1, X)
        np.testing.assert_allclose(p1, pix1, atol=1e-4)
        dm = scene.depth_map(1)
        for (x, y), d in zip(pix1, d1):
            assert abs(dm[int(y), int(x)] - d) < 0.05


class TestBatchedPoseLoss:
    """The P-batched pose loss must reproduce the per-pair loop exactly
    (sum_p mean_B rot; sum_p weighted-mean transl -- helpers.py:243-260)."""

    def test_matches_per_pair_loop(self, rng):
        from e2e_multi_view_matching_tpu.geom.eightpoint import (
            estimate_relative_pose_w8pt)
        from e2e_multi_view_matching_tpu.geom.metrics import (
            rotation_angle_error, translation_angle_error)
        from e2e_multi_view_matching_tpu.train.losses import matcher_losses

        B, V, K = 2, 3, 32
        P = V * (V - 1) // 2
        kpts = rng.uniform(20, 400, size=(B, V, K, 2)).astype(np.float32)
        intr = np.broadcast_to(
            np.array([[300.0, 0, 320, 0], [0, 300, 240, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]], np.float32),
            (B, V, 4, 4)).copy()
        # random valid SE(3) poses
        poses = np.zeros((B, V, 4, 4), np.float32)
        for b in range(B):
            for v in range(V):
                ax = rng.normal(size=3)
                ax = ax / np.linalg.norm(ax) * rng.uniform(0, 0.4)
                th = np.linalg.norm(ax)
                Kx = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                               [-ax[1], ax[0], 0]])
                R = np.eye(3) + (np.sin(th) / max(th, 1e-8)) * Kx + (
                    (1 - np.cos(th)) / max(th * th, 1e-8)) * (Kx @ Kx)
                poses[b, v, :3, :3] = R
                poses[b, v, :3, 3] = rng.normal(size=3)
                poses[b, v, 3, 3] = 1.0
        matches0 = rng.integers(-1, K, size=(B, P, K)).astype(np.int32)
        conf = rng.uniform(0.05, 1.0, size=(B, P, K)).astype(np.float32)
        result = {
            "log_assignment": jnp.zeros((B, P, K + 1, K + 1)),
            "pairs": jnp.asarray([(i, j) for j in range(V) for i in range(j)],
                                 dtype=jnp.int32),
            "matches0": jnp.asarray(matches0),
            "conf_scores": jnp.asarray(conf),
        }
        gi = jnp.zeros((B, P, 2, K + 1), jnp.int32)
        gw = jnp.zeros((B, P, 2, K + 1), jnp.float32)
        got = matcher_losses(result, gi, gw, jnp.asarray(kpts),
                             jnp.asarray(intr), jnp.asarray(poses),
                             pose_loss=True)

        # the pre-batching per-pair loop, verbatim
        pairs = [(i, j) for j in range(V) for i in range(j)]
        rot_ref = jnp.zeros(())
        tr_ref = jnp.zeros(())
        kj = jnp.asarray(kpts)
        for p in range(P):
            i, j = pairs[p]
            target = jnp.linalg.inv(jnp.asarray(poses)[:, j]) @ jnp.asarray(poses)[:, i]
            m0 = result["matches0"][:, p]
            cf = jnp.where(m0 >= 0, result["conf_scores"][:, p], 0.0)
            gather = jnp.clip(m0, 0, K - 1)
            kpts_j = jnp.take_along_axis(kj[:, j], gather[..., None], axis=1)
            T_pred, _ = estimate_relative_pose_w8pt(
                kj[:, i], kpts_j, jnp.asarray(intr)[:, i], jnp.asarray(intr)[:, j],
                cf, choose_closest=True, target_T021=target)
            rot_ref = rot_ref + rotation_angle_error(T_pred, target)
            tr_ref = tr_ref + translation_angle_error(T_pred, target)

        np.testing.assert_allclose(float(got["rot_loss"]), float(rot_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(got["transl_loss"]), float(tr_ref),
                                   rtol=1e-5, atol=1e-6)
