"""End-to-end test of the multi-view pose pipeline on an exact synthetic scene."""

import numpy as np

from e2e_multi_view_matching_tpu.data.synthetic import PlaneScene
from e2e_multi_view_matching_tpu.mvba.pipeline import (
    MultiViewPipelineConfig,
    multi_view_pose_pipeline,
    multi_view_pose_pipeline_batch,
)


def rot_err_deg(Ra, Rb):
    tr = np.clip((np.trace(Ra.T @ Rb) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(tr))


def transl_angle_deg(ta, tb):
    n = np.linalg.norm(ta) * np.linalg.norm(tb)
    if n < 1e-9:
        return 0.0
    return np.degrees(np.arccos(np.clip(ta @ tb / n, -1, 1)))


def build_tuple_case(rng, V=5, K=64, n_true=48, noise_px=0.3, outlier_frac=0.1):
    """Synthetic matcher output for a V-tuple.

    The 3D structure is a volumetric cloud (NOT the fixture plane: coplanar
    points are a degenerate configuration for the eight-point algorithm)."""
    scene = PlaneScene(rng, n_views=V, baseline=0.8, rot_jitter=0.1)
    pairs = [(i, j) for j in range(V) for i in range(j)]
    # shared 3D points: random pixels in view 0 un-projected to random depths
    base_pix = rng.uniform([15, 15], [scene.W - 15, scene.H - 15], size=(K, 2))
    depths = rng.uniform(4.0, 12.0, size=K)
    Kinv = np.linalg.inv(scene.intr[0])
    rays = np.concatenate([base_pix, np.ones((K, 1))], -1) @ Kinv.T
    R0 = scene.poses[0][:3, :3]
    c0 = scene.poses[0][:3, 3]
    Xw = (rays * depths[:, None]) @ R0.T + c0
    kpts = np.zeros((V, K, 2), np.float32)
    vis = np.zeros((V, K), bool)
    for v in range(V):
        p, d = scene.project(v, Xw)
        inb = (d > 0.2) & (p[:, 0] > 5) & (p[:, 0] < scene.W - 5) & (p[:, 1] > 5) & (p[:, 1] < scene.H - 5)
        kpts[v] = np.where(inb[:, None], p, rng.uniform(10, 100, size=(K, 2)))
        kpts[v] += rng.normal(size=(K, 2)) * noise_px
        vis[v] = inb
    matches0 = np.full((len(pairs), K), -1, np.int64)
    conf = np.zeros((len(pairs), K), np.float32)
    for pi, (i, j) in enumerate(pairs):
        good = vis[i] & vis[j]
        idxs = np.where(good)[0][:n_true]
        matches0[pi, idxs] = idxs  # same slot ordering across views
        conf[pi, idxs] = rng.uniform(0.6, 1.0, size=len(idxs))
        # inject outlier matches
        n_out = int(len(idxs) * outlier_frac)
        out_slots = np.where(~good)[0][:n_out]
        for s in out_slots:
            matches0[pi, s] = rng.integers(0, K)
            conf[pi, s] = rng.uniform(0.1, 0.3)
    return scene, kpts, matches0, conf


class TestMultiViewPipeline:
    def test_recovers_tuple_poses(self, rng):
        scene, kpts, matches0, conf = build_tuple_case(rng)
        intr = np.tile(scene.intr[0].astype(np.float32), (5, 1, 1))
        extr = multi_view_pose_pipeline(kpts, intr, matches0, conf)
        assert extr.shape == (5, 4, 4)
        max_r, max_t = 0.0, 0.0
        for j in range(5):
            for i in range(j):
                T_gt = scene.relative_pose(i, j)
                T_pred = extr[j] @ np.linalg.inv(extr[i])
                max_r = max(max_r, rot_err_deg(T_gt[:3, :3], T_pred[:3, :3]))
                max_t = max(max_t, transl_angle_deg(T_gt[:3, 3], T_pred[:3, 3]))
        assert max_r < 1.0, max_r
        assert max_t < 5.0, max_t

    def test_batched_matches_sequential(self, rng):
        """The batched pipeline reproduces per-tuple results (same solvers,
        vmapped; 5e-4 covers f32 reduction-order noise) and stays accurate."""
        cases = [build_tuple_case(rng) for _ in range(3)]
        intr = np.tile(cases[0][0].intr[0].astype(np.float32), (3, 5, 1, 1))
        kpts = np.stack([c[1] for c in cases])
        matches0 = np.stack([c[2] for c in cases])
        conf = np.stack([c[3] for c in cases])
        extr_b = multi_view_pose_pipeline_batch(kpts, intr, matches0, conf)
        assert extr_b.shape == (3, 5, 4, 4)
        for b, (scene, k, m, c) in enumerate(cases):
            extr_s = multi_view_pose_pipeline(k, intr[b], m, c)
            np.testing.assert_allclose(extr_b[b], extr_s, atol=5e-4)
            max_r = max(
                rot_err_deg(
                    scene.relative_pose(i, j)[:3, :3],
                    (extr_b[b, j] @ np.linalg.inv(extr_b[b, i]))[:3, :3],
                )
                for j in range(5) for i in range(j)
            )
            assert max_r < 1.0, (b, max_r)

    def test_runs_with_sparse_matches(self, rng):
        """Pairs with almost no matches must not break the pipeline."""
        scene, kpts, matches0, conf = build_tuple_case(rng, n_true=24)
        # kill most matches of several pairs
        conf[0, :] = 0.0
        conf[3, 5:] = 0.0
        intr = np.tile(scene.intr[0].astype(np.float32), (5, 1, 1))
        extr = multi_view_pose_pipeline(kpts, intr, matches0, conf)
        assert np.all(np.isfinite(extr))


class TestInitModes:
    def test_ransac_modes_match_w8pt_on_high_inlier_fixture(self, rng):
        """The `ransac` / `ransac_ba` init modes (`bundle_adjust_io.py:12-54`,
        host OpenCV RANSAC [+ batched two-view BA]) recover the same tuple
        poses as the default on-device robust w8pt path at high inlier rate."""
        import pytest

        pytest.importorskip("cv2")
        scene, kpts, matches0, conf = build_tuple_case(rng, outlier_frac=0.05)
        intr = np.tile(scene.intr[0].astype(np.float32), (5, 1, 1))
        # measured on this fixture: w8pt_ba 0.50/4.2 deg, ransac_ba 0.67/6.0
        # (the two-view BA refine recovers w8pt-grade accuracy from the RANSAC
        # init), plain ransac 7.0/36 deg (raw 5-point RANSAC at f=140 px is
        # noisy -- it is the reference's init ablation, kept behavioral)
        tol = {"w8pt_ba": (1.0, 5.0), "ransac_ba": (1.5, 8.0),
               "ransac": (10.0, 45.0)}
        for mode in ("w8pt_ba", "ransac", "ransac_ba"):
            extr = multi_view_pose_pipeline(
                kpts, intr, matches0, conf,
                MultiViewPipelineConfig(init_mode=mode))
            max_r = max_t = 0.0
            for j in range(5):
                for i in range(j):
                    T_gt = scene.relative_pose(i, j)
                    T_pred = extr[j] @ np.linalg.inv(extr[i])
                    max_r = max(max_r, rot_err_deg(T_gt[:3, :3], T_pred[:3, :3]))
                    max_t = max(max_t, transl_angle_deg(T_gt[:3, 3], T_pred[:3, 3]))
            assert max_r < tol[mode][0], (mode, max_r)
            assert max_t < tol[mode][1], (mode, max_t)


class TestDevicePipeline:
    def test_device_tree_matches_host(self):
        """`spanning_tree_poses_device` == host Prim's: same tree edge set and
        extrinsics across random weights with deliberate ties, zero-count
        edges, and invalid pairs (tie-break rank epsilon exercised)."""
        import jax
        import jax.numpy as jnp

        from e2e_multi_view_matching_tpu.geom.lie import make_transform
        from e2e_multi_view_matching_tpu.mvba.spanning_tree import (
            spanning_tree_poses,
            spanning_tree_poses_device,
        )

        rng = np.random.default_rng(0)
        V = 5
        pairs = [(i, j) for j in range(V) for i in range(j)]
        P = len(pairs)
        idx_i = np.asarray([p[0] for p in pairs])
        idx_j = np.asarray([p[1] for p in pairs])
        tree_fn = jax.jit(lambda T, c, v: spanning_tree_poses_device(
            T, c, v, idx_i, idx_j, V))
        for _ in range(40):
            A = rng.normal(size=(P, 3, 3))
            R = np.stack([np.linalg.qr(a)[0] for a in A])
            R[:, :, 0] *= np.linalg.det(R)[:, None]
            T_rel = np.asarray(make_transform(
                jnp.asarray(R), jnp.asarray(rng.normal(size=(P, 3))))
            ).astype(np.float32)
            counts = rng.integers(0, 6, size=P).astype(np.int32)
            valid = rng.random(P) > 0.25
            rel = {pairs[p]: T_rel[p] for p in range(P) if valid[p]}
            cnt = {pairs[p]: int(counts[p]) for p in range(P) if valid[p]}
            extr_host, tree = spanning_tree_poses(V, rel, cnt)
            extr_dev, on_tree = tree_fn(
                jnp.asarray(T_rel), jnp.asarray(counts), jnp.asarray(valid))
            assert {pairs[p] for p in range(P) if np.asarray(on_tree)[p]} == set(tree)
            np.testing.assert_allclose(extr_host, np.asarray(extr_dev), atol=1e-5)

    def test_device_pipeline_matches_host_tree_pipeline(self, rng):
        """`multi_view_pose_device` (zero host hops, jitted end-to-end) ==
        `multi_view_pose_pipeline_batch` (host spanning trees)."""
        import jax
        import jax.numpy as jnp

        from e2e_multi_view_matching_tpu.mvba.pipeline import multi_view_pose_device

        cases = [build_tuple_case(rng) for _ in range(2)]
        kpts = np.stack([c[1] for c in cases])
        matches0 = np.stack([c[2] for c in cases])
        conf = np.stack([c[3] for c in cases])
        intr = np.stack([np.tile(c[0].intr[0].astype(np.float32), (5, 1, 1))
                         for c in cases])
        cfg = MultiViewPipelineConfig()
        extr_host = multi_view_pose_pipeline_batch(kpts, intr, matches0, conf, cfg)
        fused = jax.jit(lambda k, i, m, c: multi_view_pose_device(k, i, m, c, cfg))
        extr_dev = np.asarray(fused(jnp.asarray(kpts), jnp.asarray(intr),
                                    jnp.asarray(matches0), jnp.asarray(conf)))
        np.testing.assert_allclose(extr_host, extr_dev, atol=5e-4)
