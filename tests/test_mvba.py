"""Tests for the multi-view pose engine: rotation/translation averaging,
spanning tree, multi-camera Schur BA.

Fixture pattern follows the reference's C++ GTest suites (synthetic camera rigs
with graded noise/outliers, `test_ba_init.cpp`, `test_ba_problem.cpp` --
SURVEY.md section 4), re-expressed for the JAX engine.
"""

import jax.numpy as jnp
import numpy as np

from e2e_multi_view_matching_tpu.geom import lie
from e2e_multi_view_matching_tpu.mvba import (
    bundle_adjust_multi_view,
    rotation_averaging,
    spanning_tree_poses,
    translation_averaging,
)
from e2e_multi_view_matching_tpu.mvba.translation_averaging import edge_directions
from e2e_multi_view_matching_tpu.mvba.spanning_tree import maximum_spanning_tree


def make_rig(rng, n_cams=5, rot_scale=0.4, spread=2.0):
    """Random extrinsic rotations + camera centers for a synthetic rig."""
    Rs = []
    for _ in range(n_cams):
        w = rng.normal(size=3)
        w = w / np.linalg.norm(w) * rng.uniform(0, rot_scale)
        Rs.append(np.asarray(lie.so3_exp(jnp.asarray(w, dtype=jnp.float32))))
    Rs[0] = np.eye(3, dtype=np.float32)
    centers = rng.uniform(-spread, spread, size=(n_cams, 3)).astype(np.float32)
    centers[0] = 0
    return np.stack(Rs), centers


def all_edges(n):
    return np.array([(i, j) for j in range(n) for i in range(j)], dtype=np.int32)


def rot_err_deg(Ra, Rb):
    tr = np.clip((np.trace(Ra.T @ Rb) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(tr))


def perturb_rot(R, rng, angle):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * angle
    return np.asarray(lie.so3_exp(jnp.asarray(w, dtype=jnp.float32))) @ R


class TestRotationAveraging:
    def _run(self, rng, noise=0.0, n_outliers=0, init_perturb=0.2):
        R_gt, _ = make_rig(rng)
        E = all_edges(5)
        R_rel = []
        for k, (i, j) in enumerate(E):
            Rij = R_gt[j] @ R_gt[i].T
            if k < n_outliers:
                Rij = perturb_rot(Rij, rng, 1.0)  # ~57 deg outlier
            elif noise > 0:
                Rij = perturb_rot(Rij, rng, noise)
            R_rel.append(Rij)
        R_init = np.stack([perturb_rot(R, rng, init_perturb) for R in R_gt])
        R_init[0] = R_gt[0]
        R_est = rotation_averaging(
            jnp.asarray(R_init), jnp.asarray(E[:, 0]), jnp.asarray(E[:, 1]),
            jnp.asarray(np.stack(R_rel)), jnp.ones(len(E), bool),
        )
        R_est = np.asarray(R_est)
        # compare up to the global gauge: anchor both at camera 0
        errs = []
        for i in range(5):
            Ra = R_est[i] @ R_est[0].T
            Rb = R_gt[i] @ R_gt[0].T
            errs.append(rot_err_deg(Ra, Rb))
        return max(errs)

    def test_perfect_measurements(self, rng):
        assert self._run(rng, noise=0.0) < 0.1

    def test_noisy_measurements(self, rng):
        assert self._run(rng, noise=0.02) < 2.0

    def test_one_outlier_edge(self, rng):
        # robust IRLS must hold ~degree accuracy despite a 57deg outlier edge
        assert self._run(rng, noise=0.01, n_outliers=1) < 2.0

    def test_bad_init_converges(self, rng):
        assert self._run(rng, noise=0.0, init_perturb=0.5) < 0.5

    def test_underconstrained_graph_stays_finite(self, rng):
        # regression: with O(1) edge weights an absolute 1e-8 Laplacian damping
        # underflows in f32, so a graph with a single valid edge left the
        # reduced system exactly singular and the Cholesky emitted NaNs
        R_gt, _ = make_rig(rng)
        E = all_edges(5)
        R_rel = jnp.asarray(
            np.stack([R_gt[j] @ R_gt[i].T for i, j in E]).astype(np.float32))
        R_init = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (5, 1, 1)))
        for n_valid in (0, 1, 2):
            ev = np.zeros(len(E), bool)
            ev[len(E) - n_valid:] = True
            out = rotation_averaging(
                R_init, jnp.asarray(E[:, 0]), jnp.asarray(E[:, 1]), R_rel,
                jnp.asarray(ev))
            assert np.isfinite(np.asarray(out)).all(), n_valid


class TestTranslationAveraging:
    def _run(self, rng, noise=0.0, n_outliers=0):
        R_gt, c_gt = make_rig(rng)
        E = all_edges(5)
        gammas = []
        for k, (i, j) in enumerate(E):
            d = c_gt[j] - c_gt[i]
            d = d / np.linalg.norm(d)
            if k < n_outliers:
                d = rng.normal(size=3)
                d = d / np.linalg.norm(d)
            elif noise > 0:
                d = d + rng.normal(size=3) * noise
                d = d / np.linalg.norm(d)
            gammas.append(d)
        c_init = c_gt + rng.normal(size=c_gt.shape) * 0.5
        c_init[0] = c_gt[0]
        c_est = translation_averaging(
            jnp.asarray(c_init.astype(np.float32)), jnp.asarray(E[:, 0]),
            jnp.asarray(E[:, 1]), jnp.asarray(np.stack(gammas).astype(np.float32)),
            jnp.ones(len(E), bool),
        )
        c_est = np.asarray(c_est)
        # align scale (translation averaging is scale-free)
        s = np.sum(c_est[1:] * c_gt[1:]) / max(np.sum(c_est[1:] ** 2), 1e-9)
        return np.abs(s * c_est - c_gt).max()

    def test_perfect_directions(self, rng):
        assert self._run(rng) < 0.05

    def test_noisy_directions(self, rng):
        assert self._run(rng, noise=0.01) < 0.15

    def test_outlier_direction(self, rng):
        assert self._run(rng, noise=0.005, n_outliers=1) < 0.25

    def test_edge_directions_formula(self, rng):
        R_gt, c_gt = make_rig(rng)
        E = all_edges(5)
        # build relative poses from extrinsics: T_i2j = extr_j @ inv(extr_i)
        extr = np.zeros((5, 4, 4), np.float32)
        for i in range(5):
            extr[i, :3, :3] = R_gt[i]
            extr[i, :3, 3] = -R_gt[i] @ c_gt[i]
            extr[i, 3, 3] = 1
        R_rel = np.stack([(extr[j] @ np.linalg.inv(extr[i]))[:3, :3] for i, j in E])
        t_rel = np.stack([(extr[j] @ np.linalg.inv(extr[i]))[:3, 3] for i, j in E])
        gam = np.asarray(edge_directions(
            jnp.asarray(R_gt[E[:, 0]]), jnp.asarray(R_rel), jnp.asarray(t_rel)
        ))
        for k, (i, j) in enumerate(E):
            d = c_gt[j] - c_gt[i]
            d = d / np.linalg.norm(d)
            np.testing.assert_allclose(gam[k], d, atol=1e-4)


class TestSpanningTree:
    def test_max_tree(self):
        W = np.zeros((4, 4))
        W[0, 1] = 10
        W[1, 2] = 8
        W[0, 2] = 1
        W[2, 3] = 5
        edges = maximum_spanning_tree(W)
        assert set(edges) == {(0, 1), (1, 2), (2, 3)}

    def test_chained_poses(self, rng):
        R_gt, c_gt = make_rig(rng, n_cams=4)
        extr = np.zeros((4, 4, 4), np.float32)
        for i in range(4):
            extr[i, :3, :3] = R_gt[i]
            extr[i, :3, 3] = -R_gt[i] @ c_gt[i]
            extr[i, 3, 3] = 1
        rel = {}
        counts = {}
        for j in range(4):
            for i in range(j):
                rel[(i, j)] = extr[j] @ np.linalg.inv(extr[i])
                counts[(i, j)] = 10 * (i + j)
        est, tree = spanning_tree_poses(4, rel, counts)
        assert len(tree) == 3
        # exact chaining: est should equal extr (cam0 = identity frame already)
        np.testing.assert_allclose(est, extr, atol=1e-4)


class TestMultiViewBA:
    def make_problem(self, rng, n_cams=5, pts_per_pair=40, noise=1e-4,
                     cam_perturb=0.02):
        R_gt, c_gt = make_rig(rng, n_cams=n_cams, rot_scale=0.3, spread=1.0)
        extr = np.zeros((n_cams, 4, 4), np.float32)
        for i in range(n_cams):
            extr[i, :3, :3] = R_gt[i]
            extr[i, :3, 3] = -R_gt[i] @ c_gt[i]
            extr[i, 3, 3] = 1
        E = all_edges(n_cams)
        cam_a, cam_b, xa, xb, Xw = [], [], [], [], []
        for (i, j) in E:
            X = rng.uniform(-2, 2, size=(pts_per_pair, 3))
            X[:, 2] = rng.uniform(6, 12, size=pts_per_pair)  # in front of the rig
            for k in range(pts_per_pair):
                pa = extr[i, :3, :3] @ X[k] + extr[i, :3, 3]
                pb = extr[j, :3, :3] @ X[k] + extr[j, :3, 3]
                if pa[2] < 0.5 or pb[2] < 0.5:
                    continue
                cam_a.append(i)
                cam_b.append(j)
                xa.append(pa[:2] / pa[2] + rng.normal(size=2) * noise)
                xb.append(pb[:2] / pb[2] + rng.normal(size=2) * noise)
                Xw.append(X[k])
        cam_a = np.asarray(cam_a, np.int32)
        cam_b = np.asarray(cam_b, np.int32)
        xa = np.asarray(xa, np.float32)
        xb = np.asarray(xb, np.float32)
        Xw = np.asarray(Xw, np.float32)
        # perturb all non-fixed cameras
        extr_init = extr.copy()
        for i in range(1, n_cams):
            dw = rng.normal(size=3)
            dw = dw / np.linalg.norm(dw) * cam_perturb
            dT = np.eye(4, dtype=np.float32)
            dT[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray(dw, dtype=jnp.float32)))
            dT[:3, 3] = rng.normal(size=3) * cam_perturb
            extr_init[i] = dT @ extr[i]
        return extr, extr_init, cam_a, cam_b, xa, xb, Xw

    def max_pose_err(self, extr_est, extr_gt):
        errs_r, errs_t = [], []
        for i in range(1, extr_gt.shape[0]):
            # compare pairwise rel poses to be gauge-safe
            Tg = extr_gt[i] @ np.linalg.inv(extr_gt[0])
            Te = extr_est[i] @ np.linalg.inv(extr_est[0])
            errs_r.append(rot_err_deg(Tg[:3, :3], Te[:3, :3]))
            n = np.linalg.norm(Tg[:3, 3]) * np.linalg.norm(Te[:3, 3])
            if n > 1e-9:
                errs_t.append(np.degrees(np.arccos(
                    np.clip(Tg[:3, 3] @ Te[:3, 3] / n, -1, 1))))
        return max(errs_r), max(errs_t) if errs_t else 0.0

    def test_refines_perturbed_cameras(self, rng):
        extr, extr_init, cam_a, cam_b, xa, xb, Xw = self.make_problem(rng)
        w = np.ones(len(cam_a), np.float32)
        r0, t0 = self.max_pose_err(extr_init, extr)
        extr_ba, X_ba = bundle_adjust_multi_view(
            jnp.asarray(extr_init), jnp.asarray(Xw), jnp.asarray(cam_a),
            jnp.asarray(cam_b), jnp.asarray(xa), jnp.asarray(xb), jnp.asarray(w),
            n_iterations=20, retriangulate=True,
        )
        r1, t1 = self.max_pose_err(np.asarray(extr_ba), extr)
        assert r1 < 0.3 * r0, (r0, r1)
        assert t1 < 0.5 * t0, (t0, t1)
        assert r1 < 0.1 and t1 < 1.0

    def test_camera0_fixed(self, rng):
        extr, extr_init, cam_a, cam_b, xa, xb, Xw = self.make_problem(rng)
        w = np.ones(len(cam_a), np.float32)
        extr_ba, _ = bundle_adjust_multi_view(
            jnp.asarray(extr_init), jnp.asarray(Xw), jnp.asarray(cam_a),
            jnp.asarray(cam_b), jnp.asarray(xa), jnp.asarray(xb), jnp.asarray(w),
            n_iterations=5,
        )
        np.testing.assert_allclose(np.asarray(extr_ba)[0], extr_init[0], atol=1e-5)

    def test_zero_weight_points_inert(self, rng):
        extr, extr_init, cam_a, cam_b, xa, xb, Xw = self.make_problem(rng, pts_per_pair=20)
        w = np.ones(len(cam_a), np.float32)
        a = bundle_adjust_multi_view(
            jnp.asarray(extr_init), jnp.asarray(Xw), jnp.asarray(cam_a),
            jnp.asarray(cam_b), jnp.asarray(xa), jnp.asarray(xb), jnp.asarray(w),
            n_iterations=8,
        )[0]
        # append garbage observations with zero weight
        P_extra = 30
        cam_a2 = np.concatenate([cam_a, np.ones(P_extra, np.int32)])
        cam_b2 = np.concatenate([cam_b, np.full(P_extra, 2, np.int32)])
        xa2 = np.concatenate([xa, np.full((P_extra, 2), 5.0, np.float32)])
        xb2 = np.concatenate([xb, np.full((P_extra, 2), -5.0, np.float32)])
        Xw2 = np.concatenate([Xw, np.zeros((P_extra, 3), np.float32)])
        w2 = np.concatenate([w, np.zeros(P_extra, np.float32)])
        b = bundle_adjust_multi_view(
            jnp.asarray(extr_init), jnp.asarray(Xw2), jnp.asarray(cam_a2),
            jnp.asarray(cam_b2), jnp.asarray(xa2), jnp.asarray(xb2), jnp.asarray(w2),
            n_iterations=8,
        )[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_weighted_downweights_outliers(self, rng):
        extr, extr_init, cam_a, cam_b, xa, xb, Xw = self.make_problem(rng)
        n_bad = 50
        xb_c = xb.copy()
        xb_c[:n_bad] += rng.normal(size=(n_bad, 2)) * 0.5
        w = np.ones(len(cam_a), np.float32)
        w[:n_bad] = 0.0
        extr_ba, _ = bundle_adjust_multi_view(
            jnp.asarray(extr_init), jnp.asarray(Xw), jnp.asarray(cam_a),
            jnp.asarray(cam_b), jnp.asarray(xa), jnp.asarray(xb_c), jnp.asarray(w),
            n_iterations=20, retriangulate=True,
        )
        r1, t1 = self.max_pose_err(np.asarray(extr_ba), extr)
        assert r1 < 0.1 and t1 < 1.0
