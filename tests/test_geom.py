"""Unit tests for the geometry core: Lie groups, linalg, epipolar, weighted 8-point."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_multi_view_matching_tpu.geom import lie
from e2e_multi_view_matching_tpu.geom.linalg import safe_eigh, solve_psd, weighted_nullvec
from e2e_multi_view_matching_tpu.geom.epipolar import (
    hartley_normalize,
    motion_from_essential,
    normalize_keypoints,
    sym_epipolar_distance,
    triangulate_points,
)
from e2e_multi_view_matching_tpu.geom.eightpoint import estimate_relative_pose_w8pt
from e2e_multi_view_matching_tpu.geom.metrics import (
    pose_auc,
    rotation_angle_error,
    translation_angle_error,
)


def random_rotation(rng, n=()):
    w = rng.normal(size=n + (3,)) * 0.8
    return np.asarray(lie.so3_exp(jnp.asarray(w, dtype=jnp.float32)))


def make_two_view_scene(rng, n_pts=64, noise=0.0, rot_scale=0.3):
    """Random 3D points in front of two cameras; returns normalized coords + GT."""
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * rot_scale
    R = np.asarray(lie.so3_exp(jnp.asarray(w, dtype=jnp.float32)))
    t = rng.normal(size=3)
    t = t / np.linalg.norm(t)
    # points in front of cam0
    X = rng.uniform(-2, 2, size=(n_pts, 3))
    X[:, 2] = rng.uniform(4, 10, size=n_pts)
    x0 = X[:, :2] / X[:, 2:3]
    X1 = X @ R.T + t
    x1 = X1[:, :2] / X1[:, 2:3]
    if noise > 0:
        x0 = x0 + rng.normal(size=x0.shape) * noise
        x1 = x1 + rng.normal(size=x1.shape) * noise
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    return x0.astype(np.float32), x1.astype(np.float32), T, X.astype(np.float32)


class TestLie:
    def test_so3_exp_log_roundtrip(self, rng):
        # |w| must stay below pi for exp/log to be mutually inverse.
        w = rng.normal(size=(32, 3)).astype(np.float32)
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0.01, 2.8, size=(32, 1)).astype(np.float32)
        R = lie.so3_exp(jnp.asarray(w))
        w2 = lie.so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), w, atol=1e-4)

    def test_so3_exp_orthonormal(self, rng):
        w = rng.normal(size=(8, 3)).astype(np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        for r in R:
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
            assert np.linalg.det(r) > 0.99

    def test_se3_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(16, 6)).astype(np.float32)
        T = lie.se3_exp(jnp.asarray(xi))
        xi2 = lie.se3_log(T)
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-4)

    def test_se3_small_angle(self):
        xi = jnp.array([[1e-9, 0, 0, 1.0, 2.0, 3.0]], dtype=jnp.float32)
        T = lie.se3_exp(xi)
        np.testing.assert_allclose(np.asarray(T[0, :3, 3]), [1.0, 2.0, 3.0], atol=1e-5)

    def test_invert_transform(self, rng):
        xi = rng.normal(size=(4, 6)).astype(np.float32)
        T = lie.se3_exp(jnp.asarray(xi))
        I = np.asarray(T @ lie.invert_transform(T))
        np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), I.shape), atol=1e-5)


class TestLinalg:
    def test_safe_eigh_matches_numpy(self, rng):
        A = rng.normal(size=(5, 7, 7)).astype(np.float32)
        A = A + np.swapaxes(A, -1, -2)
        w, V = safe_eigh(jnp.asarray(A))
        w_np, _ = np.linalg.eigh(A)
        np.testing.assert_allclose(np.asarray(w), w_np, atol=1e-4)
        # reconstruction
        rec = np.asarray(V) @ (np.asarray(w)[..., None] * np.swapaxes(np.asarray(V), -1, -2))
        np.testing.assert_allclose(rec, A, atol=1e-4)

    def test_safe_eigh_grad_finite_on_degenerate(self):
        # Identity has a fully degenerate spectrum; gradients must stay finite.
        def f(A):
            w, V = safe_eigh(A)
            return jnp.sum(V * w[..., None, :])

        g = jax.grad(f)(jnp.eye(4, dtype=jnp.float32))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_weighted_nullvec(self, rng):
        # Build a system with an exact null vector.
        v = rng.normal(size=9)
        v /= np.linalg.norm(v)
        B = rng.normal(size=(64, 9)).astype(np.float32)
        X = B - (B @ v)[:, None] * v[None, :]  # rows orthogonal to v
        w = np.abs(rng.normal(size=64)).astype(np.float32)
        n = np.asarray(weighted_nullvec(jnp.asarray(X[None]), jnp.asarray(w[None])))[0]
        assert abs(abs(n @ v) - 1.0) < 1e-3

    def test_solve_psd(self, rng):
        L = rng.normal(size=(3, 6, 6)).astype(np.float32)
        A = L @ np.swapaxes(L, -1, -2) + 0.1 * np.eye(6, dtype=np.float32)
        x_true = rng.normal(size=(3, 6)).astype(np.float32)
        b = np.einsum("bij,bj->bi", A, x_true)
        x = solve_psd(jnp.asarray(A), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-3)


class TestEpipolar:
    def test_normalize_keypoints(self):
        intr = jnp.array([[[100.0, 0, 50], [0, 200.0, 60], [0, 0, 1]]])
        kpts = jnp.array([[[50.0, 60.0], [150.0, 260.0]]])
        out = np.asarray(normalize_keypoints(kpts, intr))
        np.testing.assert_allclose(out[0], [[0, 0], [1, 1]], atol=1e-6)

    def test_hartley_normalize(self, rng):
        pts = rng.normal(size=(2, 50, 2)).astype(np.float32) * 10 + 3
        pn, T = hartley_normalize(jnp.asarray(pts))
        pn = np.asarray(pn)
        assert np.abs(pn.mean(axis=1)).max() < 1e-4
        mean_dist = np.linalg.norm(pn, axis=-1).mean(axis=1)
        np.testing.assert_allclose(mean_dist, np.sqrt(2), atol=1e-4)
        # T applied to homogeneous pts reproduces pn
        h = np.concatenate([pts, np.ones((2, 50, 1), dtype=np.float32)], axis=-1)
        hn = np.einsum("bij,bnj->bni", np.asarray(T), h)
        np.testing.assert_allclose(hn[..., :2], pn, atol=1e-4)

    def test_triangulate(self, rng):
        x0, x1, T, X = make_two_view_scene(rng)
        P0 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=-1)[None]
        P1 = jnp.asarray(T[None, :3, :])
        Xr = np.asarray(triangulate_points(P0, P1, jnp.asarray(x0[None]), jnp.asarray(x1[None])))[0]
        np.testing.assert_allclose(Xr, X, atol=5e-2)

    def test_motion_from_essential_contains_gt(self, rng):
        x0, x1, T, _ = make_two_view_scene(rng)
        R, t = T[:3, :3], T[:3, 3]
        E = np.asarray(lie.hat(jnp.asarray(t))) @ R
        Rs, ts = motion_from_essential(jnp.asarray(E[None], dtype=jnp.float32))
        Rs, ts = np.asarray(Rs)[0], np.asarray(ts)[0]
        rot_errs = [
            np.degrees(np.arccos(np.clip((np.trace(Rc.T @ R) - 1) / 2, -1, 1)))
            for Rc in Rs
        ]
        t_errs = [
            np.degrees(np.arccos(np.clip(tc @ t / (np.linalg.norm(tc) * np.linalg.norm(t)), -1, 1)))
            for tc in ts
        ]
        best = min(r + te for r, te in zip(rot_errs, t_errs))
        assert best < 0.5

    def test_sym_epipolar_distance_zero_for_exact(self, rng):
        x0, x1, T, _ = make_two_view_scene(rng)
        R, t = T[:3, :3], T[:3, 3]
        E = np.asarray(lie.hat(jnp.asarray(t))) @ R
        d = np.asarray(
            sym_epipolar_distance(
                jnp.asarray(x0[None]), jnp.asarray(x1[None]), jnp.asarray(E[None], dtype=jnp.float32)
            )
        )
        assert d.max() < 1e-6


class TestW8pt:
    def test_recovers_pose_cheirality(self, rng):
        x0s, x1s, Ts = [], [], []
        for _ in range(4):
            x0, x1, T, _ = make_two_view_scene(rng, n_pts=128, noise=1e-4)
            x0s.append(x0)
            x1s.append(x1)
            Ts.append(T)
        intr = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
        conf = jnp.ones((4, 128))
        T_pred, info = estimate_relative_pose_w8pt(
            jnp.asarray(np.stack(x0s)), jnp.asarray(np.stack(x1s)), intr, intr, conf,
            determine_inliers=True,
        )
        T_pred = np.asarray(T_pred)
        for i in range(4):
            r = np.degrees(
                float(rotation_angle_error(jnp.asarray(T_pred[i]), jnp.asarray(Ts[i])))
            )
            te = np.degrees(
                float(translation_angle_error(jnp.asarray(T_pred[i]), jnp.asarray(Ts[i])))
            )
            assert r < 1.0 and te < 2.0, (i, r, te)
        assert np.asarray(info.inliers).mean() > 0.9
        assert np.all(np.asarray(info.valid))

    def test_choose_closest_and_grads(self, rng):
        x0, x1, T, _ = make_two_view_scene(rng, n_pts=64, noise=1e-3)
        intr = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        target = jnp.asarray(T[None])

        def loss(conf):
            T_pred, _ = estimate_relative_pose_w8pt(
                jnp.asarray(x0[None]), jnp.asarray(x1[None]), intr, intr, conf,
                choose_closest=True, target_T021=target,
            )
            return rotation_angle_error(T_pred, target) + translation_angle_error(
                T_pred, target
            )

        conf = jnp.ones((1, 64))
        val = float(loss(conf))
        assert val < 0.1
        g = jax.grad(loss)(conf)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_gradient_descent_on_confidence_reduces_pose_loss(self, rng):
        """Regression: backward pass stays finite over repeated steps (sqrt/norm
        NaN guards in epipolar.py) and the gradient direction is useful."""
        x0, x1, T, _ = make_two_view_scene(rng, n_pts=128, noise=3e-3)
        intr = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        target = jnp.asarray(T[None])

        def loss(conf):
            T_pred, _ = estimate_relative_pose_w8pt(
                jnp.asarray(x0[None]), jnp.asarray(x1[None]), intr, intr, conf,
                choose_closest=True, target_T021=target,
            )
            return rotation_angle_error(T_pred, target) + translation_angle_error(
                T_pred, target
            )

        loss_j = jax.jit(loss)
        grad_j = jax.jit(jax.grad(loss))
        conf = jnp.ones((1, 128))
        start = float(loss_j(conf))
        for _ in range(10):
            g = grad_j(conf)
            assert np.all(np.isfinite(np.asarray(g)))
            conf = jnp.clip(conf - 5.0 * g, 0.0, None)
        assert float(loss_j(conf)) < start

    def test_weights_downweight_outliers(self, rng):
        x0, x1, T, _ = make_two_view_scene(rng, n_pts=100, noise=1e-4)
        # corrupt 30 matches
        x1c = x1.copy()
        x1c[:30] = rng.normal(size=(30, 2)).astype(np.float32)
        conf = np.ones(100, dtype=np.float32)
        conf[:30] = 0.0
        intr = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        T_pred, _ = estimate_relative_pose_w8pt(
            jnp.asarray(x0[None]), jnp.asarray(x1c[None]), intr, intr,
            jnp.asarray(conf[None]),
        )
        r = np.degrees(float(rotation_angle_error(T_pred[0], jnp.asarray(T))))
        assert r < 1.0

    def test_masked_rows_are_inert(self, rng):
        """Zero-confidence rows must not affect the estimate at all."""
        x0, x1, T, _ = make_two_view_scene(rng, n_pts=64, noise=0.0)
        intr = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        conf = jnp.ones((1, 64))
        T_a, _ = estimate_relative_pose_w8pt(
            jnp.asarray(x0[None]), jnp.asarray(x1[None]), intr, intr, conf
        )
        # append garbage rows with zero confidence
        pad0 = np.concatenate([x0, np.full((16, 2), 1e3, np.float32)], axis=0)
        pad1 = np.concatenate([x1, np.full((16, 2), -1e3, np.float32)], axis=0)
        conf_p = jnp.concatenate([conf, jnp.zeros((1, 16))], axis=-1)
        T_b, _ = estimate_relative_pose_w8pt(
            jnp.asarray(pad0[None]), jnp.asarray(pad1[None]), intr, intr, conf_p
        )
        np.testing.assert_allclose(np.asarray(T_a), np.asarray(T_b), atol=1e-4)


class TestMetrics:
    def test_rotation_angle(self, rng):
        w = np.array([0.3, 0, 0], dtype=np.float32)
        T0 = np.eye(4, dtype=np.float32)
        T1 = np.eye(4, dtype=np.float32)
        T1[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray(w)))
        err = float(rotation_angle_error(jnp.asarray(T0), jnp.asarray(T1)))
        np.testing.assert_allclose(err, 0.3, atol=1e-5)

    def test_translation_angle(self):
        T0 = np.eye(4, dtype=np.float32)
        T0[:3, 3] = [1, 0, 0]
        T1 = np.eye(4, dtype=np.float32)
        T1[:3, 3] = [0, 2, 0]
        err = float(translation_angle_error(jnp.asarray(T0), jnp.asarray(T1)))
        np.testing.assert_allclose(err, np.pi / 2, atol=1e-6)

    def test_pose_auc(self):
        errors = [1.0] * 50 + [100.0] * 50
        aucs = pose_auc(errors, [5, 10, 20])
        # half the poses are at 1deg: AUC@5 ~ (recall .5 over [1,5] + ramp) / 5
        assert 0.35 < aucs[0] < 0.5
        assert aucs[0] < aucs[1] < aucs[2] < 0.6

    def test_pose_auc_handles_inf(self):
        aucs = pose_auc([np.inf, 1.0, 2.0], [5])
        assert 0.0 < aucs[0] < 1.0


class TestRansacHost:
    def test_mean_focal_averages_all_four(self):
        """Regression for the upstream estimate_pose quirk: the threshold
        normalizer must average fx0, fy0, fx1, fy1 -- the upstream expression
        double-counts fx0/fy1, which skews the RANSAC threshold whenever
        fx != fy differs between the cameras."""
        from e2e_multi_view_matching_tpu.geom.ransac import mean_focal

        K0 = np.diag([800.0, 400.0, 1.0])
        K1 = np.diag([400.0, 800.0, 1.0])
        # correct: (800+400+400+800)/4 = 600; upstream quirk would give 800
        np.testing.assert_allclose(mean_focal(K0, K1), 600.0)

    def test_ransac_pose_with_asymmetric_intrinsics(self, rng):
        """estimate_pose_ransac recovers the pose with fx != fy and K0 != K1
        (MegaDepth/YFCC-shaped intrinsics), including the integer-section
        np.split over stacked essential candidates."""
        import cv2  # noqa: F401 (skip if unavailable)
        from e2e_multi_view_matching_tpu.geom.ransac import estimate_pose_ransac

        n = 200
        pts = rng.uniform([-1, -1, 3], [1, 1, 7], (n, 3))
        R = np.asarray(lie.so3_exp(jnp.asarray([0.05, 0.25, -0.04], dtype=jnp.float32)))
        t = np.array([0.4, 0.05, 0.02])
        K0 = np.array([[820.0, 0, 320], [0, 410.0, 240], [0, 0, 1]])
        K1 = np.array([[405.0, 0, 320], [0, 790.0, 240], [0, 0, 1]])
        p0 = pts @ K0.T
        p0 = p0[:, :2] / p0[:, 2:]
        pts1 = pts @ R.T + t
        p1 = pts1 @ K1.T
        p1 = p1[:, :2] / p1[:, 2:]
        p0 = p0 + rng.normal(size=p0.shape) * 0.3
        p1 = p1 + rng.normal(size=p1.shape) * 0.3
        # 15% gross outliers
        n_out = 30
        p1[:n_out] = rng.uniform([0, 0], [640, 480], (n_out, 2))
        out = estimate_pose_ransac(p0, p1, K0, K1, thresh=1.0)
        assert out is not None
        R_est, t_est, inliers = out
        rot_err = np.degrees(
            np.arccos(np.clip((np.trace(R_est.T @ R) - 1) / 2, -1, 1)))
        assert rot_err < 1.5
        assert inliers[:n_out].mean() < 0.2
        assert inliers[n_out:].mean() > 0.7
