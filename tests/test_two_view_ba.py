"""Tests for the two-view Schur-complement LM bundle adjustment.

Two-view BA is a *local polisher*: the pipeline feeds it eight-point estimates
that are already near-optimal (`/root/reference/eval_pairs.py:245-256`). Its
objective has the classic flat curved rotation-translation ambiguity valley, so
from large perturbations any implementation (incl. the reference's dense-LU LM
and Ceres) crawls; the tests assert the actual contract -- reprojection error
decreases, near-optimal inits stay near-optimal, large perturbations improve
substantially in variable-projection mode.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from e2e_multi_view_matching_tpu.geom import lie
from e2e_multi_view_matching_tpu.geom.eightpoint import estimate_relative_pose_w8pt
from e2e_multi_view_matching_tpu.geom.epipolar import triangulate_points
from e2e_multi_view_matching_tpu.geom.metrics import (
    rotation_angle_error,
    translation_angle_error,
)
from e2e_multi_view_matching_tpu.pose.two_view_ba import bundle_adjust_two_view


def make_case(rng, n_pts=64, noise=1e-3, rot_perturb=0.05, t_perturb=0.05):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * 0.3
    R = np.asarray(lie.so3_exp(jnp.asarray(w, dtype=jnp.float32)))
    t = rng.normal(size=3)
    t = t / np.linalg.norm(t)
    X = rng.uniform(-2, 2, size=(n_pts, 3))
    X[:, 2] = rng.uniform(4, 10, size=n_pts)
    x0 = X[:, :2] / X[:, 2:3] + rng.normal(size=(n_pts, 2)) * noise
    X1 = X @ R.T + t
    x1 = X1[:, :2] / X1[:, 2:3] + rng.normal(size=(n_pts, 2)) * noise
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    dw = rng.normal(size=3)
    dw = dw / np.linalg.norm(dw) * rot_perturb
    dT = np.eye(4, dtype=np.float32)
    dT[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray(dw, dtype=jnp.float32)))
    dT[:3, 3] = rng.normal(size=3) * t_perturb
    T_init = (dT @ T).astype(np.float32)
    return x0.astype(np.float32), x1.astype(np.float32), T, T_init


def angular_errors(T_pred, T_gt):
    r = np.degrees(float(rotation_angle_error(jnp.asarray(T_pred), jnp.asarray(T_gt))))
    t = np.degrees(float(translation_angle_error(jnp.asarray(T_pred), jnp.asarray(T_gt))))
    return r, t


def reproj_rn(T, x0, x1):
    """Total reprojection residual with freshly triangulated structure."""
    Tj = jnp.asarray(np.asarray(T)[None], dtype=jnp.float32)
    x0j, x1j = jnp.asarray(x0[None]), jnp.asarray(x1[None])
    eyeP = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], -1)
    X = triangulate_points(eyeP[None], Tj[:, :3, :], x0j, x1j)
    pi0 = X[..., :2] / X[..., 2:]
    Xc = jnp.einsum("bij,bkj->bki", Tj[:, :3, :3], X) + Tj[:, None, :3, 3]
    pi1 = Xc[..., :2] / Xc[..., 2:]
    return float(jnp.sum((pi0 - x0j) ** 2) + jnp.sum((pi1 - x1j) ** 2))


class TestTwoViewBA:
    def test_polishes_near_optimal_init(self, rng):
        """From a w8pt-quality init, BA reduces reprojection error and keeps the
        pose near-optimal (the `eval_pairs.py` w8pt_ba pipeline contract)."""
        x0, x1, T, _ = make_case(rng, n_pts=128, noise=3e-4)
        intr = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        T_w8, info = estimate_relative_pose_w8pt(
            jnp.asarray(x0[None]), jnp.asarray(x1[None]), intr, intr,
            jnp.ones((1, 128)), determine_inliers=True,
        )
        conf = jnp.where(info.pos_depth_mask, 1.0, 0.0)
        T_ba, valid = bundle_adjust_two_view(
            info.kpts0_norm, info.kpts1_norm, conf, T_w8, n_iterations=10,
        )
        assert bool(valid[0])
        r_w8, t_w8 = angular_errors(np.asarray(T_w8[0]), T)
        r_ba, t_ba = angular_errors(np.asarray(T_ba[0]), T)
        assert reproj_rn(T_ba[0], x0, x1) <= reproj_rn(T_w8[0], x0, x1) * 1.01
        assert r_ba < max(1.5 * r_w8, 0.3)
        assert t_ba < max(1.5 * t_w8, 0.5)

    def test_variable_projection_recovers_large_perturbation(self, rng):
        """retriangulate=True escapes the structure lock-in of the joint
        parameterization and substantially improves a ~3 deg perturbed init."""
        x0, x1, T, T_init = make_case(rng, n_pts=128, noise=1e-4)
        r_i, t_i = angular_errors(T_init, T)
        T_ba, _ = bundle_adjust_two_view(
            jnp.asarray(x0[None]), jnp.asarray(x1[None]), jnp.ones((1, 128)),
            jnp.asarray(T_init[None]), n_iterations=50, retriangulate=True,
        )
        r_ba, t_ba = angular_errors(np.asarray(T_ba[0]), T)
        assert r_ba < 0.5 * r_i, (r_i, r_ba)
        assert t_ba < 0.9 * t_i, (t_i, t_ba)
        assert reproj_rn(T_ba[0], x0, x1) < reproj_rn(T_init, x0, x1) * 0.01

    def test_gate_on_few_matches(self, rng):
        x0, x1, T, T_init = make_case(rng)
        conf = np.zeros((1, 64), np.float32)
        conf[0, :5] = 1.0  # only 5 matches -> invalid
        T_out, valid = bundle_adjust_two_view(
            jnp.asarray(x0[None]), jnp.asarray(x1[None]), jnp.asarray(conf),
            jnp.asarray(T_init[None]), n_iterations=5,
        )
        assert not bool(valid[0])
        np.testing.assert_allclose(np.asarray(T_out[0]), T_init, atol=1e-6)

    def test_zero_conf_rows_inert(self, rng):
        x0, x1, T, T_init = make_case(rng)
        conf_full = jnp.ones((1, 64))
        T_a, _ = bundle_adjust_two_view(
            jnp.asarray(x0[None]), jnp.asarray(x1[None]), conf_full,
            jnp.asarray(T_init[None]), n_iterations=8,
        )
        pad0 = np.concatenate([x0, np.full((16, 2), 3.0, np.float32)])[None]
        pad1 = np.concatenate([x1, np.full((16, 2), -3.0, np.float32)])[None]
        conf_pad = jnp.concatenate([conf_full, jnp.zeros((1, 16))], axis=-1)
        T_b, _ = bundle_adjust_two_view(
            jnp.asarray(pad0), jnp.asarray(pad1), conf_pad,
            jnp.asarray(T_init[None]), n_iterations=8,
        )
        np.testing.assert_allclose(np.asarray(T_a), np.asarray(T_b), atol=1e-4)

    def test_outliers_downweighted(self, rng):
        x0, x1, T, T_init = make_case(
            rng, n_pts=80, noise=1e-4, rot_perturb=0.005, t_perturb=0.005
        )
        x1c = x1.copy()
        x1c[:20] += rng.normal(size=(20, 2)) * 0.3  # gross outliers
        conf = np.ones((1, 80), np.float32)
        conf[0, :20] = 0.0
        T_out, _ = bundle_adjust_two_view(
            jnp.asarray(x0[None]), jnp.asarray(x1c[None]), jnp.asarray(conf),
            jnp.asarray(T_init[None]), n_iterations=10,
        )
        r, t = angular_errors(np.asarray(T_out[0]), T)
        r_i, t_i = angular_errors(T_init, T)
        assert r <= r_i * 1.5 and t <= t_i * 1.5
        assert np.all(np.isfinite(np.asarray(T_out)))

    def test_output_finite_with_degenerate_input(self, rng):
        x0 = np.zeros((1, 32, 2), np.float32)
        x1 = np.zeros((1, 32, 2), np.float32)
        T_init = np.eye(4, dtype=np.float32)[None]
        T_out, valid = bundle_adjust_two_view(
            jnp.asarray(x0), jnp.asarray(x1), jnp.ones((1, 32)),
            jnp.asarray(T_init), n_iterations=5,
        )
        assert np.all(np.isfinite(np.asarray(T_out)))

    def test_batched_mixed_validity(self, rng):
        """One valid + one invalid sample in a batch: both outputs sane."""
        x0, x1, T, T_init = make_case(rng, n_pts=32, rot_perturb=0.01, t_perturb=0.01)
        conf = np.ones((2, 32), np.float32)
        conf[1, 8:] = 0.0  # second sample: only 8... make it 5 valid
        conf[1, 5:] = 0.0
        x0b = np.stack([x0, x0])
        x1b = np.stack([x1, x1])
        Tib = np.stack([T_init, T_init])
        T_out, valid = bundle_adjust_two_view(
            jnp.asarray(x0b), jnp.asarray(x1b), jnp.asarray(conf),
            jnp.asarray(Tib), n_iterations=5,
        )
        assert bool(valid[0]) and not bool(valid[1])
        np.testing.assert_allclose(np.asarray(T_out[1]), T_init, atol=1e-6)
        assert np.all(np.isfinite(np.asarray(T_out[0])))

    def test_gradients_finite(self, rng):
        """BA must be differentiable wrt keypoints without NaN leakage.

        Regression for the SoA rework: a det floor of 1e-30 in the point-block
        inverse let a near-singular Hpp emit an overflowing delta whose Inf,
        though masked out of the primal by step_ok, poisoned the VJP of the
        update `where` (Inf * 0 = NaN).

        Runs in a SUBPROCESS: this grad is the deepest compile in the suite
        (VJP of a 5-iteration unrolled Schur LM), and the XLA *CPU* compiler
        segfaults on it late in a long single-process pytest run
        (deterministically at this test across 4 round-5 full-suite runs;
        passes in isolation, with either suite half, with torch excluded, and
        with a 128 MB stack -- an accumulated-compiler-state bug in XLA, not
        a property of this graph). A fresh interpreter compiles it fine, so
        isolate it the way tests/test_multihost.py isolates its processes.
        """
        import subprocess
        import sys
        import textwrap

        code = textwrap.dedent("""
            import os
            os.environ["JAX_PLATFORMS"] = "cpu"
            import jax, jax.numpy as jnp, numpy as np
            jax.config.update("jax_platforms", "cpu")
            import sys
            sys.path.insert(0, %r)
            from tests.test_two_view_ba import make_case
            from e2e_multi_view_matching_tpu.pose.two_view_ba import (
                bundle_adjust_two_view)
            rng = np.random.default_rng(0)
            x0, x1, T, T_init = make_case(rng, n_pts=64, noise=5e-4)
            x0j = jnp.asarray(x0[None]); x1j = jnp.asarray(x1[None])
            conf = jnp.ones((1, 64), jnp.float32)
            Ti = jnp.asarray(T_init[None])
            def loss(x0_):
                T_out, _ = bundle_adjust_two_view(
                    x0_, x1j, conf, Ti, n_iterations=5)
                return jnp.sum(T_out[:, :3, :] ** 2)
            g = jax.grad(loss)(x0j)
            assert bool(jnp.all(jnp.isfinite(g))), "non-finite BA gradient"
            print("BA_GRAD_FINITE_OK")
        """) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),)
        env = dict(os.environ, PYTHONPATH="")
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=600)
        assert out.returncode == 0, (out.stdout, out.stderr)
        assert "BA_GRAD_FINITE_OK" in out.stdout
