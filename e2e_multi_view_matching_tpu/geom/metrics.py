"""Pose error metrics and AUC.

Mirrors `/root/reference/pose_optimization/two_view/compute_pose_error.py` and the
`pose_auc` contract of the reference's models/utils (SURVEY.md section 2.4).
"""

import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


def safe_arccos(x, eps=1e-6):
    """arccos with inputs clamped strictly inside (-1, 1).

    d/dx arccos = -1/sqrt(1-x^2) is infinite at +-1; the reference lives with
    that and skips non-finite-gradient steps (`train.py:422`). Clamping to
    1 - eps keeps gradients large-but-finite so no step is ever discarded.
    """
    return jnp.arccos(jnp.clip(x, -1.0 + eps, 1.0 - eps))


def rotation_angle_error(T0, T1, reduce=True, degrees=False):
    """Geodesic rotation angle between the rotation parts of T0 and T1.

    Contract of `compute_rotation_error` (`compute_pose_error.py:3-12`): trace
    formula with clamping, optional mean reduction.
    """
    R0 = T0[..., :3, :3]
    R1 = T1[..., :3, :3]
    trace = jnp.einsum("...ji,...ji->...", R0, R1)
    err = jnp.abs(safe_arccos((trace - 1.0) * 0.5))
    if degrees:
        err = jnp.degrees(err)
    if reduce:
        return jnp.mean(err)
    return err


def translation_angle_error(T0, T1, reduce=True, degrees=False):
    """Angle between translation vectors of T0 and T1.

    Contract of `compute_translation_error_as_angle` (`compute_pose_error.py:14-22`).
    The reference drops entries with near-zero norm product from the mean; with
    static shapes we zero their contribution and renormalize the mean weightedly.
    """
    t0 = T0[..., :3, 3]
    t1 = T1[..., :3, 3]
    n = jnp.linalg.norm(t0, axis=-1) * jnp.linalg.norm(t1, axis=-1)
    valid = n > 1e-6
    cos_a = jnp.sum(t0 * t1, axis=-1) / jnp.maximum(n, 1e-6)
    err = jnp.abs(safe_arccos(cos_a))
    err = jnp.where(valid, err, 0.0)
    if degrees:
        err = jnp.degrees(err)
    if reduce:
        denom = jnp.maximum(jnp.sum(valid.astype(err.dtype)), 1.0)
        return jnp.sum(err) / denom
    return err


def pose_error_max(T_gt, T_pred, degrees=True):
    """max(rotation error, translation angle error), the benchmark pose error.

    Contract of `compute_pose_error` usage (`eval_pairs.py:263-266`).
    """
    r = rotation_angle_error(T_gt, T_pred, reduce=False, degrees=degrees)
    t = translation_angle_error(T_gt, T_pred, reduce=False, degrees=degrees)
    return jnp.maximum(r, t)


def pose_auc(errors, thresholds=(5, 10, 20)):
    """Trapezoidal AUC of the cumulative error-recall curve (host-side numpy).

    Same algorithm as the upstream SuperGlue `pose_auc` used by
    `eval_pairs.py:270` / `eval_multi_view.py:72-74`.
    """
    errors = np.asarray([np.inf if not np.isfinite(e) else float(e) for e in np.ravel(errors)])
    sort_idx = np.argsort(errors)
    errors = np.concatenate([[0.0], errors[sort_idx]])
    recall = (np.arange(len(errors))) / (len(errors) - 1)
    aucs = []
    for t in thresholds:
        last_index = np.searchsorted(errors, t)
        r = np.concatenate([recall[:last_index], [recall[last_index - 1]]])
        e = np.concatenate([errors[:last_index], [t]])
        aucs.append(float(np.trapezoid(r, x=e) / t))
    return aucs
