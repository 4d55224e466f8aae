"""SO(3)/SE(3) Lie group operations in pure JAX.

TPU-native replacement for the reference's pytorch3d usage
(`/root/reference/pose_optimization/two_view/bundle_adjust_gauss_newton_2_view.py:63,194`:
`pytorch3d.transforms.so3.hat`, `se3_exp_map`).

Conventions: transforms act on column vectors, X' = R @ X + t. A 4x4 transform is
``[[R, t], [0, 1]]``. The se(3) tangent vector is ``[omega(3), nu(3)]`` (rotation
first). All functions broadcast over leading batch dimensions.
"""

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """Skew-symmetric matrix of w (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def _sinc_coeffs(theta_sq):
    """Taylor-stable coefficients a=sin(t)/t, b=(1-cos t)/t^2, c=(t - sin t)/t^3."""
    theta = jnp.sqrt(theta_sq + _EPS)
    small = theta_sq < 1e-8
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / (theta_sq + _EPS))
    c = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (theta_sq * theta + _EPS))
    return a, b, c


def so3_exp(w):
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation matrix."""
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_coeffs(theta_sq)
    K = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R):
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Stable away from theta = pi (sufficient for iterative refinement where
    increments are small; averaging initializations keep residual rotations
    well below pi).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # vee of the antisymmetric part
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    small = theta < 1e-4
    # v = 2 sin(theta) * axis; w = theta * axis
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / (2.0 * sin_theta + _EPS),
    )
    # Near theta = pi use the diagonal-based fallback.
    near_pi = theta > jnp.pi - 1e-3
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos_theta[..., None]) / (1.0 - cos_theta[..., None] + _EPS), 0.0, None)
    axis_pi = jnp.sqrt(axis_sq)
    # fix signs from off-diagonals (largest-axis heuristic)
    sign = jnp.sign(
        jnp.stack(
            [
                R[..., 2, 1] - R[..., 1, 2],
                R[..., 0, 2] - R[..., 2, 0],
                R[..., 1, 0] - R[..., 0, 1],
            ],
            axis=-1,
        )
        + _EPS
    )
    w_pi = theta[..., None] * axis_pi * sign
    w = scale[..., None] * v
    return jnp.where(near_pi[..., None], w_pi, w)


def se3_exp(xi):
    """se(3) tangent [omega, nu] (..., 6) -> (..., 4, 4) transform."""
    w, nu = xi[..., :3], xi[..., 3:]
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, c = _sinc_coeffs(theta_sq)
    K = hat(w)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    R = eye + a[..., None, None] * K + b[..., None, None] * KK
    V = eye + b[..., None, None] * K + c[..., None, None] * KK
    t = (V @ nu[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T):
    """(..., 4, 4) transform -> se(3) tangent [omega, nu] (..., 6)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, c = _sinc_coeffs(theta_sq)
    K = hat(w)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    # V^{-1} = I - K/2 + (1/theta^2)(1 - a/(2b)) K^2  (standard closed form)
    coef = jnp.where(
        theta_sq < 1e-8,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - a / (2.0 * b + _EPS)) / (theta_sq + _EPS),
    )
    V_inv = eye - 0.5 * K + coef[..., None, None] * KK
    nu = (V_inv @ t[..., None])[..., 0]
    return jnp.concatenate([w, nu], axis=-1)


def make_transform(R, t):
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def invert_transform(T):
    """Closed-form SE(3) inverse (no linear solve)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -(R_inv @ t[..., None])[..., 0]
    return make_transform(R_inv, t_inv)
