"""SE(3) / SO(3) Lie-group operations, batched, pure JAX.

Replaces Sophus::SE3d/SO3d (Thirdparty/Sophus/sophus/{se3,so3}.hpp) and
g2o::SE3Quat (Thirdparty/g2o/g2o/types/se3quat.h) used throughout the
reference (include/System.h:30, src/Converter.cc:30-225).

Conventions
-----------
- A pose is a 4x4 row-major homogeneous matrix ``T`` with ``T = [R t; 0 1]``.
  ``Tcw`` maps world -> camera, as in the reference (src/Frame.cc:231-273).
- Tangent vectors are ``xi = (upsilon, omega)`` — translation part first,
  rotation part last (Sophus ordering).
- Everything broadcasts over leading batch axes.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(omega: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric."""
    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # Taylor-safe coefficients: sin(t)/t and (1-cos(t))/t^2.
    a = jnp.sin(theta) / theta
    b = (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, a)
    b = jnp.where(small, 0.5 - theta2 / 24.0, b)
    K = hat(omega)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * KK


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse Rodrigues: (..., 3, 3) -> (..., 3) axis-angle.

    Numerically robust near theta = 0 and theta = pi, and AD-safe: the
    angle comes from atan2 (arccos has an infinite derivative at the
    identity), and every guarded branch evaluates finitely on the
    inputs of the other branch so jnp.where doesn't poison gradients.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # Generic branch: axis from the antisymmetric part.
    w_skew = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = 0.5 * jnp.sqrt(jnp.sum(w_skew * w_skew, axis=-1) + _EPS * _EPS)
    theta = jnp.arctan2(sin_t, cos_t)
    small = theta < 1e-4
    sin_safe = jnp.where(sin_t < 1e-6, 1.0, sin_t)
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,  # theta/(2 sin theta) Taylor
        theta / (2.0 * sin_safe),
    )
    w_generic = scale[..., None] * w_skew
    # Near-pi branch: axis^2 from diagonal, signs from off-diagonals.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag - cos_t[..., None]) / (1.0 - cos_t[..., None] + _EPS), 0.0, 1.0)
    axis = jnp.sqrt(axis2 + 1e-12)
    # Fix signs using the larger of the antisymmetric entries, falling back
    # to symmetric off-diagonal products (R[i,j]+R[j,i] = 2 a_i a_j (1-cos)).
    sx = jnp.where(jnp.abs(w_skew[..., 0]) > 1e-6, jnp.sign(w_skew[..., 0]), 1.0)
    sy = jnp.where(
        jnp.abs(w_skew[..., 1]) > 1e-6,
        jnp.sign(w_skew[..., 1]),
        jnp.where(jnp.abs(R[..., 0, 1] + R[..., 1, 0]) > 1e-6,
                  sx * jnp.sign(R[..., 0, 1] + R[..., 1, 0]), 1.0),
    )
    sz = jnp.where(
        jnp.abs(w_skew[..., 2]) > 1e-6,
        jnp.sign(w_skew[..., 2]),
        jnp.where(jnp.abs(R[..., 0, 2] + R[..., 2, 0]) > 1e-6,
                  sx * jnp.sign(R[..., 0, 2] + R[..., 2, 0]), 1.0),
    )
    w_pi = theta[..., None] * axis * jnp.stack([sx, sy, sz], axis=-1)
    near_pi = theta > (jnp.pi - 1e-3)
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def _left_jacobian(omega: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V(omega): integrates translation in SE(3) exp."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    b = (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS)
    c = (theta - jnp.sin(theta)) / (theta2 * theta + _EPS * _EPS * _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, b)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, c)
    K = hat(omega)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * KK


def _left_jacobian_inv(omega: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    half = 0.5 * theta
    # coef = (1/theta^2)(1 - theta sin / (2(1-cos)))  =  1/theta^2 - cot(theta/2)/(2 theta)
    cot_term = half * jnp.cos(half) / (jnp.sin(half) + _EPS)
    coef = (1.0 - cot_term) / (theta2 + _EPS * _EPS)
    coef = jnp.where(theta2 < 1e-8, 1.0 / 12.0 + theta2 / 720.0, coef)
    K = hat(omega)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye - 0.5 * K + coef[..., None, None] * KK


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential: (..., 6) tangent (upsilon, omega) -> (..., 4, 4)."""
    ups, omega = xi[..., :3], xi[..., 3:]
    R = so3_exp(omega)
    t = jnp.einsum("...ij,...j->...i", _left_jacobian(omega), ups)
    return from_rt(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) logarithm: (..., 4, 4) -> (..., 6) tangent (upsilon, omega)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    omega = so3_log(R)
    ups = jnp.einsum("...ij,...j->...i", _left_jacobian_inv(omega), t)
    return jnp.concatenate([ups, omega], axis=-1)


def from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) from (..., 3, 3) and (..., 3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def inv(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid transform (exploits orthogonality of R)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return from_rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(Ta: jnp.ndarray, Tb: jnp.ndarray) -> jnp.ndarray:
    return Ta @ Tb


def transform(T: jnp.ndarray, pt: jnp.ndarray) -> jnp.ndarray:
    """Apply pose(s) (..., 4, 4) to single point(s) (..., 3)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    return jnp.einsum("...ij,...j->...i", R, pt) + t


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply pose(s) to a point array: T (..., 4, 4), pts (..., N, 3)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (x, y, z, w), TUM/Sophus order -> rotation matrix."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), branch-free (Shepperd)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best via where.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 0.5
    q0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw0 * qw0], -1) / (4.0 * qw0[..., None])
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 0.5
    q1 = jnp.stack([4.0 * qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], -1) / (4.0 * qx1[..., None])
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 0.5
    q2 = jnp.stack([(m01 + m10), 4.0 * qy2 * qy2, (m12 + m21), (m02 - m20)], -1) / (4.0 * qy2[..., None])
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 0.5
    q3 = jnp.stack([(m02 + m20), (m12 + m21), 4.0 * qz3 * qz3, (m10 - m01)], -1) / (4.0 * qz3[..., None])
    # Choose branch by largest diagonal-based magnitude.
    c0 = tr
    c1 = m00 - m11 - m22
    c2 = m11 - m00 - m22
    c3 = m22 - m00 - m11
    cands = jnp.stack([c0, c1, c2, c3], axis=-1)
    best = jnp.argmax(cands, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)


def normalize_rotation(R: jnp.ndarray) -> jnp.ndarray:
    """Project a near-rotation matrix back onto SO(3) via quaternions."""
    return quat_to_rot(rot_to_quat(R))
