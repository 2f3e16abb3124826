"""Sim(3) similarity transforms, batched, pure JAX.

Replaces g2o::Sim3 (Thirdparty/g2o/g2o/types/sim3.h) used for loop
correction (src/LoopClosing.cc:497-597) and the 7-DoF essential-graph
optimization (src/Optimizer.cc:654-983).

Representation
--------------
A Sim3 is a dict-free flat vector ``g = (q[4 xyzw], t[3], s[1])`` of
shape (..., 8), acting on points as ``x' = s * R(q) @ x + t``.  We also
provide tangent-space exp/log with ordering ``(upsilon, omega, sigma)``
(translation, rotation, log-scale), 7-dim.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import se3

_EPS = 1e-8


def make(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Pack rotation (..., 3, 3), translation (..., 3), scale (...)."""
    q = se3.rot_to_quat(R)
    s = jnp.asarray(s, dtype=t.dtype)
    batch = jnp.broadcast_shapes(q.shape[:-1], t.shape[:-1], s.shape)
    q = jnp.broadcast_to(q, batch + (4,))
    t = jnp.broadcast_to(t, batch + (3,))
    s = jnp.broadcast_to(s, batch)
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([0, 0, 0, 1, 0, 0, 0, 1], dtype=dtype)


def rot(g: jnp.ndarray) -> jnp.ndarray:
    return se3.quat_to_rot(g[..., :4])


def trans(g: jnp.ndarray) -> jnp.ndarray:
    return g[..., 4:7]


def scale(g: jnp.ndarray) -> jnp.ndarray:
    return g[..., 7]


def from_se3(T: jnp.ndarray, s=1.0) -> jnp.ndarray:
    """Lift an SE(3) matrix to Sim(3) with given scale (default 1)."""
    return make(T[..., :3, :3], T[..., :3, 3], jnp.asarray(s, T.dtype))


def to_se3(g: jnp.ndarray) -> jnp.ndarray:
    """Project to SE(3) by folding scale into translation: [R, t/s].

    Mirrors the loop-closing SE3 write-back in the reference
    (src/LoopClosing.cc:565-571 and src/Optimizer.cc:944-953: the
    corrected pose is R, t/s).
    """
    s = scale(g)
    return se3.from_rt(rot(g), trans(g) / s[..., None])


def apply(g: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Act on points (..., N, 3): s R x + t."""
    R = rot(g)
    return scale(g)[..., None, None] * jnp.einsum("...ij,...nj->...ni", R, pts) \
        + trans(g)[..., None, :]


def apply_one(g: jnp.ndarray, pt: jnp.ndarray) -> jnp.ndarray:
    R = rot(g)
    return scale(g)[..., None] * jnp.einsum("...ij,...j->...i", R, pt) + trans(g)


def compose(ga: jnp.ndarray, gb: jnp.ndarray) -> jnp.ndarray:
    """Group product: (ga*gb)(x) = ga(gb(x))."""
    Ra, ta, sa = rot(ga), trans(ga), scale(ga)
    Rb, tb, sb = rot(gb), trans(gb), scale(gb)
    R = Ra @ Rb
    t = sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return make(R, t, sa * sb)


def inv(g: jnp.ndarray) -> jnp.ndarray:
    R, t, s = rot(g), trans(g), scale(g)
    Rt = jnp.swapaxes(R, -1, -2)
    tinv = -jnp.einsum("...ij,...j->...i", Rt, t) / s[..., None]
    return make(Rt, tinv, 1.0 / s)


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) exponential map, tangent ordering (upsilon, omega, sigma).

    Uses the closed-form W matrix (Strasdat's thesis / Sophus sim3):
    R = exp(omega), s = e^sigma, t = W upsilon.
    """
    ups, omega, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = se3.so3_exp(omega)
    s = jnp.exp(sigma)
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = se3.hat(omega)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)

    # W = A*K + B*K^2 + C*I with W = integral_0^1 e^{sigma u} exp(u omega) du
    # (Strasdat's thesis; same coefficient structure as Sophus sim3).
    sig_small = jnp.abs(sigma) < 1e-5
    th_small = theta2 < 1e-8
    sig_safe = jnp.where(sig_small, 1.0, sigma)

    C = jnp.where(sig_small,
                  1.0 + sigma / 2.0 + sigma * sigma / 6.0,
                  (s - 1.0) / sig_safe)

    # both sigma and theta generic
    a_gen = s * jnp.sin(theta)
    b_gen = s * jnp.cos(theta)
    c_gen = jnp.where(theta2 + sigma * sigma < 1e-12, 1.0, theta2 + sigma * sigma)
    A_ll = (a_gen * sigma + (1.0 - b_gen) * theta) / (theta * c_gen)
    B_ll = (C - ((b_gen - 1.0) * sigma + a_gen * theta) / c_gen) / (theta2 + _EPS * _EPS)
    # sigma ~ 0, theta generic: reduces to the SE(3) left Jacobian
    A_sl = (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS)
    B_sl = (theta - jnp.sin(theta)) / (theta2 * theta + _EPS)
    # theta ~ 0, sigma generic: A = int u e^{su} du, B = int u^2/2 e^{su} du
    A_ls = jnp.where(sig_small, 0.5, ((sigma - 1.0) * s + 1.0) / (sig_safe * sig_safe))
    B_ls = jnp.where(sig_small, 1.0 / 6.0,
                     (s * (sigma * sigma - 2.0 * sigma + 2.0) - 2.0)
                     / (2.0 * sig_safe ** 3))

    A = jnp.where(th_small, A_ls, jnp.where(sig_small, A_sl, A_ll))
    B = jnp.where(th_small, B_ls, jnp.where(sig_small, B_sl, B_ll))

    W = A[..., None, None] * K + B[..., None, None] * KK + C[..., None, None] * eye
    t = jnp.einsum("...ij,...j->...i", W, ups)
    return make(R, t, s)


def log(g: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) log map -> (upsilon, omega, sigma), (..., 7).

    Inverts exp() by recomputing W from (omega, sigma) and solving
    W upsilon = t (3x3 solve — cheap and exact).
    """
    R, t, s = rot(g), trans(g), scale(g)
    omega = se3.so3_log(R)
    sigma = jnp.log(s)

    # Rebuild W by pushing tangent basis vectors through exp (guarantees
    # exp/log consistency), then solve the 3x3 system W upsilon = t.
    def _w_col(e):
        xi = jnp.concatenate(
            [jnp.broadcast_to(e, omega.shape), omega, sigma[..., None]], -1)
        return trans(exp(xi))

    eye = jnp.eye(3, dtype=t.dtype)
    W = jnp.stack([_w_col(eye[0]), _w_col(eye[1]), _w_col(eye[2])], axis=-1)
    ups = jnp.linalg.solve(W, t[..., :, None])[..., 0]
    return jnp.concatenate([ups, omega, sigma[..., None]], axis=-1)
