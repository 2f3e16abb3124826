"""Batched reprojection residuals + analytic Jacobians.

The math of g2o's EdgeSE3ProjectXYZ (Thirdparty/g2o/g2o/types/
types_six_dof_expmap.cpp) as array ops.  Pose tangent convention:
left-multiplicative update Tcw' = exp(delta) @ Tcw with
delta = (upsilon, omega) — so d(pc)/d(upsilon) = I and
d(pc)/d(omega) = -[pc]_x.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..geom import se3


class Residuals(NamedTuple):
    r: jnp.ndarray        # (N, 2) residual = proj(pc) - uv_obs
    J_pose: jnp.ndarray   # (N, 2, 6)
    J_point: jnp.ndarray  # (N, 2, 3)
    depth: jnp.ndarray    # (N,) camera z (for positive-depth gating)


def project_jacobians(
    Tcw: jnp.ndarray,
    pts_w: jnp.ndarray,
    uv_obs: jnp.ndarray,
    fx: float, fy: float, cx: float, cy: float,
) -> Residuals:
    """Tcw: (4,4) or (N,4,4) per-obs poses; pts_w, uv_obs: (N,3), (N,2)."""
    R = Tcw[..., :3, :3]
    t = Tcw[..., :3, 3]
    if Tcw.ndim == 2:
        pc = pts_w @ R.T + t
    else:
        pc = jnp.einsum("nij,nj->ni", R, pts_w) + t
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z = 1.0 / zs
    u = fx * x * inv_z + cx
    v = fy * y * inv_z + cy
    r = jnp.stack([u, v], -1) - uv_obs

    # d(uv)/d(pc): (N, 2, 3)
    zero = jnp.zeros_like(x)
    duv_dpc = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * x * inv_z * inv_z], -1),
            jnp.stack([zero, fy * inv_z, -fy * y * inv_z * inv_z], -1),
        ],
        axis=-2,
    )
    # d(pc)/d(delta) = [I | -hat(pc)]: (N, 3, 6)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3))
    dpc_ddelta = jnp.concatenate([eye, -se3.hat(pc)], axis=-1)
    J_pose = duv_dpc @ dpc_ddelta  # (N, 2, 6)
    if Tcw.ndim == 2:
        J_point = duv_dpc @ R  # (N, 2, 3)
    else:
        J_point = duv_dpc @ R
    return Residuals(r=r, J_pose=J_pose, J_point=J_point, depth=z)


def chi2(r: jnp.ndarray, inv_sigma2: jnp.ndarray) -> jnp.ndarray:
    """Per-observation chi-squared error (N,)."""
    return jnp.sum(r * r, axis=-1) * inv_sigma2


def huber_weight(c2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel with threshold delta (given
    squared): w = 1 inside, delta/|r| outside — the rho'(e) of g2o's
    RobustKernelHuber with delta = sqrt(delta2)."""
    return jnp.where(c2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(c2, 1e-12)))
