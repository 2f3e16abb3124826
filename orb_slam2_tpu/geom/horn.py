"""Horn's 1987 closed-form similarity from point correspondences, batched.

Replaces Sim3Solver::ComputeSim3 (src/Sim3Solver.cc:327-453): centroids,
M = Pr1 @ Pr2^T, the symmetric 4x4 N matrix, rotation from its top
eigenvector, scale from the projection ratio, translation closing the
loop.  Batched over the leading axis so a whole RANSAC hypothesis set
(e.g. 256 minimal 3-point samples) is solved in ONE eigh call — the
TPU-native replacement for the sequential RANSAC loop of
src/Sim3Solver.cc:200-294.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import sim3 as sim3_mod


def horn_sim3(
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    fix_scale: bool = False,
) -> jnp.ndarray:
    """Solve min_{s,R,t} sum_i w_i |p1_i - (s R p2_i + t)|^2.

    p1, p2: (..., N, 3) corresponding 3D point sets (camera-1 frame and
    camera-2 frame respectively, matching the reference's convention
    that the result maps frame 2 into frame 1, i.e. T12).
    Returns a Sim3 vector (..., 8) (q, t, s); see geom.sim3.

    With ``fix_scale=True`` the scale is pinned to 1 (the reference's
    stereo path; kept for API completeness, src/Sim3Solver.cc:41).
    """
    if weights is None:
        weights = jnp.ones(p1.shape[:-1], dtype=p1.dtype)
    wsum = jnp.sum(weights, axis=-1, keepdims=True) + 1e-12
    w = (weights / wsum)[..., None]

    c1 = jnp.sum(p1 * w, axis=-2, keepdims=True)
    c2 = jnp.sum(p2 * w, axis=-2, keepdims=True)
    q1 = p1 - c1  # "Pr1" in the reference (src/Sim3Solver.cc:340-345)
    q2 = p2 - c2

    # Horn's correlation with "left" = q2, "right" = q1 so that the
    # recovered quaternion rotates set 2 into set 1 (the reference's
    # M = Pr2 * Pr1^t, src/Sim3Solver.cc:347-352, same convention).
    M = jnp.einsum("...ni,...nj->...ij", q2 * w, q1)

    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]

    # Horn's symmetric 4x4 N matrix (quaternion order w, x, y, z here).
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
        ],
        axis=-2,
    )
    _, vecs = jnp.linalg.eigh(N)
    q_wxyz = vecs[..., :, -1]  # largest eigenvalue -> last column
    q_xyzw = jnp.concatenate([q_wxyz[..., 1:4], q_wxyz[..., 0:1]], axis=-1)

    from . import se3
    R = se3.quat_to_rot(q_xyzw)

    # Scale: s = sum w q1 . (R q2) / sum w |q2|^2  (asymmetric form, same
    # as the reference's dot/den, src/Sim3Solver.cc:416-432).
    Rq2 = jnp.einsum("...ij,...nj->...ni", R, q2)
    num = jnp.sum(jnp.sum(q1 * Rq2, axis=-1) * weights / wsum, axis=-1)
    den = jnp.sum(jnp.sum(q2 * q2, axis=-1) * weights / wsum, axis=-1) + 1e-12
    s = num / den
    if fix_scale:
        s = jnp.ones_like(s)

    t = c1[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", R, c2[..., 0, :])
    return sim3_mod.make(R, t, s)
