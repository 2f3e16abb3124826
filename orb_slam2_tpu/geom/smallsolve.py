"""Closed-form batched small linear solves.

XLA lowers ``jnp.linalg.solve`` / ``eigh`` on TPU to iterative
factorizations (QR/Jacobi loops) that are slow for huge batches of tiny
systems and very expensive to compile through a remote-compile relay.
The 3x3 adjugate inverse below is exact, branch-free, and fuses into
surrounding elementwise code.
"""
from __future__ import annotations

import jax.numpy as jnp


def adjugate3x3(H: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., 3, 3) -> (adj(H) (..., 3, 3), det(H) (...,)).

    H @ adj(H) = det(H) * I.  For symmetric positive-definite H (normal
    equations) det > 0.
    """
    c00 = H[..., 1, 1] * H[..., 2, 2] - H[..., 1, 2] * H[..., 2, 1]
    c01 = H[..., 0, 2] * H[..., 2, 1] - H[..., 0, 1] * H[..., 2, 2]
    c02 = H[..., 0, 1] * H[..., 1, 2] - H[..., 0, 2] * H[..., 1, 1]
    c10 = H[..., 1, 2] * H[..., 2, 0] - H[..., 1, 0] * H[..., 2, 2]
    c11 = H[..., 0, 0] * H[..., 2, 2] - H[..., 0, 2] * H[..., 2, 0]
    c12 = H[..., 0, 2] * H[..., 1, 0] - H[..., 0, 0] * H[..., 1, 2]
    c20 = H[..., 1, 0] * H[..., 2, 1] - H[..., 1, 1] * H[..., 2, 0]
    c21 = H[..., 0, 1] * H[..., 2, 0] - H[..., 0, 0] * H[..., 2, 1]
    c22 = H[..., 0, 0] * H[..., 1, 1] - H[..., 0, 1] * H[..., 1, 0]
    det = H[..., 0, 0] * c00 + H[..., 0, 1] * c10 + H[..., 0, 2] * c20
    adj = jnp.stack([
        jnp.stack([c00, c01, c02], -1),
        jnp.stack([c10, c11, c12], -1),
        jnp.stack([c20, c21, c22], -1),
    ], -2)
    return adj, det


def solve3x3(H: jnp.ndarray, b: jnp.ndarray,
             eps: float = 1e-18) -> jnp.ndarray:
    """Solve H x = b for batches of 3x3 systems: (..., 3, 3), (..., 3)
    -> (..., 3).  Singular systems return a large-but-finite garbage
    vector (callers gate on residual checks)."""
    adj, det = adjugate3x3(H)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    x = jnp.einsum("...ij,...j->...i", adj, b)
    return x * inv_det[..., None]
