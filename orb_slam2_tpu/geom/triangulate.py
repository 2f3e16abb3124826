"""Batched two-view DLT triangulation + acceptance gates.

Replaces Initializer::triangulate / triangulatePoints
(src/Initializer.cc:56-105, 170-328) and the per-match triangulation in
LocalMapping::CreateNewMapPoints (src/LocalMapping.cc:346-492).

The reference triangulates one match at a time with cv::SVD.  Here the
whole match set solves in one batched closed-form step: the
inhomogeneous DLT (fix w=1, solve the 3x3 normal equations of the four
DLT rows by adjugate inverse).  This is branch-free elementwise math —
no eigh/SVD iteration loops, which on TPU cost ~1000x more than the
arithmetic and minutes of XLA compile time for large batches.  Points
"at infinity" (w ~ 0) come out garbage-but-finite and are rejected by
the depth/reprojection/parallax gates, exactly like the reference's
!isfinite check (src/Initializer.cc:237-241, src/LocalMapping.cc:398).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .smallsolve import solve3x3


def projection_matrix(K: jnp.ndarray, Tcw: jnp.ndarray) -> jnp.ndarray:
    """P = K [R|t] from intrinsics (3,3) and pose (..., 4, 4) -> (..., 3, 4)."""
    return K @ Tcw[..., :3, :4]


def triangulate_dlt(
    P1: jnp.ndarray, P2: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray
) -> jnp.ndarray:
    """DLT triangulation of N correspondences.

    P1, P2: (3, 4) projection matrices (or batched (..., 3, 4)).
    uv1, uv2: (..., N, 2) undistorted pixel coords.
    Returns world points (..., N, 3).

    Same 4-row DLT construction as Initializer::triangulate
    (src/Initializer.cc:56-105), batched; solved in closed form via the
    inhomogeneous normal equations (rows normalized for conditioning).
    """
    def rows(P, uv):
        r0 = uv[..., 0:1] * P[..., 2, :] - P[..., 0, :]
        r1 = uv[..., 1:2] * P[..., 2, :] - P[..., 1, :]
        return r0, r1

    a0, a1 = rows(P1[..., None, :, :], uv1)
    a2, a3 = rows(P2[..., None, :, :], uv2)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)  # (..., N, 4, 4)
    return _solve_dlt_rows(A)


def triangulate_dlt_pairs(
    P1: jnp.ndarray, P2: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray
) -> jnp.ndarray:
    """DLT with a PER-MATCH second camera: P1 (3,4) shared, P2 (N,3,4).

    Lets matches gathered from many neighbor keyframes triangulate in
    ONE device call (the reference loops neighbors sequentially,
    src/LocalMapping.cc:255-495)."""
    def rows(P, uv):
        r0 = uv[..., 0:1] * P[..., 2, :] - P[..., 0, :]
        r1 = uv[..., 1:2] * P[..., 2, :] - P[..., 1, :]
        return r0, r1

    a0, a1 = rows(P1[None, :, :], uv1)
    a2, a3 = rows(P2, uv2)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)
    return _solve_dlt_rows(A)


def _solve_dlt_rows(A: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) DLT rows -> (..., 3) world point.

    min_x ||A [x; 1]||^2 = solve (A3^T A3) x = -A3^T a4 where A3 =
    A[..., :3], a4 = A[..., 3].  Closed form 3x3 adjugate solve.

    The normal equations square the condition number vs the reference's
    4x4 SVD (src/Initializer.cc:56-105); one step of f32 iterative
    refinement (residual re-solve, branch-free, 2 extra tiny matvecs)
    recovers the lost digits for the low-parallax pairs that still pass
    the geometric gates.  Truly degenerate systems stay
    garbage-but-finite and are killed by the depth/reproj gates."""
    A = A / (jnp.linalg.norm(A, axis=-1, keepdims=True) + 1e-12)
    A3 = A[..., :3]
    a4 = A[..., 3]
    H = jnp.einsum("...ri,...rj->...ij", A3, A3)
    b = -jnp.einsum("...ri,...r->...i", A3, a4)
    x = solve3x3(H, b)
    r = b - jnp.einsum("...ij,...j->...i", H, x)
    return x + solve3x3(H, r)


def triangulate_dlt_pairs_np(P1, P2, uv1, uv2):
    """NumPy twin of :func:`triangulate_dlt_pairs` (f64): host-side
    re-triangulation of the few ACCEPTED matches after the device
    kernel has run all gates.  Shipping only pass/fail bits + indices
    over the chip link and recomputing the 3D points here cuts the
    triangulation readback ~5x (the (N,3) f32 point block was the bulk
    of it); the f64 normal equations need no iterative refinement."""
    import numpy as np

    def rows(P, uv):
        r0 = uv[..., 0:1] * P[..., 2, :] - P[..., 0, :]
        r1 = uv[..., 1:2] * P[..., 2, :] - P[..., 1, :]
        return r0, r1

    a0, a1 = rows(P1[None, :, :].astype(np.float64), uv1.astype(np.float64))
    a2, a3 = rows(P2.astype(np.float64), uv2.astype(np.float64))
    A = np.stack([a0, a1, a2, a3], axis=-2)          # (N, 4, 4)
    A = A / (np.linalg.norm(A, axis=-1, keepdims=True) + 1e-12)
    A3 = A[..., :3]
    a4 = A[..., 3]
    H = np.einsum("nri,nrj->nij", A3, A3)
    b = -np.einsum("nri,nr->ni", A3, a4)
    return np.linalg.solve(H + 1e-12 * np.eye(3),
                           b[..., None])[..., 0].astype(np.float32)


class TriangulationCheck(NamedTuple):
    good: jnp.ndarray        # (N,) bool — passes all gates
    parallax_cos: jnp.ndarray  # (N,) cosine of triangulation angle


def check_triangulation(
    pts_w: jnp.ndarray,
    Tcw1: jnp.ndarray,
    Tcw2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    sigma2_1: jnp.ndarray,
    sigma2_2: jnp.ndarray,
    reproj_chi2: float = 5.991,
    min_parallax_cos: float = 0.99998,
) -> TriangulationCheck:
    """Per-point acceptance gates, mirroring src/Initializer.cc:233-322
    and src/LocalMapping.cc:380-470:

    - finite coordinates
    - positive depth in both views
    - reprojection error <= chi2 * sigma^2 in both views
    - parallax angle above threshold (cos below ``min_parallax_cos``)

    ``sigma2_*`` is the per-keypoint level variance (scaleFactor^2level).
    """
    def cam_pt(Tcw):
        R, t = Tcw[..., :3, :3], Tcw[..., :3, 3]
        return jnp.einsum("ij,nj->ni", R, pts_w) + t

    pc1, pc2 = cam_pt(Tcw1), cam_pt(Tcw2)
    z1, z2 = pc1[..., 2], pc2[..., 2]

    def reproj_err2(pc, uv):
        inv_z = 1.0 / jnp.where(jnp.abs(pc[..., 2]) < 1e-12, 1e-12, pc[..., 2])
        u = fx * pc[..., 0] * inv_z + cx
        v = fy * pc[..., 1] * inv_z + cy
        du, dv = u - uv[..., 0], v - uv[..., 1]
        return du * du + dv * dv

    e1 = reproj_err2(pc1, uv1)
    e2 = reproj_err2(pc2, uv2)

    o1 = -jnp.einsum("ij,j->i", Tcw1[:3, :3].T, Tcw1[:3, 3])
    o2 = -jnp.einsum("ij,j->i", Tcw2[:3, :3].T, Tcw2[:3, 3])
    r1 = pts_w - o1
    r2 = pts_w - o2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    cos_par = jnp.sum(r1 * r2, axis=-1) / (n1 * n2 + 1e-12)

    good = (
        jnp.all(jnp.isfinite(pts_w), axis=-1)
        & (z1 > 0)
        & (z2 > 0)
        & (e1 <= reproj_chi2 * sigma2_1)
        & (e2 <= reproj_chi2 * sigma2_2)
        & (cos_par < min_parallax_cos)
        & (cos_par > -1.0 + 1e-6)
    )
    return TriangulationCheck(good=good, parallax_cos=cos_par)


def check_triangulation_pairs(
    pts_w: jnp.ndarray,
    Tcw1: jnp.ndarray,
    Tcw2: jnp.ndarray,     # (N, 4, 4) per-match second camera
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    sigma2_1: jnp.ndarray,
    sigma2_2: jnp.ndarray,
    reproj_chi2: float = 5.991,
    min_parallax_cos: float = 0.99998,
) -> TriangulationCheck:
    """check_triangulation with a per-match second camera."""
    R1, t1 = Tcw1[:3, :3], Tcw1[:3, 3]
    pc1 = jnp.einsum("ij,nj->ni", R1, pts_w) + t1
    pc2 = jnp.einsum("nij,nj->ni", Tcw2[:, :3, :3], pts_w) + Tcw2[:, :3, 3]
    z1, z2 = pc1[..., 2], pc2[..., 2]

    def reproj_err2(pc, uv):
        inv_z = 1.0 / jnp.where(jnp.abs(pc[..., 2]) < 1e-12, 1e-12,
                                pc[..., 2])
        u = fx * pc[..., 0] * inv_z + cx
        v = fy * pc[..., 1] * inv_z + cy
        du, dv = u - uv[..., 0], v - uv[..., 1]
        return du * du + dv * dv

    e1 = reproj_err2(pc1, uv1)
    e2 = reproj_err2(pc2, uv2)
    o1 = -R1.T @ t1
    o2 = -jnp.einsum("nij,nj->ni", jnp.swapaxes(Tcw2[:, :3, :3], -1, -2),
                     Tcw2[:, :3, 3])
    r1 = pts_w - o1
    r2 = pts_w - o2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    cos_par = jnp.sum(r1 * r2, axis=-1) / (n1 * n2 + 1e-12)
    good = (
        jnp.all(jnp.isfinite(pts_w), axis=-1)
        & (z1 > 0) & (z2 > 0)
        & (e1 <= reproj_chi2 * sigma2_1)
        & (e2 <= reproj_chi2 * sigma2_2)
        & (cos_par < min_parallax_cos)
        & (cos_par > -1.0 + 1e-6)
    )
    return TriangulationCheck(good=good, parallax_cos=cos_par)
