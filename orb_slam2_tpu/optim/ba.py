"""Full bundle adjustment: LM + Schur complement + matrix-free PCG.

Replaces Optimizer::BundleAdjustment / GlobalBundleAdjustemnt
(src/Optimizer.cc:56-306) and the pose-variable local BA of upstream.
g2o's sparse solver becomes:

- point block Hpp is 3x3-block-diagonal -> eliminated in closed form
  (batched 3x3 solves, embarrassingly parallel);
- the reduced camera system S = Hcc - W Hpp^-1 W^T is never formed:
  PCG applies it matrix-free with two segment-sum passes per
  matvec (gather/scatter over the observation list — pure XLA, and the
  same code path shards over a device mesh by splitting observations,
  with psum over the shard axis closing the segment sums);
- block-Jacobi preconditioner from the exact 6x6 Schur diagonal.

Gauge fixing: a boolean ``fixed_cam`` mask (the reference fixes KF 0
for GBA, both init KFs at initialization, and every camera in the
fork's structure-only local BA — src/Optimizer.cc:150, 434-439,
src/Tracking.cc:536).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..geom import se3
from ..geom.smallsolve import adjugate3x3
from . import reproj

CHI2_MONO = 5.991


class BAResult(NamedTuple):
    cam_Tcw: jnp.ndarray     # (K, 4, 4)
    points: jnp.ndarray      # (P, 3)
    obs_inlier: jnp.ndarray  # (O,) bool
    final_cost: jnp.ndarray


def _identity_psum(x):
    return x


def _assemble(cam_Tcw, points, obs_cam, obs_pt, obs_uv, obs_isig2, obs_w_extra,
              fx, fy, cx, cy, use_huber, psum, psum_pt=None):
    """Residuals, weights, and all Gauss-Newton blocks.

    ``psum`` closes camera-indexed reductions over the mesh;
    ``psum_pt`` closes point-indexed ones.  With obs-sharding both are
    the mesh psum; with POINT-sharded state (each point's observations
    colocated with its shard) point reductions are purely local —
    pass ``psum_pt=identity`` and the (P,3,3)/(P,3) blocks never cross
    the interconnect (the memory-scaling layout, SURVEY §7.2.8)."""
    if psum_pt is None:
        psum_pt = psum
    K = cam_Tcw.shape[0]
    P = points.shape[0]
    T_o = cam_Tcw[obs_cam]
    X_o = points[obs_pt]
    res = reproj.project_jacobians(T_o, X_o, obs_uv, fx, fy, cx, cy)
    c2 = reproj.chi2(res.r, obs_isig2)
    w = obs_isig2 * (reproj.huber_weight(c2, CHI2_MONO) if use_huber else 1.0)
    w = w * obs_w_extra * (res.depth > 0)

    Jc = res.J_pose
    Jp = res.J_point
    Jc_w = Jc * w[:, None, None]

    Hcc = psum(jnp.zeros((K, 6, 6)).at[obs_cam].add(
        jnp.einsum("oia,oib->oab", Jc_w, Jc)))
    Hpp = psum_pt(jnp.zeros((P, 3, 3)).at[obs_pt].add(
        jnp.einsum("oia,oib->oab", Jp * w[:, None, None], Jp)))
    gc = psum(jnp.zeros((K, 6)).at[obs_cam].add(
        jnp.einsum("oia,oi->oa", Jc_w, res.r)))
    gp = psum_pt(jnp.zeros((P, 3)).at[obs_pt].add(
        jnp.einsum("oia,oi->oa", Jp * w[:, None, None], res.r)))
    W = jnp.einsum("oia,oib->oab", Jc_w, Jp)  # (O, 6, 3) per-obs coupling

    rho = jnp.where(c2 > CHI2_MONO, 2.0 * jnp.sqrt(c2 * CHI2_MONO) - CHI2_MONO, c2) \
        if use_huber else c2
    cost = psum(jnp.sum(jnp.where(obs_w_extra > 0,
                                  jnp.where(res.depth > 0, rho,
                                            INVALID_DEPTH_PENALTY),
                                  0.0)))
    return Hcc, Hpp, gc, gp, W, cost


# A residual whose point falls behind the camera must COST, not vanish:
# excluding it lets LM "improve" the objective by flinging points to
# negative depth (cost monotonically ->0 while the state diverges to
# inf/NaN — observed on post-loop GBA with large initial drift).  g2o
# keeps such edges active with their (huge) chi2; a flat penalty per
# invalid observation preserves that no-free-lunch property while
# keeping the compiled graph branch-free.
INVALID_DEPTH_PENALTY = 1.0e8


def _cost_only(cam_Tcw, points, obs_cam, obs_pt, obs_uv, obs_isig2,
               obs_w_extra, fx, fy, cx, cy, use_huber, psum):
    T_o = cam_Tcw[obs_cam]
    X_o = points[obs_pt]
    res = reproj.project_jacobians(T_o, X_o, obs_uv, fx, fy, cx, cy)
    c2 = reproj.chi2(res.r, obs_isig2)
    rho = jnp.where(c2 > CHI2_MONO, 2.0 * jnp.sqrt(c2 * CHI2_MONO) - CHI2_MONO, c2) \
        if use_huber else c2
    return psum(jnp.sum(jnp.where(obs_w_extra > 0,
                                  jnp.where(res.depth > 0, rho,
                                            INVALID_DEPTH_PENALTY),
                                  0.0)))


def _solve_step(Hcc, Hpp, gc, gp, W, obs_cam, obs_pt, lam, fixed_cam, psum,
                cg_iters, psum_pt=None):
    """One damped Schur + PCG solve -> (delta_c (K,6), delta_p (P,3))."""
    if psum_pt is None:
        psum_pt = psum
    K = Hcc.shape[0]
    P = Hpp.shape[0]
    eye6 = jnp.eye(6)
    eye3 = jnp.eye(3)

    free = ~fixed_cam
    Hcc_d = Hcc + lam * jnp.eye(6) * jnp.maximum(
        jnp.trace(Hcc, axis1=-2, axis2=-1)[:, None, None] / 6.0, 1e-6) + 1e-8 * eye6
    Hpp_d = Hpp + lam * jnp.eye(3) * jnp.maximum(
        jnp.trace(Hpp, axis1=-2, axis2=-1)[:, None, None] / 3.0, 1e-6) + 1e-8 * eye3
    # closed-form batched 3x3 inverse (LU lowering is iterative on TPU)
    adj, det = adjugate3x3(Hpp_d)
    Hpp_inv = adj / jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)[:, None, None]

    # Schur RHS: gc_hat = -(gc - W Hpp^-1 gp), zero for fixed cams.
    hig = jnp.einsum("pab,pb->pa", Hpp_inv, gp)           # (P, 3)
    rhs_corr = psum(jnp.zeros((K, 6)).at[obs_cam].add(
        jnp.einsum("oab,ob->oa", W, hig[obs_pt])))
    b = -(gc - rhs_corr)
    b = jnp.where(free[:, None], b, 0.0)

    def S_matvec(x):
        y = psum_pt(jnp.zeros((P, 3)).at[obs_pt].add(
            jnp.einsum("oab,oa->ob", W, x[obs_cam])))     # W^T x per point
        z = jnp.einsum("pab,pb->pa", Hpp_inv, y)
        corr = psum(jnp.zeros((K, 6)).at[obs_cam].add(
            jnp.einsum("oab,ob->oa", W, z[obs_pt])))
        out = jnp.einsum("kab,kb->ka", Hcc_d, x) - corr
        return jnp.where(free[:, None], out, x)  # identity on fixed cams

    # Block-Jacobi preconditioner: exact Schur diagonal blocks.
    WHW = psum(jnp.zeros((K, 6, 6)).at[obs_cam].add(
        jnp.einsum("oab,obc,odc->oad", W, Hpp_inv[obs_pt], W)))
    S_diag = Hcc_d - WHW
    S_diag = jnp.where(free[:, None, None], S_diag, jnp.broadcast_to(eye6, S_diag.shape))
    M_inv = jnp.linalg.inv(S_diag + 1e-8 * eye6)

    def precond(r):
        return jnp.einsum("kab,kb->ka", M_inv, r)

    # PCG, fixed iteration count (compiler-friendly).
    x0 = jnp.zeros((K, 6))
    r0 = b - S_matvec(x0)
    z0 = precond(r0)
    p0 = z0

    def cg_body(_, st):
        x, r, z, p = st
        Sp = S_matvec(p)
        rz = jnp.sum(r * z)
        alpha = rz / jnp.maximum(jnp.sum(p * Sp), 1e-20)
        x = x + alpha * p
        r_new = r - alpha * Sp
        z_new = precond(r_new)
        beta = jnp.sum(r_new * z_new) / jnp.maximum(rz, 1e-20)
        p = z_new + beta * p
        return x, r_new, z_new, p

    delta_c, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, (x0, r0, z0, p0))
    delta_c = jnp.where(free[:, None], delta_c, 0.0)

    # Back-substitute points: dp = Hpp^-1 (-gp - W^T dc).
    wtd = psum_pt(jnp.zeros((P, 3)).at[obs_pt].add(
        jnp.einsum("oab,oa->ob", W, delta_c[obs_cam])))
    delta_p = jnp.einsum("pab,pb->pa", Hpp_inv, -(gp + wtd))
    return delta_c, delta_p


def bundle_adjust_core(
    cam_Tcw, points, obs_cam, obs_pt, obs_uv, obs_isig2, obs_valid,
    fixed_cam, fx, fy, cx, cy,
    iters: int = 10, cg_iters: int = 20, use_huber: bool = True,
    psum: Callable = _identity_psum,
    abort_flag=None,
    psum_pt: Callable | None = None,
):
    """LM iteration loop shared by single-device and sharded BA.

    ``psum`` closes segment-sums across an obs-sharded mesh axis (pass
    e.g. ``partial(jax.lax.psum, axis_name='d')`` inside shard_map).
    ``psum_pt``: closure for point-indexed reductions — identity when
    the point state is sharded with its observations (memory-scaling
    GBA); defaults to ``psum``.
    ``abort_flag``: optional scalar bool array — when True, iterations
    become no-ops (the reference's mbAbortBA mid-BA interrupt,
    src/Optimizer.cc stop-flag / src/LocalMapping.cc:161-167).
    """
    obs_w_extra = obs_valid.astype(jnp.float32)

    def body(i, st):
        cam, pts, lam = st
        Hcc, Hpp, gc, gp, W, cost0 = _assemble(
            cam, pts, obs_cam, obs_pt, obs_uv, obs_isig2, obs_w_extra,
            fx, fy, cx, cy, use_huber, psum, psum_pt=psum_pt)
        dc, dp = _solve_step(Hcc, Hpp, gc, gp, W, obs_cam, obs_pt, lam,
                             fixed_cam, psum, cg_iters, psum_pt=psum_pt)
        cam_new = se3.exp(dc) @ cam
        pts_new = pts + dp
        cost1 = _cost_only(cam_new, pts_new, obs_cam, obs_pt, obs_uv,
                           obs_isig2, obs_w_extra, fx, fy, cx, cy,
                           use_huber, psum)
        accept = cost1 < cost0
        if abort_flag is not None:
            accept = accept & ~abort_flag
        cam = jnp.where(accept, cam_new, cam)
        pts = jnp.where(accept, pts_new, pts)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        return cam, pts, lam

    cam, pts, _ = jax.lax.fori_loop(
        0, iters, body, (cam_Tcw, points, jnp.float32(1e-4)))

    # final classification
    T_o = cam[obs_cam]
    res = reproj.project_jacobians(T_o, pts[obs_pt], obs_uv, fx, fy, cx, cy)
    c2 = reproj.chi2(res.r, obs_isig2)
    inlier = obs_valid & (c2 <= CHI2_MONO) & (res.depth > 0)
    cost = _cost_only(cam, pts, obs_cam, obs_pt, obs_uv, obs_isig2,
                      obs_w_extra, fx, fy, cx, cy, use_huber, psum)
    return BAResult(cam_Tcw=cam, points=pts, obs_inlier=inlier, final_cost=cost)


@partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "iters",
                                   "cg_iters", "use_huber"))
def bundle_adjust(
    cam_Tcw: jnp.ndarray,
    points: jnp.ndarray,
    obs_cam: jnp.ndarray,
    obs_pt: jnp.ndarray,
    obs_uv: jnp.ndarray,
    obs_isig2: jnp.ndarray,
    obs_valid: jnp.ndarray,
    fixed_cam: jnp.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    iters: int = 10,
    cg_iters: int = 20,
    use_huber: bool = True,
) -> BAResult:
    """Single-device full BA (see bundle_adjust_core)."""
    return bundle_adjust_core(
        cam_Tcw, points, obs_cam, obs_pt, obs_uv, obs_isig2, obs_valid,
        fixed_cam, fx, fy, cx, cy, iters=iters, cg_iters=cg_iters,
        use_huber=use_huber)
