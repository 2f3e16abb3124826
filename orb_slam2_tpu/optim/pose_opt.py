"""Motion-only pose optimization (Levenberg-Marquardt on SE3).

Rebuilds upstream ORB-SLAM2's Optimizer::PoseOptimization — the
reference fork deleted it because its input poses are trusted
(src/Tracking.cc:637 comment), but the no-prior datasets (TUM/KITTI/
EuRoC) need it, and BASELINE.json lists pose solving as a required
capability.  Upstream semantics kept: 4 rounds of 10 LM iterations,
Huber(sqrt(5.991)) in rounds where the kernel is active, chi2
reclassification of inliers/outliers between rounds.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import se3
from . import reproj

CHI2_MONO = 5.991


class PoseOptResult(NamedTuple):
    Tcw: jnp.ndarray      # (4, 4) optimized pose
    inliers: jnp.ndarray  # (N,) bool — chi2 <= 5.991 at the solution
    n_inliers: jnp.ndarray


@partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "n_rounds", "iters_per_round"))
def optimize_pose(
    Tcw0: jnp.ndarray,
    pts_w: jnp.ndarray,
    uv: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    n_rounds: int = 4,
    iters_per_round: int = 10,
) -> PoseOptResult:
    """LM over one SE3 given 2D-3D correspondences.

    pts_w (N,3), uv (N,2), inv_sigma2 (N,), valid (N,) — fixed-size
    padded arrays; invalid rows carry zero weight.
    """
    lam0 = 1e-3

    def round_body(rd, carry):
        Tcw, inlier = carry
        use_huber = rd < 2  # upstream drops the robust kernel after 2 rounds

        def it_body(_, st):
            Tcw, lam = st
            res = reproj.project_jacobians(Tcw, pts_w, uv, fx, fy, cx, cy)
            c2 = reproj.chi2(res.r, inv_sigma2)
            w = inv_sigma2 * jnp.where(use_huber, reproj.huber_weight(c2, CHI2_MONO), 1.0)
            w = jnp.where(inlier & valid & (res.depth > 0), w, 0.0)
            Jw = res.J_pose * w[:, None, None]
            H = jnp.einsum("nia,nib->ab", Jw, res.J_pose)
            g = jnp.einsum("nia,ni->a", Jw, res.r)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
            delta = -jnp.linalg.solve(Hd, g)
            T_new = se3.exp(delta) @ Tcw
            # accept iff cost decreased (simple LM; adjust damping)
            def cost_at(T):
                rr = reproj.project_jacobians(T, pts_w, uv, fx, fy, cx, cy)
                cc = reproj.chi2(rr.r, inv_sigma2)
                rho = jnp.where(use_huber & (cc > CHI2_MONO),
                                2.0 * jnp.sqrt(cc * CHI2_MONO) - CHI2_MONO, cc)
                return jnp.sum(jnp.where(inlier & valid & (rr.depth > 0), rho, 0.0))
            accept = cost_at(T_new) < cost_at(Tcw)
            Tcw = jnp.where(accept, T_new, Tcw)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            return Tcw, lam

        Tcw, _ = jax.lax.fori_loop(0, iters_per_round, it_body, (Tcw, lam0))
        # reclassify
        res = reproj.project_jacobians(Tcw, pts_w, uv, fx, fy, cx, cy)
        c2 = reproj.chi2(res.r, inv_sigma2)
        inlier = valid & (c2 <= CHI2_MONO) & (res.depth > 0)
        return Tcw, inlier

    inlier0 = valid
    Tcw, inlier = jax.lax.fori_loop(0, n_rounds, round_body, (Tcw0, inlier0))
    return PoseOptResult(Tcw=Tcw, inliers=inlier,
                         n_inliers=jnp.sum(inlier.astype(jnp.int32)))
