"""Structure-only bundle adjustment: P independent damped 3x3 solves.

This is the reference fork's local BA — LocalBundleAdjustment with
fixedPose=true (src/LocalMapping.cc:122-124, src/Optimizer.cc:434-439
fixes every camera vertex), which reduces exactly to optimizing each
map point against its observations independently.  On TPU this is one
batched LM: all points, all observations, no graph solver at all.

Observation layout (padded flat arrays, length O):
  obs_pt[o]   : point index
  obs_Tcw[o]  : (4,4) observing camera pose — EITHER a per-observation
                (O,4,4) stack, OR a compact (K,4,4) keyframe-pose table
                gathered on device via obs_cam (preferred: the (O,4,4)
                form uploads ~4 MB per call through the chip tunnel,
                ~80 ms at measured ~75 MB/s, dominating the solve)
  obs_uv[o]   : measurement
  obs_isig2[o]: information (1/sigma^2 of the keypoint level)
  obs_valid[o]
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import reproj
from ..geom.smallsolve import solve3x3

CHI2_MONO = 5.991


class PointsOptResult(NamedTuple):
    points: jnp.ndarray      # (P, 3) optimized positions
    obs_inlier: jnp.ndarray  # (O,) bool — obs passes chi2 at solution
    lam: jnp.ndarray         # (P,) final LM damping — pass back as lam0
    #                          so chunked execution resumes the LM state
    #                          instead of resetting it every chunk


@partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "iters",
                                   "use_huber"))
def optimize_points(
    points0: jnp.ndarray,
    obs_pt: jnp.ndarray,
    obs_Tcw: jnp.ndarray,
    obs_uv: jnp.ndarray,
    obs_isig2: jnp.ndarray,
    obs_valid: jnp.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    iters: int = 10,
    use_huber: bool = True,
    obs_cam: jnp.ndarray | None = None,
    lam0: jnp.ndarray | None = None,
) -> PointsOptResult:
    P = points0.shape[0]
    if obs_cam is not None:
        # compact form: (K,4,4) pose table + per-obs camera index
        obs_Tcw = obs_Tcw[obs_cam]

    def assemble(points):
        pts_per_obs = points[obs_pt]
        res = reproj.project_jacobians(obs_Tcw, pts_per_obs, obs_uv, fx, fy, cx, cy)
        c2 = reproj.chi2(res.r, obs_isig2)
        w = obs_isig2 * (reproj.huber_weight(c2, CHI2_MONO) if use_huber else 1.0)
        w = jnp.where(obs_valid & (res.depth > 0), w, 0.0)
        Jw = res.J_point * w[:, None, None]           # (O, 2, 3)
        # scatter-add per point: H (P,3,3), g (P,3)
        Ho = jnp.einsum("oia,oib->oab", Jw, res.J_point)
        go = jnp.einsum("oia,oi->oa", Jw, res.r)
        H = jnp.zeros((P, 3, 3)).at[obs_pt].add(Ho)
        g = jnp.zeros((P, 3)).at[obs_pt].add(go)
        rho = jnp.where(c2 > CHI2_MONO,
                        2.0 * jnp.sqrt(c2 * CHI2_MONO) - CHI2_MONO, c2) if use_huber else c2
        # behind-camera residuals must COST, not vanish — otherwise the
        # per-point accept test rewards flinging a point to negative
        # depth (see optim/ba.py INVALID_DEPTH_PENALTY)
        rho_eff = jnp.where(res.depth > 0, rho, 1.0e8)
        cost_p = jnp.zeros((P,)).at[obs_pt].add(
            jnp.where(obs_valid, rho_eff, 0.0))
        return H, g, cost_p

    def body(_, st):
        points, lam = st
        H, g, cost0 = assemble(points)
        Hd = H + lam[:, None, None] * jnp.eye(3) * jnp.maximum(
            jnp.trace(H, axis1=-2, axis2=-1)[:, None, None] / 3.0, 1e-6)
        delta = -solve3x3(Hd + 1e-9 * jnp.eye(3), g)
        cand = points + delta
        _, _, cost1 = assemble(cand)
        accept = cost1 < cost0
        points = jnp.where(accept[:, None], cand, points)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        return points, lam

    if lam0 is None:
        lam0 = jnp.full((P,), 1e-3)
    points, lam = jax.lax.fori_loop(0, iters, body, (points0, lam0))

    pts_per_obs = points[obs_pt]
    res = reproj.project_jacobians(obs_Tcw, pts_per_obs, obs_uv, fx, fy, cx, cy)
    c2 = reproj.chi2(res.r, obs_isig2)
    inlier = obs_valid & (c2 <= CHI2_MONO) & (res.depth > 0)
    return PointsOptResult(points=points, obs_inlier=inlier, lam=lam)
