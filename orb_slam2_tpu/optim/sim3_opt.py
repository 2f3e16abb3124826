"""Relative Sim3 optimization between two keyframes.

Replaces Optimizer::OptimizeSim3 (src/Optimizer.cc:985-1218): given
matched map points of KF1 and KF2, optimize the similarity S12 that
maps camera-2 coordinates into camera-1 so that both sets of
bidirectional reprojections agree.  Residuals:

  r1_i = proj(S12 . X2_i) - uv1_i        (point of KF2 into image 1)
  r2_i = proj(S12^-1 . X1_i) - uv2_i     (point of KF1 into image 2)

Huber(sqrt(10)) as in the reference (deltaHuber, src/Optimizer.cc:1040),
inlier pruning at chi2 > 10 followed by re-optimization.  Jacobians via
forward-mode autodiff on the Sim3 exp chart (7 params — tiny problem,
one keyframe pair, so autodiff costs nothing and is exact).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import sim3

CHI2_SIM3 = 10.0
# Extra Levenberg damping on the log-scale coordinate.  In this left
# chart a pure sigma step scales s and t TOGETHER, which leaves both
# reprojection directions nearly unchanged when the two cameras sit at
# (almost) the same spot — a flat valley along which plain LM
# random-walks the scale by orders of magnitude (observed: Horn s=1.01
# -> "optimized" s=65, inliers unchanged).  Damping caps each sigma
# step at g_sigma/W without shifting the optimum: when scale IS
# observable the data gradient still drives sigma to its unbiased
# fixed point in a few iterations.
SCALE_DAMPING_W = 2.0e4


class Sim3OptResult(NamedTuple):
    S12: jnp.ndarray        # (8,) optimized similarity
    inliers1: jnp.ndarray   # (N,) bool (reprojection into image 1 ok)
    inliers2: jnp.ndarray   # (N,) bool
    n_inliers: jnp.ndarray


def _residuals(S12, pts1_c, pts2_c, uv1, uv2, fx, fy, cx, cy):
    """All residuals given camera-frame points of each KF."""
    p2_in_1 = sim3.apply(S12[None], pts2_c[None])[0]
    p1_in_2 = sim3.apply(sim3.inv(S12)[None], pts1_c[None])[0]

    def proj(pc):
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
        return jnp.stack([fx * pc[:, 0] / z + cx, fy * pc[:, 1] / z + cy], -1)

    r1 = proj(p2_in_1) - uv1
    r2 = proj(p1_in_2) - uv2
    return r1, r2, p2_in_1[:, 2], p1_in_2[:, 2]


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "iters",
                                             "fix_scale"))
def optimize_sim3(
    S12_init: jnp.ndarray,
    pts1_cam: jnp.ndarray,   # (N, 3) matched MPs in KF1 camera frame
    pts2_cam: jnp.ndarray,   # (N, 3) matched MPs in KF2 camera frame
    uv1: jnp.ndarray,        # (N, 2) observed kp of the match in image 1
    uv2: jnp.ndarray,
    inv_sigma2_1: jnp.ndarray,
    inv_sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    iters: int = 10,
    fix_scale: bool = False,
) -> Sim3OptResult:
    def cost_and_state(S12, active):
        r1, r2, z1, z2 = _residuals(S12, pts1_cam, pts2_cam, uv1, uv2,
                                    fx, fy, cx, cy)
        c1 = jnp.sum(r1 * r1, -1) * inv_sigma2_1
        c2 = jnp.sum(r2 * r2, -1) * inv_sigma2_2
        rho = lambda c: jnp.where(c > CHI2_SIM3,
                                  2 * jnp.sqrt(c * CHI2_SIM3) - CHI2_SIM3, c)
        cost = jnp.sum(jnp.where(active, rho(c1) + rho(c2), 0.0))
        return cost, (c1, c2)

    def lm_rounds(S12, active, n_it):
        def body(_, st):
            S12, lam = st

            # IRLS: robust weights FROZEN at the current iterate so the
            # Jacobian doesn't differentiate through them
            r1c, r2c, _, _ = _residuals(S12, pts1_cam, pts2_cam, uv1, uv2,
                                        fx, fy, cx, cy)
            c1c = jnp.sum(r1c * r1c, -1) * inv_sigma2_1
            c2c = jnp.sum(r2c * r2c, -1) * inv_sigma2_2
            w1 = jnp.sqrt(inv_sigma2_1 * active
                          * jnp.where(c1c > CHI2_SIM3,
                                      jnp.sqrt(CHI2_SIM3 / jnp.maximum(c1c, 1e-9)), 1.0))
            w2 = jnp.sqrt(inv_sigma2_2 * active
                          * jnp.where(c2c > CHI2_SIM3,
                                      jnp.sqrt(CHI2_SIM3 / jnp.maximum(c2c, 1e-9)), 1.0))

            def rf(xi):
                S = sim3.compose(sim3.exp(xi), S12)
                r1, r2, _, _ = _residuals(S, pts1_cam, pts2_cam, uv1, uv2,
                                          fx, fy, cx, cy)
                return jnp.concatenate([(r1 * w1[:, None]).reshape(-1),
                                        (r2 * w2[:, None]).reshape(-1)])

            xi0 = jnp.zeros(7)
            r0 = rf(xi0)
            J = jax.jacfwd(rf)(xi0)  # (2N*2, 7)
            H = J.T @ J
            g = J.T @ r0
            # sigma-specific damping: see SCALE_DAMPING_W above
            H = H.at[6, 6].add(SCALE_DAMPING_W)
            if fix_scale:
                # pin the scale coordinate
                H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
                g = g.at[6].set(0.0)
            Hd = (H + lam * jnp.diag(jnp.diag(H))
                  + (1e-6 * jnp.trace(H) / 7.0 + 1e-8) * jnp.eye(7))
            dx = -jnp.linalg.solve(Hd, g)
            S_new = sim3.compose(sim3.exp(dx), S12)
            c_new, _ = cost_and_state(S_new, active)
            c_old, _ = cost_and_state(S12, active)
            ok = c_new < c_old
            S12 = jnp.where(ok, S_new, S12)
            lam = jnp.where(ok, lam * 0.5, lam * 4.0)
            return S12, lam

        S12, _ = jax.lax.fori_loop(0, n_it, body, (S12, jnp.float32(1e-3)))
        return S12

    active0 = valid
    S12 = lm_rounds(S12_init, active0, iters)
    # prune and re-optimize (src/Optimizer.cc:1126-1180)
    _, (c1, c2) = cost_and_state(S12, active0)
    active1 = valid & (c1 <= CHI2_SIM3) & (c2 <= CHI2_SIM3)
    S12 = lm_rounds(S12, active1, iters)
    _, (c1, c2) = cost_and_state(S12, active1)
    in1 = valid & (c1 <= CHI2_SIM3)
    in2 = valid & (c2 <= CHI2_SIM3)
    inl = in1 & in2
    return Sim3OptResult(S12=S12, inliers1=in1, inliers2=in2,
                         n_inliers=jnp.sum(inl.astype(jnp.int32)))
