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

TPU layout note (drives the whole implementation style): every array in
the hot loop is RANK-1.  TPU tiles the two minor dims of an array to
(8, 128), so (O, 2, 3) / (O, 3, 3) intermediates — the natural autodiff
/ einsum formulation — inflate to (O, 8, 128) tiles, turning a ~30 MB
working set into gigabytes of HBM traffic.  Measured on the bench
shapes (P=16384, O=65536): matrix-form 9.2 ms/LM-iteration vs 1.9 ms
for this lane form.  The per-point reductions are ONE packed scatter
of 16 lanes (H upper-triangle 6, g 3, cost 1, 6 pad); ten separate
rank-1 scatters measured 4x slower (per-scatter fixed cost), and a
padded per-point dense (P, M) layout 1.4x slower (M-fold padding).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

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

    # per-obs camera rotation rows + translation as 12 rank-1 lanes
    if obs_cam is not None:
        R = [obs_Tcw[:, i, j][obs_cam] for i in range(3) for j in range(3)]
        t = [obs_Tcw[:, i, 3][obs_cam] for i in range(3)]
    else:
        R = [obs_Tcw[:, i, j] for i in range(3) for j in range(3)]
        t = [obs_Tcw[:, i, 3] for i in range(3)]
    u_obs, v_obs = obs_uv[:, 0], obs_uv[:, 1]

    def project(px, py, pz):
        """Camera coords + residual lanes for the current point estimate."""
        X, Y, Z = px[obs_pt], py[obs_pt], pz[obs_pt]
        x = R[0] * X + R[1] * Y + R[2] * Z + t[0]
        y = R[3] * X + R[4] * Y + R[5] * Z + t[1]
        z = R[6] * X + R[7] * Y + R[8] * Z + t[2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        iz = 1.0 / zs
        r0 = fx * x * iz + cx - u_obs
        r1 = fy * y * iz + cy - v_obs
        c2 = (r0 * r0 + r1 * r1) * obs_isig2
        return x, y, z, iz, r0, r1, c2

    def assemble(px, py, pz):
        x, y, z, iz, r0, r1, c2 = project(px, py, pz)
        if use_huber:
            w = obs_isig2 * jnp.where(
                c2 <= CHI2_MONO, 1.0,
                jnp.sqrt(CHI2_MONO / jnp.maximum(c2, 1e-12)))
            rho = jnp.where(c2 > CHI2_MONO,
                            2.0 * jnp.sqrt(c2 * CHI2_MONO) - CHI2_MONO, c2)
        else:
            w = obs_isig2
            rho = c2
        w = jnp.where(obs_valid & (z > 0), w, 0.0)
        # J_point rows (duv/dpc @ R) as 6 lanes
        a0 = fx * iz
        a2 = -fx * x * iz * iz
        b1 = fy * iz
        b2 = -fy * y * iz * iz
        j00 = a0 * R[0] + a2 * R[6]
        j01 = a0 * R[1] + a2 * R[7]
        j02 = a0 * R[2] + a2 * R[8]
        j10 = b1 * R[3] + b2 * R[6]
        j11 = b1 * R[4] + b2 * R[7]
        j12 = b1 * R[5] + b2 * R[8]
        # behind-camera residuals must COST, not vanish — otherwise the
        # per-point accept test rewards flinging a point to negative
        # depth (see optim/ba.py INVALID_DEPTH_PENALTY)
        rho_eff = jnp.where(obs_valid,
                            jnp.where(z > 0, rho, 1.0e8), 0.0)
        lanes = jnp.stack([
            w * (j00 * j00 + j10 * j10),   # h00
            w * (j00 * j01 + j10 * j11),   # h01
            w * (j00 * j02 + j10 * j12),   # h02
            w * (j01 * j01 + j11 * j11),   # h11
            w * (j01 * j02 + j11 * j12),   # h12
            w * (j02 * j02 + j12 * j12),   # h22
            w * (j00 * r0 + j10 * r1),     # g0
            w * (j01 * r0 + j11 * r1),     # g1
            w * (j02 * r0 + j12 * r1),     # g2
            rho_eff,                       # cost
        ], axis=1)
        acc = jnp.zeros((P, 10), lanes.dtype).at[obs_pt].add(lanes)
        return tuple(acc[:, i] for i in range(10))

    def body(_, st):
        # ONE linearization per iteration: H/g/cost of the last ACCEPTED
        # state are carried in the loop state, so a rejected step
        # re-solves the cached system with raised damping instead of
        # re-assembling (the candidate sequence is identical to the
        # naive two-assemble LM and halves the assembles per iteration).
        (px, py, pz, h00, h01, h02, h11, h12, h22,
         g0, g1, g2, cost0, lam) = st
        # damped 3x3 solve via the symmetric adjugate, all lanes
        dmp = lam * jnp.maximum((h00 + h11 + h22) / 3.0, 1e-6) + 1e-9
        H00, H11, H22 = h00 + dmp, h11 + dmp, h22 + dmp
        c00 = H11 * H22 - h12 * h12
        c01 = h02 * h12 - h01 * H22
        c02 = h01 * h12 - h02 * H11
        c11 = H00 * H22 - h02 * h02
        c12 = h01 * h02 - H00 * h12
        c22 = H00 * H11 - h01 * h01
        det = H00 * c00 + h01 * c01 + h02 * c02
        idet = 1.0 / jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
        dx = -(c00 * g0 + c01 * g1 + c02 * g2) * idet
        dy = -(c01 * g0 + c11 * g1 + c12 * g2) * idet
        dz = -(c02 * g0 + c12 * g1 + c22 * g2) * idet
        cx_, cy_, cz_ = px + dx, py + dy, pz + dz
        (n00, n01, n02, n11, n12, n22,
         ng0, ng1, ng2, cost1) = assemble(cx_, cy_, cz_)
        accept = cost1 < cost0
        sel = lambda a, b: jnp.where(accept, a, b)  # noqa: E731
        return (sel(cx_, px), sel(cy_, py), sel(cz_, pz),
                sel(n00, h00), sel(n01, h01), sel(n02, h02),
                sel(n11, h11), sel(n12, h12), sel(n22, h22),
                sel(ng0, g0), sel(ng1, g1), sel(ng2, g2),
                sel(cost1, cost0),
                jnp.where(accept, lam * 0.5, lam * 4.0))

    if lam0 is None:
        lam0 = jnp.full((P,), 1e-3)
    px0, py0, pz0 = points0[:, 0], points0[:, 1], points0[:, 2]
    st0 = assemble(px0, py0, pz0)
    st = (px0, py0, pz0) + st0[:9] + (st0[9], lam0)
    out = jax.lax.fori_loop(0, iters, body, st)
    px, py, pz, lam = out[0], out[1], out[2], out[13]

    _, _, z, _, _, _, c2 = project(px, py, pz)
    inlier = obs_valid & (c2 <= CHI2_MONO) & (z > 0)
    return PointsOptResult(points=jnp.stack([px, py, pz], axis=1),
                           obs_inlier=inlier, lam=lam)
