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

TPU layout note: the per-observation quantities (Jacobian rows, the
6x3 coupling block W) live as RANK-1 LANES — Python lists of (O,)
arrays — never as (O, 6, 3)-shaped tensors.  TPU tiles the two minor
dims of every array to (8, 128), so an (O, 6, 3) intermediate inflates
~42x in HBM; the lane form measured ~5x faster per LM iteration for
the structure-only solver (optim/points_opt.py) and the same math
applies here.  Per-camera/per-point reductions are ONE packed scatter
each (lanes stacked on the minor axis), and the LM loop linearizes
ONCE per iteration, carrying H/g/cost of the last accepted state.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

CHI2_MONO = 5.991

# A residual whose point falls behind the camera must COST, not vanish:
# excluding it lets LM "improve" the objective by flinging points to
# negative depth (cost monotonically ->0 while the state diverges to
# inf/NaN — observed on post-loop GBA with large initial drift).  g2o
# keeps such edges active with their (huge) chi2; a flat penalty per
# invalid observation preserves that no-free-lunch property while
# keeping the compiled graph branch-free.
INVALID_DEPTH_PENALTY = 1.0e8

# upper-triangle index pairs of a symmetric 6x6 (21) and 3x3 (6)
_IU6 = [(a, b) for a in range(6) for b in range(a, 6)]
_IU3 = [(a, b) for a in range(3) for b in range(a, 3)]


class BAResult(NamedTuple):
    cam_Tcw: jnp.ndarray     # (K, 4, 4)
    points: jnp.ndarray      # (P, 3)
    obs_inlier: jnp.ndarray  # (O,) bool
    final_cost: jnp.ndarray


def _identity_psum(x):
    return x


def _scatter_packed(lanes, idx, n_rows, psum):
    """Stack (O,) lanes on the minor axis and scatter-add into
    (n_rows, L) with ONE scatter op; returns the accumulated lanes as a
    list of (n_rows,) arrays.  Separate per-lane scatters measured ~4x
    slower (per-scatter fixed cost); matrix-shaped scatters pay (8,128)
    tile padding."""
    packed = jnp.stack(lanes, axis=1)
    acc = psum(jnp.zeros((n_rows, len(lanes)), packed.dtype)
               .at[idx].add(packed))
    return [acc[:, i] for i in range(len(lanes))]


def _sym_matvec(upper, x, iu):
    """Symmetric matrix-vector product in lanes: ``upper`` is the list
    of upper-triangle lanes of (n, D, D), ``x`` a list of D (n,) lanes."""
    D = len(x)
    out = [jnp.zeros_like(x[0]) for _ in range(D)]
    for (a, b), h in zip(iu, upper):
        out[a] = out[a] + h * x[b]
        if a != b:
            out[b] = out[b] + h * x[a]
    return out


def _inv3_sym(h00, h01, h02, h11, h12, h22):
    """Closed-form inverse lanes of a symmetric 3x3 (adjugate/det)."""
    c00 = h11 * h22 - h12 * h12
    c01 = h02 * h12 - h01 * h22
    c02 = h01 * h12 - h02 * h11
    c11 = h00 * h22 - h02 * h02
    c12 = h01 * h02 - h00 * h12
    c22 = h00 * h11 - h01 * h01
    det = h00 * c00 + h01 * c01 + h02 * c02
    idet = 1.0 / jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    return [c00 * idet, c01 * idet, c02 * idet,
            c11 * idet, c12 * idet, c22 * idet]


class _Linearized(NamedTuple):
    """Everything the solve needs from one linearization point, all in
    lanes: per-camera Hcc (21 upper lanes) + gc (6), per-point Hpp
    (6 upper lanes) + gp (3), per-obs W coupling (18 lanes), total cost."""
    hcc: list
    gc: list
    hpp: list
    gp: list
    W: list          # 18 (O,) lanes, row-major (a, b) of the 6x3 block
    cost: jnp.ndarray


def _project_lanes(R, t, obs_pt, obs_uv, px, py, pz, fx, fy, cx, cy):
    X, Y, Z = px[obs_pt], py[obs_pt], pz[obs_pt]
    x = R[0] * X + R[1] * Y + R[2] * Z + t[0]
    y = R[3] * X + R[4] * Y + R[5] * Z + t[1]
    z = R[6] * X + R[7] * Y + R[8] * Z + t[2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / zs
    r0 = fx * x * iz + cx - obs_uv[:, 0]
    r1 = fy * y * iz + cy - obs_uv[:, 1]
    return x, y, z, iz, r0, r1


def _rho_cost(c2, z, obs_w_extra, use_huber, psum):
    rho = jnp.where(c2 > CHI2_MONO,
                    2.0 * jnp.sqrt(c2 * CHI2_MONO) - CHI2_MONO,
                    c2) if use_huber else c2
    return psum(jnp.sum(jnp.where(obs_w_extra > 0,
                                  jnp.where(z > 0, rho,
                                            INVALID_DEPTH_PENALTY),
                                  0.0)))


def _linearize(cam_Tcw, px, py, pz, obs_cam, obs_pt, obs_uv, obs_isig2,
               obs_w_extra, fx, fy, cx, cy, use_huber, psum, psum_pt):
    K = cam_Tcw.shape[0]
    P = px.shape[0]
    R = [cam_Tcw[:, i, j][obs_cam] for i in range(3) for j in range(3)]
    t = [cam_Tcw[:, i, 3][obs_cam] for i in range(3)]
    x, y, z, iz, r0, r1 = _project_lanes(
        R, t, obs_pt, obs_uv, px, py, pz, fx, fy, cx, cy)
    c2 = (r0 * r0 + r1 * r1) * obs_isig2
    w = obs_isig2 * (jnp.where(
        c2 <= CHI2_MONO, 1.0,
        jnp.sqrt(CHI2_MONO / jnp.maximum(c2, 1e-12))) if use_huber else 1.0)
    w = w * obs_w_extra * (z > 0)

    a0 = fx * iz
    a2 = -fx * x * iz * iz
    b1 = fy * iz
    b2 = -fy * y * iz * iz
    # J_point rows = duv_dpc @ R (6 lanes)
    jp = [a0 * R[0] + a2 * R[6], a0 * R[1] + a2 * R[7],
          a0 * R[2] + a2 * R[8],
          b1 * R[3] + b2 * R[6], b1 * R[4] + b2 * R[7],
          b1 * R[5] + b2 * R[8]]
    # J_pose rows = duv_dpc @ [I | -hat(pc)] (12 lanes); pc = (x, y, z)
    zero = jnp.zeros_like(x)
    jc0 = [a0, zero, a2,
           a2 * y, a0 * z - a2 * x, -a0 * y]
    jc1 = [zero, b1, b2,
           -b1 * z + b2 * y, -b2 * x, b1 * x]

    # per-camera block: Hcc upper 21 + gc 6 + cost 1 -> one scatter
    cam_lanes = [w * (jc0[a] * jc0[b] + jc1[a] * jc1[b]) for a, b in _IU6]
    cam_lanes += [w * (jc0[a] * r0 + jc1[a] * r1) for a in range(6)]
    rho_eff = jnp.where(obs_w_extra > 0,
                        jnp.where(z > 0,
                                  jnp.where(c2 > CHI2_MONO,
                                            2.0 * jnp.sqrt(c2 * CHI2_MONO)
                                            - CHI2_MONO, c2)
                                  if use_huber else c2,
                                  INVALID_DEPTH_PENALTY),
                        0.0)
    cam_lanes.append(rho_eff)
    acc_c = _scatter_packed(cam_lanes, obs_cam, K, psum)
    hcc, gc, cost = acc_c[:21], acc_c[21:27], jnp.sum(acc_c[27])

    # per-point block: Hpp upper 6 + gp 3 -> one scatter
    pt_lanes = [w * (jp[a] * jp[b] + jp[3 + a] * jp[3 + b])
                for a, b in _IU3]
    pt_lanes += [w * (jp[a] * r0 + jp[3 + a] * r1) for a in range(3)]
    acc_p = _scatter_packed(pt_lanes, obs_pt, P, psum_pt)
    hpp, gp = acc_p[:6], acc_p[6:9]

    # W coupling (O, 6, 3) as 18 lanes, row-major (a, b)
    W = [w * (jc0[a] * jp[b] + jc1[a] * jp[3 + b])
         for a in range(6) for b in range(3)]
    return _Linearized(hcc=hcc, gc=gc, hpp=hpp, gp=gp, W=W, cost=cost)


def _cost_at(cam_Tcw, px, py, pz, obs_cam, obs_pt, obs_uv, obs_isig2,
             obs_w_extra, fx, fy, cx, cy, use_huber, psum):
    R = [cam_Tcw[:, i, j][obs_cam] for i in range(3) for j in range(3)]
    t = [cam_Tcw[:, i, 3][obs_cam] for i in range(3)]
    _, _, z, _, r0, r1 = _project_lanes(
        R, t, obs_pt, obs_uv, px, py, pz, fx, fy, cx, cy)
    c2 = (r0 * r0 + r1 * r1) * obs_isig2
    return _rho_cost(c2, z, obs_w_extra, use_huber, psum)


def _solve_step(lin: _Linearized, obs_cam, obs_pt, lam, fixed_cam, psum,
                cg_iters, psum_pt):
    """One damped Schur + PCG solve -> (delta_c (K,6), delta_p (P,3)),
    entirely in lanes except the tiny (K, 6, 6) preconditioner."""
    K = lin.hcc[0].shape[0]
    P = lin.hpp[0].shape[0]
    free = ~fixed_cam
    freef = free.astype(lin.hcc[0].dtype)

    # damping (trace-scaled, matching the matrix form)
    diag6 = [0, 6, 11, 15, 18, 20]   # upper-tri indices of (a, a)
    tr6 = sum(lin.hcc[d] for d in diag6)
    dmp_c = lam * jnp.maximum(tr6 / 6.0, 1e-6) + 1e-8
    hcc_d = list(lin.hcc)
    for i, d in enumerate(diag6):
        hcc_d[d] = hcc_d[d] + dmp_c
    tr3 = lin.hpp[0] + lin.hpp[3] + lin.hpp[5]
    dmp_p = lam * jnp.maximum(tr3 / 3.0, 1e-6) + 1e-8
    hpp_d = list(lin.hpp)
    for i, d in enumerate((0, 3, 5)):
        hpp_d[d] = hpp_d[d] + dmp_p
    hpp_inv = _inv3_sym(*hpp_d)   # 6 upper lanes of Hpp_d^-1

    W = lin.W                     # 18 lanes (a, b) row-major

    def W_x(x_lanes):
        """per-obs v_b = sum_a W[a,b] * x_a(obs_cam) -> scatter to P."""
        xg = [x_lanes[a][obs_cam] for a in range(6)]
        v = [sum(W[a * 3 + b] * xg[a] for a in range(6)) for b in range(3)]
        return _scatter_packed(v, obs_pt, P, psum_pt)

    def Wt_z(z_lanes):
        """per-obs u_a = sum_b W[a,b] * z_b(obs_pt) -> scatter to K."""
        zg = [z_lanes[b][obs_pt] for b in range(3)]
        u = [sum(W[a * 3 + b] * zg[b] for b in range(3)) for a in range(6)]
        return _scatter_packed(u, obs_cam, K, psum)

    # Schur RHS: b = -(gc - W Hpp^-1 gp), zero on fixed cams
    hig = _sym_matvec(hpp_inv, lin.gp, _IU3)
    rhs_corr = Wt_z(hig)
    b = [(-(lin.gc[a] - rhs_corr[a])) * freef for a in range(6)]

    def S_matvec(x_lanes):
        y = W_x(x_lanes)
        zl = _sym_matvec(hpp_inv, y, _IU3)
        corr = Wt_z(zl)
        out = _sym_matvec(hcc_d, x_lanes, _IU6)
        return [jnp.where(free, out[a] - corr[a], x_lanes[a])
                for a in range(6)]

    # Block-Jacobi preconditioner: exact Schur diagonal blocks.  The
    # (K, 6, 6) inverse stays in matrix form — K is tiny (<=256 rows).
    # WHW upper lanes: t[a][d] = sum_b W[a,b] Hppinv[b,d] gathered per
    # obs, then WHW[a,c] = sum_d t[a][d] W[c,d].
    hinv_o = [h[obs_pt] for h in hpp_inv]  # 6 upper lanes per obs
    # expand symmetric 3x3 access helper
    H3 = {(0, 0): hinv_o[0], (0, 1): hinv_o[1], (0, 2): hinv_o[2],
          (1, 0): hinv_o[1], (1, 1): hinv_o[3], (1, 2): hinv_o[4],
          (2, 0): hinv_o[2], (2, 1): hinv_o[4], (2, 2): hinv_o[5]}
    tA = [[sum(W[a * 3 + bb] * H3[(bb, d)] for bb in range(3))
           for d in range(3)] for a in range(6)]
    whw_lanes = [sum(tA[a][d] * W[c * 3 + d] for d in range(3))
                 for a, c in _IU6]
    whw = _scatter_packed(whw_lanes, obs_cam, K, psum)
    S_diag_u = [hcc_d[i] - whw[i] for i in range(21)]
    S_diag = jnp.zeros((K, 6, 6), S_diag_u[0].dtype)
    for (ia, ib), lane in zip(_IU6, S_diag_u):
        S_diag = S_diag.at[:, ia, ib].set(lane)
        if ia != ib:
            S_diag = S_diag.at[:, ib, ia].set(lane)
    eye6 = jnp.eye(6, dtype=S_diag.dtype)
    S_diag = jnp.where(free[:, None, None], S_diag,
                       jnp.broadcast_to(eye6, S_diag.shape))
    M_inv = jnp.linalg.inv(S_diag + 1e-8 * eye6)

    def precond(r_lanes):
        r = jnp.stack(r_lanes, axis=1)
        z = jnp.einsum("kab,kb->ka", M_inv, r)
        return [z[:, a] for a in range(6)]

    def dot(u, v):
        return sum(jnp.sum(u[a] * v[a]) for a in range(6))

    # PCG, fixed iteration count (compiler-friendly)
    x0 = [jnp.zeros((K,), b[0].dtype) for _ in range(6)]
    sx0 = S_matvec(x0)
    r0 = [b[a] - sx0[a] for a in range(6)]
    z0 = precond(r0)
    p0 = list(z0)

    def cg_body(_, st):
        x, r, z, p = st
        Sp = S_matvec(p)
        rz = dot(r, z)
        alpha = rz / jnp.maximum(dot(p, Sp), 1e-20)
        x = [x[a] + alpha * p[a] for a in range(6)]
        r_new = [r[a] - alpha * Sp[a] for a in range(6)]
        z_new = precond(r_new)
        beta = dot(r_new, z_new) / jnp.maximum(rz, 1e-20)
        p = [z_new[a] + beta * p[a] for a in range(6)]
        return x, r_new, z_new, p

    delta_c, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body,
                                         (x0, r0, z0, p0))
    delta_c = [jnp.where(free, delta_c[a], 0.0) for a in range(6)]

    # Back-substitute points: dp = Hpp^-1 (-gp - W^T dc)
    wtd = W_x(delta_c)
    rhs_p = [-(lin.gp[b] + wtd[b]) for b in range(3)]
    delta_p = _sym_matvec(hpp_inv, rhs_p, _IU3)
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

    ONE linearization per LM iteration: the candidate's lanes double as
    the next accepted state's system, so a rejected step re-solves the
    carried system with raised damping (identical candidate sequence to
    the naive re-assemble form at half the assembles).
    """
    from ..geom import se3

    if psum_pt is None:
        psum_pt = psum
    obs_w_extra = obs_valid.astype(jnp.float32)
    obs_cam = obs_cam.astype(jnp.int32)
    obs_pt = obs_pt.astype(jnp.int32)

    def lin_at(cam, px, py, pz):
        return _linearize(cam, px, py, pz, obs_cam, obs_pt, obs_uv,
                          obs_isig2, obs_w_extra, fx, fy, cx, cy,
                          use_huber, psum, psum_pt)

    px0, py0, pz0 = points[:, 0], points[:, 1], points[:, 2]
    lin0 = lin_at(cam_Tcw, px0, py0, pz0)

    def body(_, st):
        cam, px, py, pz, lin, lam = st
        dc, dp = _solve_step(lin, obs_cam, obs_pt, lam, fixed_cam, psum,
                             cg_iters, psum_pt)
        cam_new = se3.exp(jnp.stack(dc, axis=1)) @ cam
        px_n, py_n, pz_n = px + dp[0], py + dp[1], pz + dp[2]
        lin_new = lin_at(cam_new, px_n, py_n, pz_n)
        accept = lin_new.cost < lin.cost
        if abort_flag is not None:
            accept = accept & ~abort_flag
        sel = lambda a, b: jnp.where(accept, a, b)       # noqa: E731
        cam = jnp.where(accept, cam_new, cam)
        px, py, pz = sel(px_n, px), sel(py_n, py), sel(pz_n, pz)
        lin = jax.tree.map(sel, lin_new, lin)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        return cam, px, py, pz, lin, lam

    cam, px, py, pz, _, _ = jax.lax.fori_loop(
        0, iters, body, (cam_Tcw, px0, py0, pz0, lin0, jnp.float32(1e-4)))

    # final classification
    R = [cam[:, i, j][obs_cam] for i in range(3) for j in range(3)]
    t = [cam[:, i, 3][obs_cam] for i in range(3)]
    _, _, z, _, r0, r1 = _project_lanes(
        R, t, obs_pt, obs_uv, px, py, pz, fx, fy, cx, cy)
    c2 = (r0 * r0 + r1 * r1) * obs_isig2
    inlier = obs_valid & (c2 <= CHI2_MONO) & (z > 0)
    cost = _rho_cost(c2, z, obs_w_extra, use_huber, psum)
    return BAResult(cam_Tcw=cam,
                    points=jnp.stack([px, py, pz], axis=1),
                    obs_inlier=inlier, final_cost=cost)


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
