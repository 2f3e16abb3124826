"""Batched EPnP + RANSAC — pose from 3D-2D correspondences.

Replaces src/PnPsolver.cc (Lepetit's EPnP + adaptive RANSAC, 1586 LoC;
dead code in the fork but a declared north-star capability).  The
TPU-native shape: H minimal 4-point hypotheses are solved by ONE
vmapped EPnP (control points -> barycentric alphas -> 12x12 eigen
kernel -> beta cases N=1/2/3 with Gauss-Newton -> rigid Horn alignment),
all H x N reprojection checks run dense, argmax picks the winner —
no sequential RANSAC loop (src/PnPsolver.cc:180-246).

EPnP follows the published algorithm; reference anchor points:
control points (src/PnPsolver.cc:286-309), barycentric coordinates
(:311-333), the M matrix (:335-355), beta approximations
(:455-527), Gauss-Newton on betas (:571-613), pose recovery by
absolute orientation (:357-453).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import horn, sim3, se3


class PnPResult(NamedTuple):
    Tcw: jnp.ndarray        # (4, 4) best pose
    inliers: jnp.ndarray    # (N,) bool under the best pose
    n_inliers: jnp.ndarray  # ()
    ok: jnp.ndarray         # () bool


def _project(pc, fx, fy, cx, cy):
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
    return jnp.stack([fx * pc[..., 0] / z + cx,
                      fy * pc[..., 1] / z + cy], -1)


def _control_points(pts: jnp.ndarray) -> jnp.ndarray:
    """World control points: centroid + principal directions
    (src/PnPsolver.cc:286-309).  pts: (n, 3) -> (4, 3)."""
    c0 = jnp.mean(pts, axis=0)
    d = pts - c0
    cov = d.T @ d / pts.shape[0]
    w, v = jnp.linalg.eigh(cov)           # ascending
    s = jnp.sqrt(jnp.maximum(w, 1e-12))
    # degenerate (planar/linear) sets: keep a tiny extent so the
    # barycentric solve stays invertible; RANSAC scoring rejects junk.
    s = jnp.maximum(s, 1e-6)
    cs = c0[None] + s[:, None] * v.T      # (3, 3) rows
    return jnp.concatenate([c0[None], cs], axis=0)


def _barycentric(pts: jnp.ndarray, cw: jnp.ndarray) -> jnp.ndarray:
    """alphas such that p = sum_j alpha_j c_j, sum alpha = 1
    (src/PnPsolver.cc:311-333).  (n,3),(4,3) -> (n,4)."""
    CC = (cw[1:] - cw[0]).T               # (3, 3)
    rhs = (pts - cw[0]).T                 # (3, n)
    a123 = jnp.linalg.solve(CC + 1e-12 * jnp.eye(3), rhs).T  # (n, 3)
    a0 = 1.0 - jnp.sum(a123, axis=1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=1)


def _build_M(alphas, uv, fx, fy, cx, cy):
    """(n,4),(n,2) -> (2n,12) (src/PnPsolver.cc:335-355)."""
    n = alphas.shape[0]
    u, v = uv[:, 0], uv[:, 1]
    rows_u = jnp.stack([
        alphas * fx,                       # x coeff per control point
        jnp.zeros_like(alphas),
        alphas * (cx - u)[:, None],
    ], axis=-1).reshape(n, 12)
    rows_v = jnp.stack([
        jnp.zeros_like(alphas),
        alphas * fy,
        alphas * (cy - v)[:, None],
    ], axis=-1).reshape(n, 12)
    return jnp.concatenate([rows_u, rows_v], axis=0)


def _rho(cw: jnp.ndarray) -> jnp.ndarray:
    """Squared pairwise distances of the 4 world control points (6,)."""
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    return jnp.stack([jnp.sum((cw[i] - cw[j]) ** 2) for i, j in pairs])


def _L6x10(V: jnp.ndarray) -> jnp.ndarray:
    """V: (12, 4) kernel vectors (columns, ordered v1..v4) -> L (6, 10)
    for betas [b11,b12,b22,b13,b23,b33,b14,b24,b34,b44]
    (src/PnPsolver.cc:529-569)."""
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    v = V.T.reshape(4, 4, 3)              # (vec, control point, xyz)
    dv = jnp.stack([v[:, i] - v[:, j] for i, j in pairs])  # (6, 4, 3)

    def dot(a, b):
        return jnp.sum(dv[:, a] * dv[:, b], axis=-1)       # (6,)

    return jnp.stack([
        dot(0, 0), 2 * dot(0, 1), dot(1, 1), 2 * dot(0, 2),
        2 * dot(1, 2), dot(2, 2), 2 * dot(0, 3), 2 * dot(1, 3),
        2 * dot(2, 3), dot(3, 3)], axis=1)                  # (6, 10)


def _lstsq(A, b):
    return jnp.linalg.solve(A.T @ A + 1e-9 * jnp.eye(A.shape[1]), A.T @ b)


def _betas_approx_1(L, rho):
    """N=4 start: unknowns [b11, b12, b13, b14] (src/PnPsolver.cc:455-478)."""
    x = _lstsq(L[:, [0, 1, 3, 6]], rho)
    b1 = jnp.sqrt(jnp.abs(x[0]))
    sgn = jnp.where(x[0] < 0, -1.0, 1.0)
    return jnp.stack([b1, sgn * x[1] / jnp.maximum(b1, 1e-12),
                      sgn * x[2] / jnp.maximum(b1, 1e-12),
                      sgn * x[3] / jnp.maximum(b1, 1e-12)])


def _betas_approx_2(L, rho):
    """N=2 start: [b11, b12, b22] (src/PnPsolver.cc:480-501)."""
    x = _lstsq(L[:, [0, 1, 2]], rho)
    b1 = jnp.sqrt(jnp.abs(x[0]))
    b2 = jnp.sqrt(jnp.abs(x[2])) * jnp.where(x[1] < 0, -1.0, 1.0)
    return jnp.stack([b1, b2, jnp.zeros(()), jnp.zeros(())])


def _betas_approx_3(L, rho):
    """N=3 start: [b11, b12, b22, b13, b23] (src/PnPsolver.cc:503-527)."""
    x = _lstsq(L[:, [0, 1, 2, 3, 4]], rho)
    b1 = jnp.sqrt(jnp.abs(x[0]))
    b2 = jnp.sqrt(jnp.abs(x[2])) * jnp.where(x[1] < 0, -1.0, 1.0)
    b3 = x[3] / jnp.maximum(b1, 1e-12)
    return jnp.stack([b1, b2, b3, jnp.zeros(())])


def _gauss_newton_betas(L, rho, betas, iters: int = 5):
    """Refine betas on the 6 distance constraints
    (src/PnPsolver.cc:571-613)."""
    idx = jnp.array([[0, 0], [0, 1], [1, 1], [0, 2], [1, 2], [2, 2],
                     [0, 3], [1, 3], [2, 3], [3, 3]])

    def monomials(b):
        return b[idx[:, 0]] * b[idx[:, 1]]   # (10,)

    def jac(b):
        # d(monomial_k)/d(beta_m)
        e = jnp.eye(4)
        return (e[idx[:, 0]] * b[idx[:, 1], None]
                + e[idx[:, 1]] * b[idx[:, 0], None])  # (10, 4)

    def body(_, b):
        r = L @ monomials(b) - rho           # (6,)
        J = L @ jac(b)                        # (6, 4)
        db = _lstsq(J, -r)
        return b + db

    return jax.lax.fori_loop(0, iters, body, betas)


def _pose_from_betas(V, betas, alphas, pts_w):
    """Camera control points -> camera point coords -> rigid Horn
    alignment (src/PnPsolver.cc:357-453)."""
    ccs = (V @ betas).reshape(4, 3)          # camera-frame control points
    pc = alphas @ ccs                         # (n, 3)
    # enforce positive depth (cheirality): EPnP kernel sign is arbitrary
    flip = jnp.where(jnp.sum(pc[:, 2]) < 0, -1.0, 1.0)
    pc = pc * flip
    g = horn.horn_sim3(pc, pts_w, fix_scale=True)   # world -> camera rigid
    T = sim3.to_se3(g)
    return T, pc


def _epnp_single(pts_w, uv, fx, fy, cx, cy):
    """EPnP on one minimal/full set: (n,3),(n,2) -> (4,4), err."""
    cw = _control_points(pts_w)
    alphas = _barycentric(pts_w, cw)
    M = _build_M(alphas, uv, fx, fy, cx, cy)
    MtM = M.T @ M
    _, vecs = jnp.linalg.eigh(MtM)           # ascending eigenvalues
    V = vecs[:, :4]                          # null-space basis v1..v4
    L = _L6x10(V)
    rho = _rho(cw)

    def solve_case(betas0):
        betas = _gauss_newton_betas(L, rho, betas0)
        T, _ = _pose_from_betas(V, betas, alphas, pts_w)
        pc = pts_w @ T[:3, :3].T + T[:3, 3]
        r = _project(pc, fx, fy, cx, cy) - uv
        err = jnp.mean(jnp.sum(r * r, -1))
        return T, err

    cases = [_betas_approx_1(L, rho), _betas_approx_2(L, rho),
             _betas_approx_3(L, rho)]
    Ts, errs = zip(*(solve_case(b) for b in cases))
    Ts = jnp.stack(Ts)
    errs = jnp.stack(errs)
    best = jnp.argmin(errs)
    return Ts[best], errs[best]


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy"))
def epnp(pts_w: jnp.ndarray, uv: jnp.ndarray,
         fx: float, fy: float, cx: float, cy: float):
    """EPnP on a single correspondence set (n >= 4).  Returns (Tcw, err)."""
    return _epnp_single(pts_w, uv, fx, fy, cx, cy)


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy",
                                             "min_inliers"))
def pnp_ransac(
    pts_w: jnp.ndarray,      # (N, 3) world points
    uv: jnp.ndarray,         # (N, 2) observed pixels
    inv_sigma2: jnp.ndarray,  # (N,) per-observation information
    valid: jnp.ndarray,      # (N,) bool
    samples: jnp.ndarray,    # (H, 4) int32 minimal-sample indices
    fx: float, fy: float, cx: float, cy: float,
    min_inliers: int = 10,
    chi2: float = 5.991,
) -> PnPResult:
    """Fixed-batch EPnP RANSAC (replaces PnPsolver::iterate,
    src/PnPsolver.cc:180-246): H hypotheses solved in one vmap, dense
    H x N chi2 scoring, argmax winner."""
    p_s = pts_w[samples]                     # (H, 4, 3)
    uv_s = uv[samples]
    Ts, _ = jax.vmap(
        lambda p, q: _epnp_single(p, q, fx, fy, cx, cy))(p_s, uv_s)

    hyp_ok = jnp.all(valid[samples], axis=-1)
    pc = jnp.einsum("hij,nj->hni", Ts[:, :3, :3], pts_w) + Ts[:, None, :3, 3]
    r = _project(pc, fx, fy, cx, cy) - uv[None]
    c2 = jnp.sum(r * r, -1) * inv_sigma2[None]
    inl = valid[None] & (c2 <= chi2) & (pc[..., 2] > 0)
    counts = jnp.where(hyp_ok, jnp.sum(inl, axis=-1), -1)

    best = jnp.argmax(counts)
    n_best = counts[best]
    return PnPResult(
        Tcw=Ts[best],
        inliers=inl[best],
        n_inliers=jnp.maximum(n_best, 0),
        ok=n_best >= min_inliers,
    )
