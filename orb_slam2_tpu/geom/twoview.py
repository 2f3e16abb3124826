"""Two-view relative-pose initialization: H/F-model RANSAC.

Upstream ORB-SLAM2's monocular initializer (the fork replaced it with
known-pose triangulation, src/Initializer.cc; BASELINE.json demands the
full capability).  TPU-native shape: fixed-batch RANSAC — all hypotheses
solved by one batched SVD, all hypothesis x match scores evaluated as a
dense masked matrix, winners by argmax; the 4 (E) / 8 (H) motion
candidates are ranked by a batched cheirality check.

Semantics follow upstream Initializer.cc (ORB_SLAM2 @ raulmur):
- normalized 8-point F and 4-point H DLT,
- symmetric transfer scoring with chi2 gates 5.991 (H) / 3.841 (F) and
  score offset 5.991,
- model selection by RH = SH / (SH + SF) > 0.40,
- ReconstructF: E = K^T F K, 4 (R, t) candidates,
- ReconstructH: Faugeras SVD decomposition, 8 candidates,
- CheckRT: triangulation, positive depth both views, parallax,
  reprojection gates, winner uniqueness (second < 0.75 * best).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

CHI2_H = 5.991
CHI2_F = 3.841
SCORE_OFFSET = 5.991


class TwoViewResult(NamedTuple):
    ok: jnp.ndarray          # () bool
    R: jnp.ndarray           # (3, 3) rotation cam1 -> cam2
    t: jnp.ndarray           # (3,) unit-norm translation
    points: jnp.ndarray      # (N, 3) triangulated in cam-1 frame
    good: jnp.ndarray        # (N,) bool triangulation inliers
    used_homography: jnp.ndarray  # () bool


# ----------------------------------------------------------------------
# point normalization (Initializer::Normalize)
# ----------------------------------------------------------------------
def _normalize(uv, valid):
    w = valid.astype(uv.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(uv * w[:, None], axis=0) / n
    d = jnp.abs(uv - mean) * w[:, None]
    md = jnp.sum(d, axis=0) / n
    s = 1.0 / jnp.maximum(md, 1e-9)
    T = jnp.array([[s[0], 0.0, -mean[0] * s[0]],
                   [0.0, s[1], -mean[1] * s[1]],
                   [0.0, 0.0, 1.0]], dtype=uv.dtype)
    return (uv - mean) * s, T


def _hom(uv):
    return jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)


# ----------------------------------------------------------------------
# minimal solvers, batched over hypotheses
# ----------------------------------------------------------------------
def _solve_h_batch(p1, p2):
    """4-point homography DLT: p1, p2 (H, 4, 2) -> (H, 3, 3) with
    x2 ~ H x1 (Initializer::ComputeH21)."""
    x, y = p1[..., 0], p1[..., 1]
    u, v = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], -1)
    r2 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], -1)
    A = jnp.concatenate([r1, r2], axis=-2)          # (H, 8, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    h = Vt[..., -1, :]
    return h.reshape(*h.shape[:-1], 3, 3)


def _solve_f_batch(p1, p2):
    """8-point fundamental: (H, 8, 2) x2 -> (H, 3, 3) with
    x2^T F x1 = 0 (Initializer::ComputeF21), rank-2 enforced."""
    x, y = p1[..., 0], p1[..., 1]
    u, v = p2[..., 0], p2[..., 1]
    o = jnp.ones_like(x)
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, o], -1)  # (H,8,9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[..., -1, :].reshape(*A.shape[:-2], 3, 3)
    U, S, Vt2 = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    return U @ (S[..., None] * Vt2)


# ----------------------------------------------------------------------
# model scoring (CheckHomography / CheckFundamental)
# ----------------------------------------------------------------------
def _score_h_batch(Hs, uv1, uv2, valid, inv_sigma2):
    """(B,3,3) x (N,2) -> scores (B,), inlier masks (B,N)."""
    Hinv = jnp.linalg.inv(Hs)
    x1 = _hom(uv1)   # (N, 3)
    x2 = _hom(uv2)

    def transfer(H, src, dst):
        p = jnp.einsum("bij,nj->bni", H, src)
        w = jnp.where(jnp.abs(p[..., 2:3]) < 1e-12, 1e-12, p[..., 2:3])
        d = p[..., :2] / w - dst[None, :, :2]
        return jnp.sum(d * d, -1) * inv_sigma2

    c21 = transfer(Hs, x1, x2)       # project 1 -> 2
    c12 = transfer(Hinv, x2, x1)
    ok = valid[None] & (c21 < CHI2_H) & (c12 < CHI2_H)
    score = jnp.sum(jnp.where(valid[None] & (c21 < CHI2_H),
                              SCORE_OFFSET - c21, 0.0), -1) \
        + jnp.sum(jnp.where(valid[None] & (c12 < CHI2_H),
                            SCORE_OFFSET - c12, 0.0), -1)
    return score, ok


def _score_f_batch(Fs, uv1, uv2, valid, inv_sigma2):
    x1 = _hom(uv1)
    x2 = _hom(uv2)
    l2 = jnp.einsum("bij,nj->bni", Fs, x1)             # epiline in im2
    l1 = jnp.einsum("bji,nj->bni", Fs, x2)             # epiline in im1
    num2 = jnp.einsum("bni,ni->bn", l2, x2)
    num1 = jnp.einsum("bni,ni->bn", l1, x1)
    d2 = num2 * num2 / jnp.maximum(
        l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12) * inv_sigma2
    d1 = num1 * num1 / jnp.maximum(
        l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12) * inv_sigma2
    ok = valid[None] & (d1 < CHI2_F) & (d2 < CHI2_F)
    score = jnp.sum(jnp.where(valid[None] & (d2 < CHI2_F),
                              SCORE_OFFSET - d2, 0.0), -1) \
        + jnp.sum(jnp.where(valid[None] & (d1 < CHI2_F),
                            SCORE_OFFSET - d1, 0.0), -1)
    return score, ok


# ----------------------------------------------------------------------
# CheckRT: triangulate + cheirality, batched over candidate motions
# ----------------------------------------------------------------------
def _triangulate_batch(R, t, K, uv1, uv2):
    """R (C,3,3), t (C,3): DLT triangulation of all N matches under each
    candidate -> (C, N, 3) in camera-1 frame."""
    C = R.shape[0]
    P1 = jnp.concatenate([K, jnp.zeros((3, 1))], axis=1)          # (3,4)
    Rt = jnp.concatenate([R, t[..., None]], axis=-1)              # (C,3,4)
    P2 = jnp.einsum("ij,cjk->cik", K, Rt)                         # (C,3,4)

    def one(P2c):
        A = jnp.stack([
            uv1[:, 0:1] * P1[2] - P1[0],
            uv1[:, 1:2] * P1[2] - P1[1],
            uv2[:, 0:1] * P2c[2] - P2c[0],
            uv2[:, 1:2] * P2c[2] - P2c[1],
        ], axis=1)                                                # (N,4,4)
        _, _, Vt = jnp.linalg.svd(A)
        X = Vt[:, -1, :]
        w = jnp.where(jnp.abs(X[:, 3:4]) < 1e-12, 1e-12, X[:, 3:4])
        return X[:, :3] / w

    return jax.vmap(one)(P2)


def _check_rt_batch(R, t, K, uv1, uv2, valid, inv_sigma2,
                    reproj_chi2: float = 4.0):
    """Upstream Initializer::CheckRT batched over C candidates: returns
    (n_good (C,), good masks (C,N), parallax_cos50 (C,), points (C,N,3))."""
    X = _triangulate_batch(R, t, K, uv1, uv2)               # (C, N, 3)
    finite = jnp.all(jnp.isfinite(X), -1)
    z1 = X[..., 2]
    o2 = -jnp.einsum("cij,cj->ci", jnp.transpose(R, (0, 2, 1)), t)  # (C,3)
    X2 = jnp.einsum("cij,cnj->cni", R, X) + t[:, None, :]
    z2 = X2[..., 2]

    # parallax between rays from both camera centers
    n1 = X
    n2 = X - o2[:, None, :]
    cosp = jnp.sum(n1 * n2, -1) / jnp.maximum(
        jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1), 1e-12)

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def reproj_err(P, uv):
        zz = jnp.where(jnp.abs(P[..., 2]) < 1e-12, 1e-12, P[..., 2])
        du = fx * P[..., 0] / zz + cx - uv[None, :, 0]
        dv = fy * P[..., 1] / zz + cy - uv[None, :, 1]
        return (du * du + dv * dv) * inv_sigma2

    e1 = reproj_err(X, uv1)
    e2 = reproj_err(X2, uv2)
    good = (valid[None] & finite
            & ((z1 > 0) | (cosp >= 0.99998))
            & ((z2 > 0) | (cosp >= 0.99998))
            & (cosp < 0.99998)
            & (e1 < reproj_chi2) & (e2 < reproj_chi2))
    n_good = jnp.sum(good, -1)

    # parallax statistic: upstream takes the 50th-smallest parallax among
    # good points (Initializer.cc CheckRT tail); approximate with the
    # min(50, n)-th percentile via sorting masked cos values ascending
    # on (1 - cos) i.e. descending cos
    cosp_masked = jnp.where(good, cosp, 1.0)
    sorted_cos = jnp.sort(cosp_masked, axis=-1)   # ascending: best first
    idx = jnp.minimum(49, jnp.maximum(n_good - 1, 0))
    par_cos = jnp.take_along_axis(sorted_cos, idx[:, None], axis=-1)[:, 0]
    return n_good, good, par_cos, X


# ----------------------------------------------------------------------
# motion recovery
# ----------------------------------------------------------------------
def _motions_from_F(F, K):
    """E = K^T F K -> 4 candidate (R, t) (Initializer::ReconstructF /
    DecomposeE)."""
    E = K.T @ F @ K
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _motions_from_H(H, K):
    """Faugeras SVD decomposition -> 8 candidate (R, t, n)
    (Initializer::ReconstructH, following Faugeras & Lustman 1988)."""
    A = jnp.linalg.inv(K) @ H @ K
    U, S, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = S[0], S[1], S[2]

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3),
                                0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3),
                                0.0))
    x1 = jnp.array([aux1, aux1, -aux1, -aux1])
    x3 = jnp.array([aux3, -aux3, aux3, -aux3])

    Rs, ts = [], []
    # case d' = d2 > 0
    aux_s = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / \
        jnp.maximum((d1 + d3) * d2, 1e-12)
    s_t = jnp.stack([aux_s, -aux_s, -aux_s, aux_s])
    c_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    for i in range(4):
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        Rp = Rp.at[0, 0].set(c_t).at[2, 2].set(c_t)
        Rp = Rp.at[0, 2].set(-s_t[i]).at[2, 0].set(s_t[i])
        tp = jnp.array([x1[i], 0.0, -x3[i]]) * (d1 - d3)
        Rs.append(s * U @ Rp @ Vt)
        ts.append(U @ tp)
    # case d' = -d2 < 0
    aux_sp = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / \
        jnp.maximum((d1 - d3) * d2, 1e-12)
    s_p = jnp.stack([aux_sp, -aux_sp, -aux_sp, aux_sp])
    c_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    for i in range(4):
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]])
        Rp = Rp.at[0, 0].set(c_p).at[2, 2].set(-c_p)
        Rp = Rp.at[0, 2].set(s_p[i]).at[2, 0].set(s_p[i])
        tp = jnp.array([x1[i], 0.0, x3[i]]) * (d1 + d3)
        Rs.append(s * U @ Rp @ Vt)
        ts.append(U @ tp)
    Rs = jnp.stack(Rs)
    ts = jnp.stack(ts)
    ts = ts / jnp.maximum(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12)
    return Rs, ts


# ----------------------------------------------------------------------
# full initializer
# ----------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("min_triangulated",
                                             "min_parallax_deg"))
def initialize_two_view(
    uv1: jnp.ndarray,        # (N, 2) matched kp in frame 1 (undistorted)
    uv2: jnp.ndarray,        # (N, 2)
    valid: jnp.ndarray,      # (N,) bool
    inv_sigma2: jnp.ndarray,  # (N,) 1/sigma^2 per match (kp2 octave)
    K: jnp.ndarray,          # (3, 3)
    samples8: jnp.ndarray,   # (B, 8) int32 RANSAC minimal samples
    min_triangulated: int = 50,
    min_parallax_deg: float = 1.0,
) -> TwoViewResult:
    n1, T1 = _normalize(uv1, valid)
    n2, T2 = _normalize(uv2, valid)
    T2inv = jnp.linalg.inv(T2)

    # --- fit both models on the same sample batch ---
    Hn = _solve_h_batch(n1[samples8[:, :4]], n2[samples8[:, :4]])
    Fn = _solve_f_batch(n1[samples8], n2[samples8])
    Hs = T2inv @ Hn @ T1            # denormalize: x2 = H x1
    Fs = jnp.transpose(T2, (1, 0)) @ Fn @ T1

    sample_ok = jnp.all(valid[samples8], axis=-1)
    score_h, ok_h = _score_h_batch(Hs, uv1, uv2, valid, inv_sigma2)
    score_f, ok_f = _score_f_batch(Fs, uv1, uv2, valid, inv_sigma2)
    score_h = jnp.where(sample_ok, score_h, -1.0)
    score_f = jnp.where(sample_ok, score_f, -1.0)
    bh = jnp.argmax(score_h)
    bf = jnp.argmax(score_f)
    SH = score_h[bh]
    SF = score_f[bf]
    H_best = Hs[bh]
    F_best = Fs[bf]
    inl_h = ok_h[bh]
    inl_f = ok_f[bf]

    use_h = SH / jnp.maximum(SH + SF, 1e-12) > 0.40

    # --- recover motion candidates from BOTH models, select by gate ---
    Rh, th_ = _motions_from_H(H_best, K)
    Rf, tf_ = _motions_from_F(F_best, K)

    def pick(Rc, tc, inliers):
        n_good, good, par_cos, X = _check_rt_batch(
            Rc, tc, K, uv1, uv2, valid & inliers, inv_sigma2)
        order = jnp.argsort(-n_good)
        best, second = order[0], order[1]
        n_best = n_good[best]
        distinct = n_good[second] < 0.75 * n_best
        n_inl = jnp.sum(valid & inliers)
        enough = (n_best > jnp.maximum(
            (0.9 * n_inl).astype(n_best.dtype), min_triangulated))
        par_deg = jnp.degrees(jnp.arccos(jnp.clip(par_cos[best], -1, 1)))
        ok = distinct & enough & (par_deg > min_parallax_deg)
        return ok, Rc[best], tc[best], X[best], good[best]

    okH, RH_, tH_, XH_, gH_ = pick(Rh, th_, inl_h)
    okF, RF_, tF_, XF_, gF_ = pick(Rf, tf_, inl_f)

    ok = jnp.where(use_h, okH, okF)
    R = jnp.where(use_h, RH_, RF_)
    t = jnp.where(use_h, tH_, tF_)
    X = jnp.where(use_h, XH_, XF_)
    good = jnp.where(use_h, gH_, gF_)
    return TwoViewResult(ok=ok, R=R, t=t, points=X, good=good,
                         used_homography=use_h)
