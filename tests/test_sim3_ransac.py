"""Sim3 RANSAC (optim/sim3_ransac.py) against synthetic ground truth."""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_tpu.geom import sim3 as sim3_mod, se3
from orb_slam2_tpu.optim import sim3_ransac

FX = FY = 400.0
CX, CY = 320.0, 240.0


def _project(pc):
    return np.stack([FX * pc[:, 0] / pc[:, 2] + CX,
                     FY * pc[:, 1] / pc[:, 2] + CY], -1).astype(np.float32)


def _make_problem(seed=0, n=80, n_out=20, scale=1.4):
    rng = np.random.default_rng(seed)
    # ground-truth S12 (frame2 -> frame1)
    axis = rng.normal(size=3)
    axis = 0.3 * axis / np.linalg.norm(axis)
    R = np.asarray(se3.so3_exp(jnp.asarray(axis, jnp.float32)))
    t = rng.normal(0, 0.5, 3).astype(np.float32)
    S12 = np.asarray(sim3_mod.make(jnp.asarray(R), jnp.asarray(t),
                                   jnp.float32(scale)))
    # points in camera-2 frame, in front of both cameras
    p2 = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3)).astype(np.float32)
    p1 = np.asarray(sim3_mod.apply(jnp.asarray(S12)[None],
                                   jnp.asarray(p2)[None])[0])
    uv1 = _project(p1)
    uv2 = _project(p2)
    # corrupt the last n_out correspondences
    p2_bad = p2.copy()
    p2_bad[-n_out:] += rng.uniform(2, 4, (n_out, 3)).astype(np.float32)
    return S12, p1, p2_bad, uv1, uv2, n_out


def test_sim3_ransac_recovers_transform():
    S12_gt, p1, p2, uv1, uv2, n_out = _make_problem()
    n = len(p1)
    rng = np.random.default_rng(42)
    samples = rng.integers(0, n, (256, 3)).astype(np.int32)
    me = np.full(n, 9.21 * 1.0, np.float32)
    res = sim3_ransac.sim3_ransac(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1),
        jnp.asarray(uv2), jnp.asarray(me), jnp.asarray(me),
        jnp.asarray(np.ones(n, bool)), jnp.asarray(samples),
        FX, FY, CX, CY, min_inliers=20)
    assert bool(res.ok)
    assert int(res.n_inliers) >= n - n_out - 2
    # outliers must be excluded
    inl = np.asarray(res.inliers)
    assert inl[-n_out:].sum() <= 2
    s_est = float(np.asarray(sim3_mod.scale(res.S12)))
    s_gt = float(np.asarray(sim3_mod.scale(jnp.asarray(S12_gt))))
    assert abs(s_est - s_gt) / s_gt < 0.05
    # rotation/translation agreement via action on inlier points
    p1_est = np.asarray(sim3_mod.apply(res.S12[None],
                                       jnp.asarray(p2)[None])[0])
    err = np.linalg.norm(p1_est[:-n_out] - p1[:-n_out], axis=-1)
    assert np.median(err) < 0.05


def test_sim3_ransac_rejects_garbage():
    rng = np.random.default_rng(3)
    n = 64
    p1 = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3)).astype(np.float32)
    p2 = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3)).astype(np.float32)
    uv1 = _project(p1)
    uv2 = _project(p2)
    me = np.full(n, 9.21, np.float32)
    samples = rng.integers(0, n, (256, 3)).astype(np.int32)
    res = sim3_ransac.sim3_ransac(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1),
        jnp.asarray(uv2), jnp.asarray(me), jnp.asarray(me),
        jnp.asarray(np.ones(n, bool)), jnp.asarray(samples),
        FX, FY, CX, CY, min_inliers=20)
    assert not bool(res.ok)


def test_sim3_ransac_padding_invalid_rows():
    S12_gt, p1, p2, uv1, uv2, n_out = _make_problem(seed=5)
    n = len(p1)
    pad = 48
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    p1p = np.concatenate([p1, np.zeros((pad, 3), np.float32)])
    p2p = np.concatenate([p2, np.zeros((pad, 3), np.float32)])
    uv1p = np.concatenate([uv1, np.zeros((pad, 2), np.float32)])
    uv2p = np.concatenate([uv2, np.zeros((pad, 2), np.float32)])
    me = np.full(n + pad, 9.21, np.float32)
    rng = np.random.default_rng(7)
    samples = rng.integers(0, n + pad, (256, 3)).astype(np.int32)
    res = sim3_ransac.sim3_ransac(
        jnp.asarray(p1p), jnp.asarray(p2p), jnp.asarray(uv1p),
        jnp.asarray(uv2p), jnp.asarray(me), jnp.asarray(me),
        jnp.asarray(valid), jnp.asarray(samples),
        FX, FY, CX, CY, min_inliers=20)
    assert bool(res.ok)
    # padded rows can never be inliers
    assert not np.asarray(res.inliers)[n:].any()


def test_sim3_ransac_fix_scale():
    """6-DoF mode (loop_fix_scale / pose-prior): the solved transform
    has scale exactly 1 and still recovers R, t of an SE3 ground truth
    (the reference's bFixScale path, src/Sim3Solver.cc:400)."""
    S12_gt, p1, p2, uv1, uv2, n_out = _make_problem(seed=5, scale=1.0)
    n = len(p1)
    rng = np.random.default_rng(7)
    samples = rng.integers(0, n, (256, 3)).astype(np.int32)
    me = np.full(n, 9.21 * 1.0, np.float32)
    res = sim3_ransac.sim3_ransac(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1),
        jnp.asarray(uv2), jnp.asarray(me), jnp.asarray(me),
        jnp.asarray(np.ones(n, bool)), jnp.asarray(samples),
        FX, FY, CX, CY, min_inliers=20, fix_scale=True)
    assert bool(res.ok)
    s_est = float(np.asarray(sim3_mod.scale(res.S12)))
    assert abs(s_est - 1.0) < 1e-6
    p1_est = np.asarray(sim3_mod.apply(res.S12[None],
                                       jnp.asarray(p2)[None])[0])
    err = np.linalg.norm(p1_est[:-n_out] - p1[:-n_out], axis=-1)
    assert np.median(err) < 0.05


def test_optimize_sim3_fix_scale_keeps_unit_scale():
    from orb_slam2_tpu.optim import sim3_opt
    S12_gt, p1, p2, uv1, uv2, n_out = _make_problem(seed=9, scale=1.0)
    n = len(p1)
    # fix_scale FREEZES the scale DOF at its init (g2o's
    # VertexSim3Expmap._fix_scale semantics, Optimizer.cc:1014); the
    # pipeline always hands it the fixed-scale RANSAC result (s = 1).
    # Perturb the POSE, keep s0 = 1: refine must recover R, t with the
    # scale pinned at exactly 1.
    S0 = np.asarray(S12_gt).copy()
    S0[4] += 0.1   # translation x
    res = sim3_opt.optimize_sim3(
        jnp.asarray(S0), jnp.asarray(p1), jnp.asarray(p2),
        jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32),
        jnp.asarray(np.ones(n, bool)),
        FX, FY, CX, CY, iters=10, fix_scale=True)
    s_est = float(np.asarray(sim3_mod.scale(res.S12)))
    assert abs(s_est - 1.0) < 1e-6
