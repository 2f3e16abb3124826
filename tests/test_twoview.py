"""H/F-model two-view initializer (geom/twoview.py) on synthetic scenes."""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_tpu.geom import twoview, se3

FX = FY = 450.0
CX, CY = 320.0, 240.0
K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)


def _pose(axis, trans):
    R = np.asarray(se3.so3_exp(jnp.asarray(axis, jnp.float32)))
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = trans
    return T


def _project(T, X):
    pc = X @ T[:3, :3].T + T[:3, 3]
    return np.stack([FX * pc[:, 0] / pc[:, 2] + CX,
                     FY * pc[:, 1] / pc[:, 2] + CY], -1).astype(np.float32)


def _run(X, T2, n_out=0, seed=0):
    rng = np.random.default_rng(seed)
    uv1 = _project(np.eye(4, dtype=np.float32), X)
    uv2 = _project(T2, X)
    uv1 += rng.normal(0, 0.3, uv1.shape).astype(np.float32)
    uv2 += rng.normal(0, 0.3, uv2.shape).astype(np.float32)
    if n_out:
        uv2[-n_out:] += rng.uniform(20, 80, (n_out, 2)).astype(np.float32)
    n = len(X)
    samples = rng.integers(0, n, (200, 8)).astype(np.int32)
    return twoview.initialize_two_view(
        jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.asarray(np.ones(n, bool)),
        jnp.asarray(np.ones(n, np.float32)),
        jnp.asarray(K), jnp.asarray(samples))


def _check_motion(res, T2, atol_rot=0.02, atol_t=0.05):
    R_est = np.asarray(res.R)
    t_est = np.asarray(res.t)
    R_gt = T2[:3, :3]
    t_gt = T2[:3, 3] / np.linalg.norm(T2[:3, 3])
    assert np.linalg.norm(R_est - R_gt) < atol_rot, (R_est, R_gt)
    assert min(np.linalg.norm(t_est - t_gt),
               np.linalg.norm(t_est + t_gt)) < atol_t


def test_general_scene_uses_fundamental():
    rng = np.random.default_rng(1)
    X = rng.uniform([-3, -3, 4], [3, 3, 12], (200, 3)).astype(np.float32)
    T2 = _pose([0.02, -0.05, 0.01], [0.8, 0.05, 0.05])
    res = _run(X, T2)
    assert bool(res.ok)
    assert not bool(res.used_homography)
    assert int(np.asarray(res.good).sum()) > 150
    _check_motion(res, T2)


def test_planar_scene_uses_homography():
    rng = np.random.default_rng(2)
    # points on the plane z = 8 (fronto-parallel): F is degenerate
    X = np.stack([rng.uniform(-4, 4, 200), rng.uniform(-3, 3, 200),
                  np.full(200, 8.0)], -1).astype(np.float32)
    T2 = _pose([0.05, 0.08, 0.02], [0.6, 0.1, 0.05])
    res = _run(X, T2)
    assert bool(res.ok)
    assert bool(res.used_homography)
    _check_motion(res, T2, atol_rot=0.05, atol_t=0.1)


def test_outliers_rejected():
    rng = np.random.default_rng(3)
    X = rng.uniform([-3, -3, 4], [3, 3, 12], (200, 3)).astype(np.float32)
    T2 = _pose([0.02, -0.05, 0.01], [0.8, 0.05, 0.05])
    res = _run(X, T2, n_out=40)
    assert bool(res.ok)
    good = np.asarray(res.good)
    assert good[-40:].sum() <= 4
    _check_motion(res, T2)


def test_pure_rotation_rejected():
    """No parallax -> initialization must refuse."""
    rng = np.random.default_rng(4)
    X = rng.uniform([-3, -3, 4], [3, 3, 12], (200, 3)).astype(np.float32)
    T2 = _pose([0.0, 0.1, 0.0], [1e-5, 0, 0])
    res = _run(X, T2)
    assert not bool(res.ok)
