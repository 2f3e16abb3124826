"""EPnP + RANSAC (optim/pnp.py) against synthetic ground truth."""
import numpy as np
import jax.numpy as jnp

from orb_slam2_tpu.geom import se3
from orb_slam2_tpu.optim import pnp

FX = FY = 450.0
CX, CY = 320.0, 240.0


def _pose(seed=0):
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=3)
    axis = 0.4 * axis / np.linalg.norm(axis)
    R = np.asarray(se3.so3_exp(jnp.asarray(axis, jnp.float32)))
    t = np.array([0.3, -0.2, 0.5], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def _project(T, pw):
    pc = pw @ T[:3, :3].T + T[:3, 3]
    return np.stack([FX * pc[:, 0] / pc[:, 2] + CX,
                     FY * pc[:, 1] / pc[:, 2] + CY], -1).astype(np.float32)


def test_epnp_exact():
    T = _pose(0)
    rng = np.random.default_rng(1)
    # world points seen in front of the camera
    pw = rng.uniform([-3, -3, 4], [3, 3, 12], (12, 3)).astype(np.float32)
    pw = pw @ T[:3, :3] - (T[:3, 3] @ T[:3, :3])  # move to world frame
    uv = _project(T, pw)
    T_est, err = pnp.epnp(jnp.asarray(pw), jnp.asarray(uv), FX, FY, CX, CY)
    T_est = np.asarray(T_est)
    assert float(err) < 1.0
    # compare action on the points
    pc_gt = pw @ T[:3, :3].T + T[:3, 3]
    pc_est = pw @ T_est[:3, :3].T + T_est[:3, 3]
    assert np.median(np.linalg.norm(pc_gt - pc_est, axis=-1)) < 0.05


def test_pnp_ransac_with_outliers():
    T = _pose(2)
    rng = np.random.default_rng(3)
    n, n_out = 100, 30
    pw = rng.uniform([-3, -3, 4], [3, 3, 12], (n, 3)).astype(np.float32)
    pw = pw @ T[:3, :3] - (T[:3, 3] @ T[:3, :3])
    uv = _project(T, pw)
    uv[-n_out:] += rng.uniform(30, 120, (n_out, 2)).astype(np.float32)
    samples = rng.integers(0, n, (128, 4)).astype(np.int32)
    res = pnp.pnp_ransac(
        jnp.asarray(pw), jnp.asarray(uv),
        jnp.asarray(np.ones(n, np.float32)),
        jnp.asarray(np.ones(n, bool)),
        jnp.asarray(samples), FX, FY, CX, CY, min_inliers=10)
    assert bool(res.ok)
    assert int(res.n_inliers) >= n - n_out - 5
    inl = np.asarray(res.inliers)
    assert inl[-n_out:].sum() <= 3
    T_est = np.asarray(res.Tcw)
    pc_gt = pw[:10] @ T[:3, :3].T + T[:3, 3]
    pc_est = pw[:10] @ T_est[:3, :3].T + T_est[:3, 3]
    assert np.median(np.linalg.norm(pc_gt - pc_est, axis=-1)) < 0.1


def test_pnp_ransac_rejects_garbage():
    rng = np.random.default_rng(4)
    n = 64
    pw = rng.uniform([-3, -3, 4], [3, 3, 12], (n, 3)).astype(np.float32)
    uv = rng.uniform([0, 0], [640, 480], (n, 2)).astype(np.float32)
    samples = rng.integers(0, n, (128, 4)).astype(np.int32)
    res = pnp.pnp_ransac(
        jnp.asarray(pw), jnp.asarray(uv),
        jnp.asarray(np.ones(n, np.float32)),
        jnp.asarray(np.ones(n, bool)),
        jnp.asarray(samples), FX, FY, CX, CY, min_inliers=30)
    assert not bool(res.ok)
