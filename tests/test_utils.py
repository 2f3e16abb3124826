"""Tests for evaluation + visualization utilities."""
import numpy as np
import pytest

from orb_slam2_tpu.utils import evaluate, viz


def _rand_rot(rng):
    w = rng.normal(0, 0.5, 3)
    th = np.linalg.norm(w)
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    return np.eye(3) + np.sin(th) / th * K + (1 - np.cos(th)) / th**2 * K @ K


def test_umeyama_exact():
    rng = np.random.default_rng(0)
    src = rng.normal(0, 2, (40, 3))
    R = _rand_rot(rng)
    s, t = 1.7, np.array([1.0, -2.0, 0.5])
    dst = s * (R @ src.T).T + t
    s2, R2, t2 = evaluate.umeyama_alignment(src, dst, with_scale=True)
    assert abs(s2 - s) < 1e-9
    np.testing.assert_allclose(R2, R, atol=1e-9)
    np.testing.assert_allclose(t2, t, atol=1e-9)


def test_ate_zero_after_alignment():
    rng = np.random.default_rng(1)
    gt = rng.normal(0, 2, (30, 3))
    R = _rand_rot(rng)
    est = 0.5 * (R @ gt.T).T + np.array([3.0, 0, 0])
    assert evaluate.ate_rmse(est, gt, align="sim3") < 1e-9
    assert evaluate.ate_rmse(est, gt, align="se3") > 0.1


def test_rpe_identity():
    rng = np.random.default_rng(2)
    Ts = []
    T = np.eye(4)
    for _ in range(10):
        d = np.eye(4)
        d[:3, :3] = _rand_rot(rng)
        d[:3, 3] = rng.normal(0, 0.1, 3)
        T = d @ T
        Ts.append(T.copy())
    t_err, r_err = evaluate.rpe(Ts, Ts)
    assert t_err < 1e-12 and r_err < 1e-5


def test_associate():
    a = np.array([0.0, 0.1, 0.2, 0.35])
    b = np.array([0.005, 0.11, 0.5])
    pairs = evaluate.associate(a, b, max_dt=0.02)
    assert (0, 0) in pairs and (1, 1) in pairs
    assert all(j != 2 for _, j in pairs)


def test_resize_without_moire():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (480, 640)).astype(np.float32)
    out = viz.resize_without_moire(img, 160, 120)
    assert out.shape == (120, 160)
    # mean preserved by area-averaging within a few grey levels
    assert abs(out.mean() - img.mean()) < 3.0


def test_draw_frame_and_map(tmp_path):
    pytest.importorskip("matplotlib")
    from orb_slam2_tpu.geom.camera import Intrinsics
    from orb_slam2_tpu.ops.extractor import OrbParams
    from orb_slam2_tpu.pipeline import SlamConfig, System
    from orb_slam2_tpu.utils import synth

    cam = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                     width=640, height=480)
    cfg = SlamConfig(cam=cam, orb=OrbParams(n_features=600, n_levels=4),
                     pose_prior=True, init_min_matches=60,
                     init_min_triangulated=40, init_min_tracked_after_ba=60)
    world = synth.make_world(seed=3)
    poses = synth.aerial_trajectory(6, speed=0.4)
    sys_ = System(cfg, enable_loop_closing=False)
    img = None
    for i, T in enumerate(poses):
        img = synth.render(world, cam, T)
        sys_.track_monocular_with_pose(img, i * 0.1, T)
    frame = sys_.tracker.last_frame
    rgb = viz.draw_frame(img, frame, sys_.store,
                         path=str(tmp_path / "frame.png"))
    assert rgb.shape == (480, 640, 3)
    assert (tmp_path / "frame.png").exists()
    viz.draw_map(sys_.store, path=str(tmp_path / "map.png"))
    assert (tmp_path / "map.png").exists()
