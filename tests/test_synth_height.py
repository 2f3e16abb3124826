"""Non-planar synthetic world (utils/synth.py HeightWorld): the
renderer must produce geometrically consistent views of a 3D surface —
projecting a surface point (X, Y, h(X, Y)) into two different cameras
must sample the same texture appearance — and must differ from the
planar render (i.e. real parallax exists for triangulation/BA to
exercise; VERDICT r2 task 6).
"""
import numpy as np
import pytest

from orb_slam2_tpu.geom.camera import Intrinsics
from orb_slam2_tpu.utils import synth

cv2 = pytest.importorskip("cv2")

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                 width=640, height=480)


def _project(T, K, pts):
    pc = pts @ T[:3, :3].T + T[:3, 3]
    uv = pc[:, :2] / pc[:, 2:3]
    return uv * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]], pc[:, 2]


def test_height_world_multiview_consistency():
    world = synth.make_height_world(seed=5, tex_size=1024, scale=40.0,
                                    height_amp=1.5)
    assert np.abs(world.heights).max() > 1.0  # real 3D relief
    poses = synth.aerial_trajectory(8, height=10.0, speed=0.8, seed=2)
    T1, T2 = poses[0], poses[6]

    img1 = synth.render_height(world, CAM, T1)
    img2 = synth.render_height(world, CAM, T2)

    # surface points visible in both views
    rng = np.random.default_rng(0)
    X = rng.uniform(1.5, 4.0, 400)
    Y = rng.uniform(-2.0, 2.0, 400)
    Z = world.height_at(X, Y)
    pts = np.stack([X, Y, Z], 1)
    K = np.asarray(CAM.K)
    uv1, z1 = _project(T1, K, pts)
    uv2, z2 = _project(T2, K, pts)
    m = ((z1 > 0) & (z2 > 0)
         & (uv1 > 8).all(1) & (uv2 > 8).all(1)
         & (uv1[:, 0] < CAM.width - 8) & (uv2[:, 0] < CAM.width - 8)
         & (uv1[:, 1] < CAM.height - 8) & (uv2[:, 1] < CAM.height - 8))
    assert m.sum() > 150

    def sample(img, uv):
        return cv2.remap(img.astype(np.float32),
                         uv[:, 0].astype(np.float32)[None],
                         uv[:, 1].astype(np.float32)[None],
                         interpolation=cv2.INTER_LINEAR)[0]

    s1 = sample(img1, uv1[m])
    s2 = sample(img2, uv2[m])
    # both views observe the same surface appearance at the 3D point
    err = np.abs(s1 - s2)
    assert np.median(err) < 6.0, f"median photometric err {np.median(err)}"

    # parallax is real: a planar (z=0) projection of the same texture
    # coordinates must NOT match view 2 as well as the true surface does
    pts_flat = np.stack([X, Y, np.zeros_like(X)], 1)
    uvf2, _ = _project(T2, K, pts_flat)
    sf2 = sample(img2, uvf2[m])
    err_flat = np.abs(s1 - sf2)
    assert np.median(err_flat) > 2.0 * np.median(err), \
        "height field produced no measurable parallax"


def test_height_world_trajectory_renders():
    world = synth.make_height_world(seed=1, tex_size=768, scale=30.0,
                                    height_amp=1.2)
    for T in synth.loop_trajectory(4, radius=5.0, height=9.0):
        img = synth.render_height(world, CAM, T)
        assert img.shape == (CAM.height, CAM.width)
        assert np.isfinite(img).all()
        assert img.std() > 10  # textured, not degenerate
