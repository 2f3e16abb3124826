"""Map checkpoint/resume + localization-only mode."""
import numpy as np
import pytest

from orb_slam2_tpu.geom.camera import Intrinsics
from orb_slam2_tpu.models.serialize import load_map, save_map
from orb_slam2_tpu.ops.extractor import OrbParams
from orb_slam2_tpu.pipeline import SlamConfig, System, TrackState
from orb_slam2_tpu.utils import synth

cv2 = pytest.importorskip("cv2")

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0, width=640, height=480)


def make_config() -> SlamConfig:
    return SlamConfig(
        cam=CAM, orb=OrbParams(n_features=800, n_levels=4), fps=10.0,
        pose_prior=True, init_min_matches=60, init_min_triangulated=40,
        init_min_tracked_after_ba=60)


@pytest.fixture(scope="module")
def world():
    return synth.make_world(seed=3)


@pytest.fixture(scope="module")
def built_system(world):
    poses = synth.aerial_trajectory(16, speed=0.3)
    sys_ = System(make_config(), enable_loop_closing=False)
    for i, T in enumerate(poses):
        sys_.track_monocular_with_pose(synth.render(world, CAM, T),
                                       i * 0.1, T)
    assert sys_.state == TrackState.OK
    return sys_, poses


def test_roundtrip_preserves_map(built_system, tmp_path):
    sys_, _ = built_system
    p = tmp_path / "map.npz"
    save_map(sys_.store, str(p))
    store2 = load_map(str(p))
    s1 = sys_.store
    assert store2.n_points() == s1.n_points()
    assert store2.n_keyframes() == s1.n_keyframes()
    assert store2.n_valid_points() == s1.n_valid_points()
    for pid in range(0, s1.n_points(), 17):
        np.testing.assert_allclose(store2.mp_pos[pid], s1.mp_pos[pid])
        assert store2.mp_obs[pid] == s1.mp_obs[pid]
    for kid in range(s1.n_keyframes()):
        np.testing.assert_allclose(store2.kfs[kid].Tcw, s1.kfs[kid].Tcw)
        assert store2.kfs[kid].parent == s1.kfs[kid].parent
        assert store2.covis[kid] == s1.covis[kid]
        np.testing.assert_array_equal(store2.kfs[kid].frame.mp_ids,
                                      s1.kfs[kid].frame.mp_ids)
    # scene statistics identical
    assert abs(store2.scene_median_depth(0) - s1.scene_median_depth(0)) < 1e-6


def test_resume_and_relocalize(built_system, world, tmp_path):
    sys_, poses = built_system
    p = tmp_path / "map.npz"
    sys_.save_map(str(p))

    fresh = System(make_config(), enable_loop_closing=False)
    fresh.load_map(str(p))
    assert fresh.state == TrackState.LOST
    assert fresh.store.n_valid_keyframes() == sys_.store.n_valid_keyframes()
    # one frame at a mapped location relocalizes
    T = poses[8]
    fresh.track_monocular_with_pose(synth.render(world, CAM, T), 50.0, T)
    assert fresh.state == TrackState.OK


def test_localization_only_mode(built_system, world, tmp_path):
    sys_, poses = built_system
    p = tmp_path / "map.npz"
    sys_.save_map(str(p))
    fresh = System(make_config(), enable_loop_closing=False)
    fresh.load_map(str(p))
    fresh.activate_localization_mode()
    n_kf = fresh.store.n_valid_keyframes()
    n_mp = fresh.store.n_points()
    for i, T in enumerate(poses[6:14]):
        fresh.track_monocular_with_pose(synth.render(world, CAM, T),
                                        100.0 + i, T)
    # map untouched: no new keyframes or points
    assert fresh.store.n_valid_keyframes() == n_kf
    assert fresh.store.n_points() == n_mp
    assert fresh.state == TrackState.OK
