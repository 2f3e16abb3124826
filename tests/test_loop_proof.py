"""PROOF that the loop-closing chain fires end-to-end from images:
DetectLoop -> Sim3 RANSAC -> OptimizeSim3 -> CorrectLoop -> essential
graph -> GBA (src/LoopClosing.cc:77-98).  Unlike the smoke tests, these
assertions FAIL if _correct_loop never runs.

Estimated-pose mode around a closed circuit accumulates real drift, so
the revisit is not absorbed by covisibility (the trusted-pose mode
re-binds old points instantly, making every revisit covisible and thus
exempt from loop detection — same as the reference's semantics).
"""
import numpy as np
import pytest

from orb_slam2_tpu.geom.camera import Intrinsics
from orb_slam2_tpu.ops.extractor import OrbParams
from orb_slam2_tpu.pipeline import SlamConfig, System, TrackState
from orb_slam2_tpu.utils import synth
from orb_slam2_tpu.utils.evaluate import ate_rmse

cv2 = pytest.importorskip("cv2")

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0, width=640, height=480)


def _run(world, poses, enable_loop, drift_rate=0.0):
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
def test_loop_closure_fires_and_reduces_drift():
    world = synth.make_world(seed=3)
    n = 40
    poses = synth.loop_trajectory(n, radius=6.0)
    poses = poses + poses[:10]  # revisit the start

    sys_on, est_on, gt_on = _run(world, poses, enable_loop=True)
    assert len(est_on) > 0.7 * len(poses), f"tracked {len(est_on)}"

    # THE proof: the full correction chain executed at least once
    assert sys_on.loop_closer.n_loops_closed >= 1, \
        "loop closure never fired on a closed revisited circuit"
    info = sys_on.loop_closer.last_loop
    assert info["n_matched"] >= sys_on.cfg.loop_min_total_matches

    # map and poses stay finite after essential graph + GBA
    assert np.isfinite(sys_on.map_points()).all()
    for kf in sys_on.store.kfs:
        if kf.valid:
            assert np.isfinite(kf.Tcw).all()

    # and the correction must not hurt: ATE with the loop closed stays
    # at least as good as the drifting run without loop closing
    sys_off, est_off, gt_off = _run(world, poses, enable_loop=False)
    ate_on = ate_rmse(est_on, gt_on, align="sim3")
    ate_off = ate_rmse(est_off, gt_off, align="sim3")
    assert ate_on <= ate_off * 1.10, \
        f"loop-enabled ATE {ate_on:.3f} vs disabled {ate_off:.3f}"
    assert ate_on < 0.30, f"ATE {ate_on:.3f}"
