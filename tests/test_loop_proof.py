"""PROOF that the loop-closing chain fires end-to-end from images:
DetectLoop -> Sim3 RANSAC -> OptimizeSim3 -> CorrectLoop -> essential
graph -> GBA (src/LoopClosing.cc:77-98).  Unlike the smoke tests, these
assertions FAIL if _correct_loop never runs.

Construction: pose-prior mode around a closed circuit with INJECTED
ODOMETRY DRIFT (the deployment scenario the fork exists for: a drone's
VIO prior drifts; loop closure repairs the map).  The drift accumulates
to tens of pixels of reprojection error by the revisit, so the old
points cannot re-bind through the trusted-pose chi2 gate, the revisit
keyframes are NOT covisible with the first lap, and the BoW->Sim3
pipeline is the only way to close the circle — if it doesn't run, the
keyframe map stays drifted and the assertions below fail.
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

N_LAP = 40
N_REVISIT = 14
DRIFT_PER_FRAME = 0.02  # world units; ~0.9 px/frame, ~36 px by lap end


def _drifted_poses():
    """True circuit poses + linearly drifting 'odometry' priors."""
    true = synth.loop_trajectory(N_LAP, radius=6.0)
    true = true + true[:N_REVISIT]
    fed = []
    for t, Tcw in enumerate(true):
        D = np.eye(4, dtype=np.float32)
        D[:3, 3] = [DRIFT_PER_FRAME * t, 0.5 * DRIFT_PER_FRAME * t, 0.0]
        # world' = D @ world  =>  Tcw' = Tcw @ D^-1
        fed.append((Tcw @ np.linalg.inv(D)).astype(np.float32))
    return true, fed


def _run(world, true, fed, enable_loop, render=synth.render, vocab=None):
    cfg = SlamConfig(
        cam=CAM, orb=OrbParams(n_features=800, n_levels=4), fps=10.0,
        pose_prior=True, init_min_matches=60, init_min_triangulated=40,
        init_min_tracked_after_ba=60, loop_min_kfs_since_last=6)
    sys_ = System(cfg, enable_loop_closing=enable_loop, vocab=vocab)
    for i, (Tt, Tf) in enumerate(zip(true, fed)):
        img = render(world, CAM, Tt)  # the WORLD is consistent
        sys_.track_monocular_with_pose(img, i * 0.1, Tf)
    return sys_


def _kf_ate(sys_, true):
    est, gt = [], []
    for kf in sys_.store.kfs:
        if not kf.valid:
            continue
        fid = kf.frame.frame_id
        if fid >= len(true):
            continue
        est.append(-kf.Tcw[:3, :3].T @ kf.Tcw[:3, 3])
        T = true[fid]
        gt.append(-T[:3, :3].T @ T[:3, 3])
    return ate_rmse(np.stack(est), np.stack(gt), align="sim3")


@pytest.mark.slow
def test_loop_closure_fires_and_repairs_drift():
    world = synth.make_world(seed=3)
    true, fed = _drifted_poses()

    sys_on = _run(world, true, fed, enable_loop=True)
    ok = sum(1 for (_, _, _, s) in sys_on.trajectory
             if s == TrackState.OK)
    assert ok > 0.7 * len(true), f"tracked {ok}/{len(true)}"

    # THE proof: the full correction chain executed at least once
    assert sys_on.loop_closer.n_loops_closed >= 1, \
        "loop closure never fired on a drifted revisited circuit"
    info = sys_on.loop_closer.last_loop
    assert info["n_matched"] >= sys_on.cfg.loop_min_total_matches

    # map and poses stay finite after essential graph + GBA
    assert np.isfinite(sys_on.map_points()).all()
    for kf in sys_on.store.kfs:
        if kf.valid:
            assert np.isfinite(kf.Tcw).all()

    # and the corrected keyframe map must beat the drifted one
    sys_off = _run(world, true, fed, enable_loop=False)
    assert sys_off.loop_closer is None
    ate_on = _kf_ate(sys_on, true)
    ate_off = _kf_ate(sys_off, true)
    assert ate_on < ate_off, \
        f"loop-corrected KF ATE {ate_on:.3f} !< drifted {ate_off:.3f}"


@pytest.mark.slow
def test_loop_closure_fires_on_nonplanar_world():
    """Same drifted-circuit proof on a NON-planar world (height-field
    ground, utils/synth.py HeightWorld): triangulation, scale gates,
    and BA face real parallax instead of a degenerate plane."""
    world = synth.make_height_world(seed=3, height_amp=1.5)
    true, fed = _drifted_poses()

    sys_on = _run(world, true, fed, enable_loop=True,
                  render=synth.render_height)
    ok = sum(1 for (_, _, _, s) in sys_on.trajectory
             if s == TrackState.OK)
    assert ok > 0.7 * len(true), f"tracked {ok}/{len(true)}"
    assert sys_on.loop_closer.n_loops_closed >= 1, \
        "loop closure never fired on the non-planar drifted circuit"
    assert np.isfinite(sys_on.map_points()).all()

    # the map itself must be genuinely 3D: triangulated points spread
    # in z beyond the planar world's epsilon
    pts = sys_on.map_points()
    assert np.std(pts[:, 2]) > 0.2, "map collapsed to a plane"

