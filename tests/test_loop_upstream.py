"""End-to-end loop-closure proof for the UPSTREAM (estimated-pose)
mode — VERDICT r2 task 5 / SURVEY risk #8: the full no-prior chain

  H/F-RANSAC init -> motion-model tracking (pose LM per frame) ->
  naturally accumulated pose/scale drift -> DetectLoop -> Sim3 RANSAC
  with FREE scale -> OptimizeSim3 -> CorrectLoop -> 7-DoF essential
  graph (the monocular scale-drift countermeasure,
  src/Optimizer.cc:654-983) -> GBA

with no ground-truth pose ever fed to the tracker.  Drift is genuine:
sensor noise on the renders + per-frame pose estimation error
random-walks around the circuit (monocular scale is free, so the Sim3
at the loop has s != 1 in general).
"""
import numpy as np
import pytest

from orb_slam2_tpu.geom.camera import Intrinsics
from orb_slam2_tpu.ops.extractor import OrbParams
from orb_slam2_tpu.pipeline import SlamConfig, System, TrackState
from orb_slam2_tpu.utils import synth
from orb_slam2_tpu.utils.evaluate import ate_rmse

cv2 = pytest.importorskip("cv2")

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                 width=640, height=480)
N_LAP = 48
N_REVISIT = 14
NOISE = 4.0


def _circuit():
    true = synth.loop_trajectory(N_LAP, radius=6.0)
    return true + true[:N_REVISIT]


def _run(world, true, enable_loop):
    rng = np.random.default_rng(11)
    cfg = SlamConfig(
        cam=CAM, orb=OrbParams(n_features=800, n_levels=4), fps=10.0,
        pose_prior=False, init_min_matches=60, init_min_triangulated=40,
        init_min_tracked_after_ba=60, loop_min_kfs_since_last=6)
    sys_ = System(cfg, enable_loop_closing=enable_loop)
    for i, Tt in enumerate(true):
        img = synth.render(world, CAM, Tt)
        img = np.clip(img + rng.normal(0, NOISE, img.shape), 0, 255)
        sys_.track_monocular(img, i * 0.1)
    return sys_


def _kf_ate(sys_, true):
    est, gt = [], []
    for kf in sys_.store.kfs:
        if not kf.valid or kf.frame.frame_id >= len(true):
            continue
        est.append(-kf.Tcw[:3, :3].T @ kf.Tcw[:3, 3])
        T = true[kf.frame.frame_id]
        gt.append(-T[:3, :3].T @ T[:3, 3])
    return ate_rmse(np.stack(est), np.stack(gt), align="sim3")


@pytest.mark.slow
def test_upstream_loop_closes_and_repairs_drift():
    world = synth.make_world(seed=3)
    true = _circuit()

    sys_on = _run(world, true, enable_loop=True)
    ok = sum(1 for (_, _, _, s) in sys_on.trajectory
             if s == TrackState.OK)
    assert ok > 0.7 * len(true), f"tracked {ok}/{len(true)}"

    # the proof: the whole upstream chain fired (DetectLoop -> Sim3 with
    # free scale -> essential graph -> GBA)
    assert sys_on.loop_closer.n_loops_closed >= 1, \
        "upstream loop closure never fired on the noisy revisited circuit"
    info = sys_on.loop_closer.last_loop
    assert info["n_matched"] >= sys_on.cfg.loop_min_total_matches
    # monocular Sim3: the solved relative scale is a real free variable
    assert "scale" in info and np.isfinite(info["scale"]) \
        and info["scale"] > 0

    assert np.isfinite(sys_on.map_points()).all()
    for kf in sys_on.store.kfs:
        if kf.valid:
            assert np.isfinite(kf.Tcw).all()

    # corrected map beats the drifted (loop-off) one
    sys_off = _run(world, true, enable_loop=False)
    ate_on = _kf_ate(sys_on, true)
    ate_off = _kf_ate(sys_off, true)
    assert ate_on < ate_off, \
        f"loop-corrected KF ATE {ate_on:.3f} !< drifted {ate_off:.3f}"
