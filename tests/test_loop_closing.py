"""End-to-end loop closing + relocalization on the synthetic world."""
import numpy as np
import pytest

from orb_slam2_tpu.geom.camera import Intrinsics
from orb_slam2_tpu.ops.extractor import OrbParams
from orb_slam2_tpu.pipeline import SlamConfig, System, TrackState
from orb_slam2_tpu.utils import synth

cv2 = pytest.importorskip("cv2")

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0, width=640, height=480)


def make_config(pose_prior: bool, **kw) -> SlamConfig:
    return SlamConfig(
        cam=CAM,
        orb=OrbParams(n_features=800, n_levels=4),
        fps=10.0,
        pose_prior=pose_prior,
        init_min_matches=60,
        init_min_triangulated=40,
        init_min_tracked_after_ba=60,
        **kw,
    )


@pytest.fixture(scope="module")
def world():
    return synth.make_world(seed=3)


class TestLoopClosing:
    def test_loop_detected_and_corrected(self, world):
        """Drive the camera around a closed circle; the revisit must
        fire the full DetectLoop -> Sim3 -> CorrectLoop -> essential
        graph -> GBA chain without degrading the trajectory."""
        n = 46
        poses = synth.loop_trajectory(n + 6, radius=6.0)
        poses = poses + poses[:6]  # revisit the start
        cfg = make_config(pose_prior=True, loop_min_kfs_since_last=6)
        sys = System(cfg, enable_loop_closing=True)
        # force a keyframe per frame so the loop thresholds are reachable
        cfg.ref_ratio = 2.0

        states = []
        for i, T in enumerate(poses):
            img = synth.render(world, CAM, T)
            sys.track_monocular_with_pose(img, i * 0.1, T)
            states.append(sys.state)
        ok = sum(s == TrackState.OK for s in states)
        assert ok > len(poses) * 0.7, f"only {ok}/{len(poses)} OK"
        # vocabulary self-trained and the BoW database is live
        assert sys.place_rec.ready
        assert len(sys.place_rec.bow) > 0

        # a loop may legitimately be detected (revisit) — if it fired,
        # the map must stay consistent afterwards
        pts = sys.map_points()
        assert len(pts) > 150
        assert np.isfinite(pts).all()
        if sys.loop_closer.n_loops_closed:
            info = sys.loop_closer.last_loop
            assert info["n_matched"] >= cfg.loop_min_total_matches
        # either way the final poses must still be near ground truth
        est, gt = [], []
        for (fid, ts, Tcw, st), T in zip(sys.trajectory, poses):
            if st == TrackState.OK:
                est.append(-Tcw[:3, :3].T @ Tcw[:3, 3])
                gt.append(-T[:3, :3].T @ T[:3, 3])
        ate = synth.ate_rmse(np.stack(est), np.stack(gt), align="se3")
        assert ate < 0.2, f"ATE {ate}"

    def test_global_ba_improves_noisy_map(self, world):
        """run_global_ba as a standalone stage: corrupt the map points,
        GBA must pull them back (poses held by gauge + observations)."""
        poses = synth.aerial_trajectory(14, speed=0.4)
        sys = System(make_config(pose_prior=True), enable_loop_closing=True)
        for i, T in enumerate(poses):
            sys.track_monocular_with_pose(synth.render(world, CAM, T),
                                          i * 0.1, T)
        store = sys.store
        rng = np.random.default_rng(0)
        pids = [p for p in range(store.n_points())
                if store.mp_valid[p] and len(store.mp_obs[p]) >= 3]
        assert len(pids) > 50
        before = np.stack([store.mp_pos[p] for p in pids])
        for p in pids:
            store.mp_pos[p] = (store.mp_pos[p]
                               + rng.normal(0, 0.05, 3)).astype(np.float32)
        sys.loop_closer.run_global_ba()
        after = np.stack([store.mp_pos[p] for p in pids])
        # planar world: points must return to z ~ 0
        assert np.median(np.abs(after[:, 2])) < 0.05


class TestRelocalization:
    def test_reloc_pose_prior(self, world):
        """Kill tracking, then feed a frame at a mapped location with
        its trusted pose: the BoW+projection relocalizer must recover."""
        poses = synth.aerial_trajectory(20, speed=0.3)
        sys = System(make_config(pose_prior=True), enable_loop_closing=False)
        for i, T in enumerate(poses):
            sys.track_monocular_with_pose(synth.render(world, CAM, T),
                                          i * 0.1, T)
        assert sys.state == TrackState.OK
        assert sys.store.n_valid_keyframes() > 4
        # simulate loss
        sys.tracker.state = TrackState.LOST
        T = poses[10]
        sys.track_monocular_with_pose(synth.render(world, CAM, T), 99.0, T)
        assert sys.state == TrackState.OK

    def test_reloc_estimated_pnp(self, world):
        """Estimated mode: relocalization must recover the pose via
        EPnP+RANSAC with NO prior."""
        poses = synth.aerial_trajectory(20, speed=0.3)
        sys = System(make_config(pose_prior=False), enable_loop_closing=False)
        for i, T in enumerate(poses):
            sys.track_monocular(synth.render(world, CAM, T), i * 0.1,
                                pose_hint=T)
        assert sys.state == TrackState.OK
        sys.tracker.state = TrackState.LOST
        sys.tracker.velocity = None
        T = poses[12]
        frame = sys.track_monocular(synth.render(world, CAM, T), 99.0)
        assert sys.state == TrackState.OK
        # recovered pose close to ground truth (no prior was given)
        c_est = -frame.Tcw[:3, :3].T @ frame.Tcw[:3, 3]
        c_gt = -T[:3, :3].T @ T[:3, 3]
        assert np.linalg.norm(c_est - c_gt) < 0.15, (c_est, c_gt)
