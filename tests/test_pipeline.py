"""End-to-end tracking tests on the synthetic planar world."""
import numpy as np
import pytest

from orb_slam2_tpu.geom.camera import Intrinsics
from orb_slam2_tpu.ops.extractor import OrbParams
from orb_slam2_tpu.pipeline import SlamConfig, System, TrackState
from orb_slam2_tpu.utils import synth

cv2 = pytest.importorskip("cv2")

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0, width=640, height=480)


def make_config(pose_prior: bool) -> SlamConfig:
    return SlamConfig(
        cam=CAM,
        orb=OrbParams(n_features=800, n_levels=4),
        fps=10.0,
        pose_prior=pose_prior,
        init_min_matches=60,
        init_min_triangulated=40,
        init_min_tracked_after_ba=60,
    )


@pytest.fixture(scope="module")
def world():
    return synth.make_world(seed=3)


class TestPosePriorMode:
    def test_tracks_sequence(self, world):
        poses = synth.aerial_trajectory(30, speed=0.3)
        sys = System(make_config(pose_prior=True), enable_loop_closing=False)
        states = []
        for i, T in enumerate(poses):
            img = synth.render(world, CAM, T)
            sys.track_monocular_with_pose(img, i * 0.1, T)
            states.append(sys.state)
        assert states[2] == TrackState.OK or states[3] == TrackState.OK
        ok_frames = sum(s == TrackState.OK for s in states)
        assert ok_frames > 24, f"only {ok_frames} OK frames: {states}"
        # map quality: points lie on the plane z=0
        pts = sys.map_points()
        assert len(pts) > 200
        assert np.median(np.abs(pts[:, 2])) < 0.08, np.median(np.abs(pts[:, 2]))
        assert sys.store.n_valid_keyframes() >= 2

    def test_ply_export(self, world, tmp_path):
        poses = synth.aerial_trajectory(8, speed=0.3)
        sys = System(make_config(pose_prior=True), enable_loop_closing=False)
        for i, T in enumerate(poses):
            sys.track_monocular_with_pose(synth.render(world, CAM, T), i * 0.1, T)
        p = tmp_path / "map.ply"
        sys.save_map_ply(str(p))
        from orb_slam2_tpu.utils import ply
        pts = ply.read_ply_points(str(p))
        assert len(pts) == len(sys.map_points())


class TestEstimatedMode:
    def test_no_prior_full_upstream(self, world):
        """NO pose information at all: H/F-model RANSAC bootstrap +
        motion-model tracking, monocular up-to-scale ATE."""
        poses = synth.aerial_trajectory(30, speed=0.3)
        sys = System(make_config(pose_prior=False), enable_loop_closing=False)
        est, gt = [], []
        for i, T in enumerate(poses):
            img = synth.render(world, CAM, T)
            sys.track_monocular(img, i * 0.1)  # no hint
            if sys.state == TrackState.OK:
                est.append(sys.trajectory[-1][2])
                gt.append(T)
        assert len(est) > 20, f"tracked {len(est)}/30"
        est_c = np.stack([-P[:3, :3].T @ P[:3, 3] for P in est])
        gt_c = np.stack([-P[:3, :3].T @ P[:3, 3] for P in gt])
        ate = synth.ate_rmse(est_c, gt_c, align="sim3")
        assert ate < 0.10, f"ATE {ate:.4f}"

    def test_ate_small(self, world):
        poses = synth.aerial_trajectory(30, speed=0.3)
        sys = System(make_config(pose_prior=False), enable_loop_closing=False)
        est, gt = [], []
        for i, T in enumerate(poses):
            img = synth.render(world, CAM, T)
            # GT poses only for bootstrap (monocular gauge anchor)
            sys.track_monocular(img, i * 0.1, pose_hint=T)
            if sys.state == TrackState.OK:
                est.append(sys.trajectory[-1][2])
                gt.append(T)
        assert len(est) > 24, f"tracked {len(est)}/30"
        est_c = np.stack([-P[:3, :3].T @ P[:3, 3] for P in est])
        gt_c = np.stack([-P[:3, :3].T @ P[:3, 3] for P in gt])
        ate = synth.ate_rmse(est_c, gt_c, align="se3")
        # world units: camera flies at height 10, moves 0.3/frame
        assert ate < 0.10, f"ATE {ate:.4f}"


class TestFailureRecovery:
    def test_reset_when_lost_early(self, world):
        """Tracking lost with <= 5 keyframes wipes the map and restarts
        initialization (src/Tracking.cc:339-344)."""
        poses = synth.aerial_trajectory(8, speed=0.3)
        sys = System(make_config(pose_prior=True), enable_loop_closing=False)
        for i, T in enumerate(poses[:6]):
            sys.track_monocular_with_pose(synth.render(world, CAM, T),
                                          i * 0.1, T)
        assert sys.state == TrackState.OK
        assert sys.store.n_valid_keyframes() <= 5
        # feed garbage: tracking must fail and trigger a full reset
        rng = np.random.default_rng(0)
        noise = rng.uniform(0, 255, (480, 640)).astype(np.float32)
        sys.track_monocular_with_pose(noise, 9.0, poses[6])
        assert sys.state in (TrackState.NO_IMAGES_YET,
                             TrackState.NOT_INITIALIZED)
        assert sys.store.n_valid_keyframes() == 0
        # and it can re-initialize afterwards
        for i, T in enumerate(poses):
            sys.track_monocular_with_pose(synth.render(world, CAM, T),
                                          20.0 + i * 0.1, T)
        assert sys.state == TrackState.OK


class TestAsyncMapping:
    """async_mapping=True restores the reference's thread topology
    (src/System.cc:96-109): mapping runs on a worker thread and tracking
    never blocks on keyframe processing."""

    def test_async_matches_sync_quality(self, world):
        poses = synth.aerial_trajectory(30, speed=0.3)
        sys = System(make_config(pose_prior=True), enable_loop_closing=False,
                     async_mapping=True)
        states = []
        for i, T in enumerate(poses):
            img = synth.render(world, CAM, T)
            sys.track_monocular_with_pose(img, i * 0.1, T)
            states.append(sys.state)
        sys.flush_mapping()
        ok_frames = sum(s == TrackState.OK for s in states)
        assert ok_frames > 24, f"only {ok_frames} OK frames: {states}"
        pts = sys.map_points()
        assert len(pts) > 200
        assert np.median(np.abs(pts[:, 2])) < 0.08
        assert sys.store.n_valid_keyframes() >= 2
        sys.shutdown()
        assert sys.map_worker is None

    def test_async_worker_exception_propagates(self):
        from orb_slam2_tpu.pipeline.local_mapping import AsyncMapper

        class Boom:
            def process_keyframe(self, kid, queue_pressure=False):
                raise RuntimeError("mapper failed")

        w = AsyncMapper(Boom())
        w.process_keyframe(1)
        with pytest.raises(RuntimeError, match="mapper failed"):
            w.drain()
        w.stop()


class TestPipelinedTracking:
    """cfg.pipelined_tracking=True: frame t's fused step is consumed at
    frame t+1 (one-frame-lag pipeline).  Bindings/KF decisions must be
    the same as sequential mode, just committed a frame later."""

    def test_pipelined_matches_sequential_quality(self, world):
        poses = synth.aerial_trajectory(30, speed=0.3)
        cfg = make_config(pose_prior=True)
        cfg.pipelined_tracking = True
        sys = System(cfg, enable_loop_closing=False)
        states = []
        for i, T in enumerate(poses):
            img = synth.render(world, CAM, T)
            sys.track_monocular_with_pose(img, i * 0.1, T)
            states.append(sys.state)
        sys.flush_tracking()
        assert not sys.tracker._pending
        ok_frames = sum(s == TrackState.OK for s in states)
        assert ok_frames > 23, f"only {ok_frames} OK: {states}"
        pts = sys.map_points()
        assert len(pts) > 200
        assert np.median(np.abs(pts[:, 2])) < 0.08
        assert sys.store.n_valid_keyframes() >= 2

    def test_flush_then_resume(self, world):
        """Tracking must survive a mid-run flush_tracking (pipeline
        drain) and keep going: the bench measures windows separated by
        exactly this boundary.  Regression: the first dispatch after a
        drain took the chain path against a stale device recurrence and
        recorded a prep meta for a chain step — the NEXT consume then
        crashed (KeyError 'res') and misdecoded bindings."""
        poses = synth.aerial_trajectory(36, speed=0.3)
        cfg = make_config(pose_prior=True)
        cfg.pipelined_tracking = True
        cfg.pipeline_depth = 3
        sys = System(cfg, enable_loop_closing=False)
        states = []
        for i, T in enumerate(poses):
            img = synth.render(world, CAM, T)
            sys.track_monocular_with_pose(img, i * 0.1, T)
            states.append(sys.state)
            if i in (14, 24):  # two window boundaries mid-run
                sys.flush_tracking()
                assert not sys.tracker._pending
        sys.flush_tracking()
        ok_frames = sum(s == TrackState.OK for s in states)
        assert ok_frames > 28, f"only {ok_frames} OK: {states}"
        pts = sys.map_points()
        assert len(pts) > 200
        assert np.median(np.abs(pts[:, 2])) < 0.08

    def test_depth4_batched_consume_quality(self, world):
        """pipeline_depth=4: THREE steps' results per batched read (a
        third of a round trip per frame).  Frame-to-frame matching runs
        against frame t-3; the pose prior keeps projection windows
        valid, so the quality bars stay those of depth 2/3."""
        poses = synth.aerial_trajectory(30, speed=0.3)
        cfg = make_config(pose_prior=True)
        cfg.pipelined_tracking = True
        cfg.pipeline_depth = 4
        sys = System(cfg, enable_loop_closing=False)
        states = []
        for i, T in enumerate(poses):
            img = synth.render(world, CAM, T)
            sys.track_monocular_with_pose(img, i * 0.1, T)
            states.append(sys.state)
            if i == 17:  # window boundary mid-run at depth 4
                sys.flush_tracking()
                assert not sys.tracker._pending
        sys.flush_tracking()
        assert not sys.tracker._pending
        ok_frames = sum(s == TrackState.OK for s in states)
        assert ok_frames > 23, f"only {ok_frames} OK: {states}"
        pts = sys.map_points()
        assert len(pts) > 200
        assert np.median(np.abs(pts[:, 2])) < 0.08
        assert sys.store.n_valid_keyframes() >= 2

    def test_depth3_batched_consume_quality(self, world):
        """pipeline_depth=3: two steps' results are fetched in ONE
        batched device_get every other frame (half a round trip per
        frame through the tunnel).  Same quality bars as depth 2."""
        poses = synth.aerial_trajectory(30, speed=0.3)
        cfg = make_config(pose_prior=True)
        cfg.pipelined_tracking = True
        cfg.pipeline_depth = 3
        sys = System(cfg, enable_loop_closing=False)
        states = []
        for i, T in enumerate(poses):
            img = synth.render(world, CAM, T)
            sys.track_monocular_with_pose(img, i * 0.1, T)
            states.append(sys.state)
        sys.flush_tracking()
        assert not sys.tracker._pending
        ok_frames = sum(s == TrackState.OK for s in states)
        assert ok_frames > 23, f"only {ok_frames} OK: {states}"
        pts = sys.map_points()
        assert len(pts) > 200
        assert np.median(np.abs(pts[:, 2])) < 0.08
        assert sys.store.n_valid_keyframes() >= 2
