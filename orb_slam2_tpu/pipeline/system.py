"""System facade — replaces src/System.cc.

Wires Tracking + LocalMapping (+ LoopClosing when enabled) over one
MapStore and exposes the two tracking entry points:

- ``track_monocular_with_pose(image, timestamp, Tcw)`` — the reference
  fork's only public API (include/System.h:69-71).
- ``track_monocular(image, timestamp)`` — upstream ORB-SLAM2's
  estimated-pose tracking (restored capability).

Also provides map export (SaveMap / SaveTrackedMap PLY semantics,
src/System.cc:212-322) and reset/shutdown handshakes (trivial here —
no threads to join).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..models.frame import Frame, FrameFactory
from ..models.mapstore import MapStore
from .config import SlamConfig
from .local_mapping import LocalMapper
from .tracking import Tracker, TrackState


class System:
    def __init__(self, config: SlamConfig, enable_loop_closing: bool = True):
        self.cfg = config
        self.store = MapStore()
        self.store.set_scale_info(config.orb.scale_factor, config.orb.n_levels)
        self.factory = FrameFactory(config.cam, config.orb)
        self.tracker = Tracker(config, self.store, self.factory)
        self.mapper = LocalMapper(config, self.store)
        self.loop_closer = None
        if enable_loop_closing:
            try:
                from .loop_closing import LoopCloser
                self.loop_closer = LoopCloser(config, self.store)
                self.mapper.on_keyframe_processed = self.loop_closer.process_keyframe
            except ImportError:
                pass

        self.tracker.on_new_keyframe = self._on_new_keyframe
        self.tracker.on_reset = self.reset
        self.trajectory: List[tuple] = []  # (frame_id, timestamp, Tcw, state)
        # world -> real-world transform (System::SetRealTransform,
        # include/System.h:171-173)
        self.real_transform = np.eye(4, dtype=np.float32)

    # ------------------------------------------------------------------
    def _on_new_keyframe(self, kid: int):
        self.mapper.process_keyframe(kid)

    def track_monocular_with_pose(self, image, timestamp: float,
                                  Tcw: np.ndarray) -> Frame:
        """System::TrackMonocularWithPose (src/System.cc:237-258)."""
        frame = self.tracker.track(image, timestamp, pose_prior=np.asarray(Tcw, np.float32))
        self._record(frame)
        return frame

    def track_monocular(self, image, timestamp: float = 0.0,
                        pose_hint: Optional[np.ndarray] = None) -> Frame:
        """Upstream-style tracking.  ``pose_hint`` may supply poses for
        the two bootstrap frames (monocular scale/gauge anchor); it is
        ignored once the map is initialized."""
        hint = None
        if self.tracker.state in (TrackState.NO_IMAGES_YET,
                                  TrackState.NOT_INITIALIZED):
            hint = None if pose_hint is None else np.asarray(pose_hint, np.float32)
        frame = self.tracker.track(image, timestamp, pose_prior=hint)
        self._record(frame)
        return frame

    def _record(self, frame: Frame):
        self.trajectory.append(
            (frame.frame_id, frame.timestamp, frame.Tcw.copy(),
             self.tracker.state))

    # ------------------------------------------------------------------
    def reset(self):
        """System/Tracking::Reset (src/Tracking.cc:1009-1052)."""
        self.store = MapStore()
        self.store.set_scale_info(self.cfg.orb.scale_factor, self.cfg.orb.n_levels)
        self.tracker.store = self.store
        self.mapper.store = self.store
        self.mapper.recent_points = []
        if self.loop_closer is not None:
            self.loop_closer.store = self.store
            self.loop_closer.reset()
        self.tracker.state = TrackState.NO_IMAGES_YET
        self.tracker.init_frame = None
        self.tracker.last_frame = None
        self.tracker.ref_kf = -1
        self.tracker.velocity = None

    @property
    def state(self) -> TrackState:
        return self.tracker.state

    # ------------------------------------------------------------------
    def keyframe_trajectory(self):
        """(kid, Tcw) for valid keyframes."""
        return [(kf.kid, kf.Tcw.copy()) for kf in self.store.kfs if kf.valid]

    def camera_centers(self) -> np.ndarray:
        out = []
        for _, _, Tcw, state in self.trajectory:
            out.append(-Tcw[:3, :3].T @ Tcw[:3, 3])
        return np.asarray(out)

    def map_points(self) -> np.ndarray:
        pts = [p for p, v in zip(self.store.mp_pos, self.store.mp_valid) if v]
        return np.stack(pts) if pts else np.zeros((0, 3), np.float32)

    def save_map_ply(self, path: str):
        """SaveMap (src/System.cc:212-234): binary PLY of all valid map
        points, transformed by the real-world transform."""
        from ..utils import ply
        pts = self.map_points()
        T = self.real_transform
        pts = pts @ T[:3, :3].T + T[:3, 3]
        ply.write_ply_points(path, pts)
