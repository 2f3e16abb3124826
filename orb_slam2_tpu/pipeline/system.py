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
    def __init__(self, config: SlamConfig, enable_loop_closing: bool = True,
                 vocab=None, async_mapping: bool = False):
        """``async_mapping=True`` restores the reference's thread
        topology (src/System.cc:96-109): local mapping + loop closing
        run on a background thread fed by a keyframe queue, so tracking
        never stalls on a keyframe frame.  The default is the
        deterministic sequential pipeline (bit-reproducible, used by the
        test suite)."""
        self.cfg = config
        self.store = MapStore(dev_capacity=config.device_point_capacity)
        self.store.set_scale_info(config.orb.scale_factor, config.orb.n_levels)
        self.factory = FrameFactory(config.cam, config.orb)
        self.tracker = Tracker(config, self.store, self.factory)
        self.mapper = LocalMapper(config, self.store)
        self.map_worker = None
        if async_mapping:
            from .local_mapping import AsyncMapper
            self.map_worker = AsyncMapper(self.mapper)
            self.tracker.mapping_idle = self.map_worker.idle

        # place recognition (vocabulary + BoW database) backs both loop
        # closing and relocalization (src/System.cc:65-83)
        from .place_recognition import PlaceRecognition
        from .relocalization import Relocalizer
        self.place_rec = PlaceRecognition(self.store, vocab=vocab)
        self.store.on_kf_erased = self.place_rec.erase_keyframe
        self.relocalizer = Relocalizer(config, self.store, self.place_rec)
        self.tracker.relocalize = self.relocalizer

        self.loop_closer = None
        if enable_loop_closing:
            from .loop_closing import LoopCloser
            self.loop_closer = LoopCloser(config, self.store,
                                          place_rec=self.place_rec)
            self.mapper.on_keyframe_processed = self.loop_closer.process_keyframe
        else:
            # still feed the BoW database so relocalization works
            self.mapper.on_keyframe_processed = self.place_rec.add_keyframe

        self.tracker.on_new_keyframe = self._on_new_keyframe
        self.tracker.on_reset = self.reset
        self.trajectory: List[tuple] = []  # (frame_id, timestamp, Tcw, state)
        # world -> real-world transform (System::SetRealTransform,
        # include/System.h:171-173)
        self.real_transform = np.eye(4, dtype=np.float32)

    # ------------------------------------------------------------------
    def _on_new_keyframe(self, kid: int):
        if self.map_worker is not None:
            self.map_worker.process_keyframe(kid)  # enqueue, don't stall
        else:
            self.mapper.process_keyframe(kid)

    def flush_tracking(self):
        """Finalize any in-flight pipelined frame (no-op unless
        cfg.pipelined_tracking)."""
        self.tracker.flush()

    def flush_mapping(self):
        """Block until all queued keyframes are mapped (no-op in the
        sequential pipeline)."""
        if self.map_worker is not None:
            self.map_worker.drain()

    def prefetch(self, image) -> None:
        """Dispatch ORB extraction for the NEXT frame asynchronously;
        the following track_* call consumes it.  Overlaps device
        extraction with host-side map bookkeeping of the current frame
        (a capability the reference gets from its tracking/mapping
        threads; here it is explicit and deterministic)."""
        init_mode = self.tracker.state in (TrackState.NO_IMAGES_YET,
                                           TrackState.NOT_INITIALIZED)
        self._prefetched = (self.tracker.factory.start(
            image, init_mode=init_mode))

    def _take_prefetch(self):
        p = getattr(self, "_prefetched", None)
        self._prefetched = None
        return p

    def track_monocular_with_pose(self, image, timestamp: float,
                                  Tcw: np.ndarray,
                                  next_image=None) -> Frame:
        """System::TrackMonocularWithPose (src/System.cc:237-258).

        ``next_image``: optional look-ahead frame; its ORB extraction is
        dispatched after this frame's tracking work is queued but before
        its results are read, so the device computes the next extraction
        while this frame's results return over the tunnel (the
        throughput role of the reference's tracking thread)."""
        # kept as-is (may live on device); materialized lazily only by
        # the PLY color export
        self._last_image = image
        hook = None
        if next_image is not None:
            hook = lambda: self.prefetch(next_image)  # noqa: E731
        frame = self.tracker.track(image, timestamp,
                                   pose_prior=np.asarray(Tcw, np.float32),
                                   started=self._take_prefetch(),
                                   pre_read_hook=hook)
        self._record(frame)
        return frame

    def track_monocular(self, image, timestamp: float = 0.0,
                        pose_hint: Optional[np.ndarray] = None) -> Frame:
        """Upstream-style tracking.  ``pose_hint`` may supply poses for
        the two bootstrap frames (monocular scale/gauge anchor); it is
        ignored once the map is initialized."""
        self._last_image = np.asarray(image)
        hint = None
        if self.tracker.state in (TrackState.NO_IMAGES_YET,
                                  TrackState.NOT_INITIALIZED):
            hint = None if pose_hint is None else np.asarray(pose_hint, np.float32)
        frame = self.tracker.track(image, timestamp, pose_prior=hint,
                                   started=self._take_prefetch())
        self._record(frame)
        return frame

    def _record(self, frame: Frame):
        self.trajectory.append(
            (frame.frame_id, frame.timestamp, frame.Tcw.copy(),
             self.tracker.state))
        # live observability hook (utils/viewer.LiveViewer.attach) — the
        # reference's Viewer thread reads equivalent per-frame state
        # (FrameDrawer::Update, src/FrameDrawer.cc:51-90)
        cb = getattr(self, "on_frame_tracked", None)
        if cb is not None:
            cb(self._last_image, frame)

    # ------------------------------------------------------------------
    def reset(self):
        """System/Tracking::Reset (src/Tracking.cc:1009-1052)."""
        self.tracker._pending = []  # drop any in-flight pipelined frames
        self.tracker._chain = None
        self.flush_mapping()  # reference's blocking reset handshake
        self.store = MapStore(dev_capacity=self.cfg.device_point_capacity)
        self.store.set_scale_info(self.cfg.orb.scale_factor, self.cfg.orb.n_levels)
        self.tracker.store = self.store
        self.mapper.store = self.store
        self.mapper.recent_points = []
        from .place_recognition import PlaceRecognition
        self.place_rec = PlaceRecognition(self.store,
                                          vocab=self.place_rec.vocab)
        self.store.on_kf_erased = self.place_rec.erase_keyframe
        self.relocalizer.store = self.store
        self.relocalizer.pr = self.place_rec
        if self.loop_closer is not None:
            self.loop_closer.store = self.store
            self.loop_closer.pr = self.place_rec
            self.loop_closer.last_loop_kf_id = 0
            self.loop_closer.consistent_groups = []
        else:
            self.mapper.on_keyframe_processed = self.place_rec.add_keyframe
        self.tracker.state = TrackState.NO_IMAGES_YET
        self.tracker.init_frame = None
        self.tracker.last_frame = None
        self.tracker.ref_kf = -1
        self.tracker.velocity = None
        self.tracker._prep = None

    @property
    def state(self) -> TrackState:
        return self.tracker.state

    def shutdown(self):
        """System::Shutdown (src/System.cc:173-192).  The reference
        joins its LocalMapping/LoopClosing/Viewer threads; the async
        pipeline joins the mapping worker, and either way it blocks
        until any queued device work drains."""
        self.tracker.flush()  # finalize any in-flight pipelined frame
        if self.map_worker is not None:
            self.map_worker.drain()
            self.map_worker.stop()
            self.map_worker = None
        import jax
        jax.effects_barrier()

    def timing_report(self) -> str:
        """Per-stage wall-clock summary (tracking + mapping timers)."""
        out = []
        for name, timer in (("tracker", self.tracker.timer),
                            ("mapper", self.mapper.timer)):
            s = timer.summary()
            if s:
                out.append(f"[{name}]\n{s}")
        return "\n".join(out)

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

    # ------------------------------------------------------------------
    def tracked_points(self):
        """GetTrackedMapPoints/GetTrackedKeyPointsUn (include/System.h:
        95-101): (pids, feature_idx) of the last frame's live bindings."""
        frame = self.tracker.last_frame
        if frame is None:
            return np.zeros(0, np.int32), np.zeros(0, np.int32)
        feat = np.array(
            [i for i, p in enumerate(frame.mp_ids)
             if p >= 0 and not frame.mp_outlier[i]
             and self.store.mp_valid[p]], np.int32)
        pids = np.array([frame.mp_ids[i] for i in feat], np.int32)
        return pids, feat

    def save_tracked_map_ply(self, path: str) -> bool:
        """SaveTrackedMap (src/System.cc:260-322): the last frame's
        tracked map points in CAMERA space with per-vertex RGB (sampled
        from the input image), pixel coords and octave, plus a `frame`
        element carrying the id, Tcw * realTransform^-1, and K."""
        frame = self.tracker.last_frame
        pids, feat = self.tracked_points()
        if frame is None or len(pids) == 0:
            return False
        pos_w = np.asarray(self.store.mp_pos[pids.astype(np.int64)])
        Tin = frame.Tcw
        pts_cam = pos_w @ Tin[:3, :3].T + Tin[:3, 3]
        uv = frame.xy_raw[feat]
        img = getattr(self, "_last_image", None)
        if img is not None:
            img = np.asarray(img)  # materialize device-resident frames
        if img is None:
            colors = np.full((len(feat), 3), 255, np.uint8)
        else:
            yy = np.clip(uv[:, 1].astype(int), 0, img.shape[0] - 1)
            xx = np.clip(uv[:, 0].astype(int), 0, img.shape[1] - 1)
            if img.ndim == 2:
                g = img[yy, xx].astype(np.uint8)
                colors = np.stack([g, g, g], -1)
            else:
                colors = img[yy, xx, :3].astype(np.uint8)
        Tcw_out = frame.Tcw @ np.linalg.inv(self.real_transform)
        from ..utils import ply
        ply.write_tracked_frame(
            path, frame.frame_id, Tcw_out, np.asarray(self.cfg.cam.K),
            pts_cam, colors, uv, frame.octave[feat])
        return True

    def set_real_transform(self, T: np.ndarray):
        """System::SetRealTransform (include/System.h:171-173)."""
        self.real_transform = np.asarray(T, np.float32)

    # ------------------------------------------------------------------
    # checkpoint / resume (capability the reference lacks: LoadMap is
    # commented out at include/System.h:92)
    # ------------------------------------------------------------------
    def save_map(self, path: str):
        """Serialize the full map (points, keyframes, graphs) to npz."""
        from ..models.serialize import save_map
        save_map(self.store, path)

    def load_map(self, path: str):
        """Load a serialized map and resume in LOST state — the next
        frame relocalizes against it."""
        from ..models.serialize import load_map
        from .place_recognition import PlaceRecognition
        self.flush_mapping()
        self.store = load_map(path)
        self.store.set_scale_info(self.cfg.orb.scale_factor,
                                  self.cfg.orb.n_levels)
        self.tracker.store = self.store
        self.mapper.store = self.store
        self.mapper.recent_points = []
        self.place_rec = PlaceRecognition(self.store,
                                          vocab=self.place_rec.vocab)
        self.store.on_kf_erased = self.place_rec.erase_keyframe
        for kid in self.store.valid_kf_ids():
            self.place_rec.add_keyframe(kid)
        self.relocalizer.store = self.store
        self.relocalizer.pr = self.place_rec
        if self.loop_closer is not None:
            self.loop_closer.store = self.store
            self.loop_closer.pr = self.place_rec
        self.tracker.state = TrackState.LOST
        self.tracker.last_frame = None
        self.tracker.velocity = None
        self.tracker._prep = None
        valid = self.store.valid_kf_ids()
        self.tracker.ref_kf = valid[-1] if valid else -1

    # ------------------------------------------------------------------
    # localization-only mode (upstream ActivateLocalizationMode; removed
    # by the fork, restored here)
    # ------------------------------------------------------------------
    def activate_localization_mode(self):
        """Track against the existing map without extending it."""
        self.tracker.mapping_enabled = False

    def deactivate_localization_mode(self):
        self.tracker.mapping_enabled = True
