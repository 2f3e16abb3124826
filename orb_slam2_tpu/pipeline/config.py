"""Pipeline configuration.

Groups the reference's YAML settings (src/Tracking.cc:93-191) and the
hard-coded thresholds scattered through Tracking/LocalMapping into one
place, with the reference values as defaults.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from ..geom.camera import Intrinsics
from ..ops.extractor import OrbParams


@dataclass
class SlamConfig:
    cam: Intrinsics
    orb: OrbParams = field(default_factory=OrbParams)
    fps: float = 10.0

    # --- mode ---
    # pose_prior=True reproduces the reference fork: every frame arrives
    # with a trusted pose (TrackMonocularWithPose) and per-frame pose
    # optimization is skipped (src/Tracking.cc:240, 637).
    pose_prior: bool = False

    # --- initialization (src/Tracking.cc:392-573) ---
    init_min_keypoints: int = 100
    init_match_window: float = 100.0
    init_min_matches: int = 100
    init_min_triangulated: int = 50     # src/Initializer.cc:147-150
    init_min_tracked_after_ba: int = 100  # src/Tracking.cc:539-544

    # --- tracking gates ---
    track_prior_min_matches: int = 20   # TrackWithInitialPose (src/Tracking.cc:1060-1072)
    track_prior_min_good: int = 10
    track_refkf_min_matches: int = 15   # TrackWithReferenceKF (src/Tracking.cc:1080-1096)
    track_refkf_min_good: int = 10
    track_local_min_inliers: int = 30   # TrackLocalMap (src/Tracking.cc:641-666)
    track_local_min_inliers_reloc: int = 50
    chi2_mono: float = 5.991
    max_local_keyframes: int = 80       # src/Tracking.cc:962

    # --- keyframe decision (src/Tracking.cc:681-750) ---
    min_frames_between_kf: int = 0
    ref_ratio: float = 0.9

    # --- local mapping ---
    triangulation_neighbors: int = 20   # src/LocalMapping.cc:260
    min_baseline_depth_ratio: float = 0.01  # src/LocalMapping.cc:303-318
    mp_cull_min_ratio: float = 0.25     # src/LocalMapping.cc:206-248
    kf_cull_redundancy: float = 0.9     # src/LocalMapping.cc:688-772
    local_ba_iters: int = 10

    # --- loop closing ---
    loop_min_kfs_since_last: int = 10   # src/LoopClosing.cc:139
    loop_consistency_threshold: int = 3  # src/LoopClosing.cc:60-61
    loop_sim3_min_inliers: int = 20     # src/LoopClosing.cc:380-402
    loop_min_total_matches: int = 40    # src/LoopClosing.cc:418-460
    # Fix the loop transform's scale to 1 (6-DoF solve).  None = auto:
    # fix in pose-prior mode.  Rationale: upstream ORB-SLAM2 sets
    # bFixScale=true whenever the sensor provides metric scale
    # (stereo/RGB-D; Sim3Solver.cc:41-46, Optimizer.cc:1014); the fork
    # passes false everywhere because its code path is monocular
    # (src/LoopClosing.cc:320,387,659) — but its trusted per-frame
    # odometry prior IS metric, so a free scale only adds an
    # unobservable DoF: on low-parallax scenes the reprojection
    # constraints barely pin scale and a 10-15% scale error in the
    # solved Sim3 warps the whole essential-graph correction (measured:
    # corrected-map ATE 0.22 -> 0.78 from one such loop).
    loop_fix_scale: bool | None = None

    # --- relocalization ---
    reloc_recent_kf_window: int = 10    # Map::GetLastKeyFrames period

    # --- static-shape floors (XLA recompile control) ---
    # Padded-array sizes only ever GROW through power-of-4 buckets;
    # every bucket crossing is a fresh XLA compile (~2 s on-device,
    # minutes through a remote-compile relay).  Production deployments
    # should set these floors to the steady-state sizes so the shapes
    # are static from frame 0 (padded FLOPs are nearly free on TPU —
    # a recompile never is).  Defaults stay small for CPU tests.
    pad_min_bound: int = 256    # tracked bound points (fused step L)
    pad_min_cand: int = 256     # local-map candidates (fused step C)
    pad_min_obs: int = 256      # BA observation rows
    pad_min_pts: int = 256      # BA point rows
    # device point-store capacity (TOTAL rows ever allocated, culled
    # included — rows are append-only).  Crossing it mid-run recompiles
    # every point-consuming kernel; size to the run's allocation
    device_point_capacity: int = 65536

    # --- one-frame-lag pipelined tracking (pose-prior mode) ---
    # When True, the fused tracking step for frame t is dispatched and
    # its RESULTS are consumed at the start of frame t+1 (the transfer
    # runs in the background via copy_to_host_async), so the host's
    # round-trip wait disappears from the frame period.  Bindings and
    # keyframe decisions are identical to the sequential mode, just
    # committed one frame later; the reported state lags one frame.
    # Throughput mode for camera-rate deployments; default off
    # (deterministic same-frame semantics for tests/tools).
    pipelined_tracking: bool = False
    # max fused steps in flight before the oldest MUST be consumed.
    # 2 = classic one/two-frame lag; with the device recurrence the
    # host consume is pure bookkeeping, so deeper pipelines only delay
    # keyframe decisions (lag x frame period), not tracking itself
    pipeline_depth: int = 2

    @property
    def max_frames_between_kf(self) -> int:
        return int(self.fps)  # mMaxFrames = fps (src/Tracking.cc:128-134)
