"""The tracking front end.

Replaces src/Tracking.cc (1.3k LoC).  Both tracking modes ship:

- ``pose_prior=True``  — the reference fork's TrackMonocularWithPose
  path: every frame carries a trusted pose, matches are gated by
  reprojection chi2 against that pose (CheckMatchesByProjection,
  src/Tracking.cc:1108-1142), and no pose is ever optimized per-frame.
- ``pose_prior=False`` — upstream ORB-SLAM2 semantics: constant-
  velocity motion model + motion-only LM pose optimization
  (the capability the fork deleted; restored per BASELINE.json).

Heavy per-frame compute (projection searches, pose LM) is jitted with
padded shapes; map bookkeeping is host-side via MapStore.
"""
from __future__ import annotations

import enum
import functools
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..matching import search, frustum
from ..models.frame import Frame, FrameFactory
from ..models.mapstore import MapStore
from ..optim import pose_opt
from ..geom import triangulate
from .config import SlamConfig
from ..utils.logging import get_logger, StageTimer

log = get_logger("tracking")


class TrackState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


def pad_bucket(n: int, minimum: int = 256) -> int:
    """Round up to a power-of-4 bucket to bound jit recompiles.

    Growth factor 4 (not 2) keeps the number of DISTINCT compiled shapes
    per stage tiny — on TPU the padded flops are cheap while each extra
    XLA compile costs seconds-to-minutes, especially through a remote
    compile relay."""
    m = minimum
    while m < n:
        m *= 4
    return m


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy"))
def _project_points(Tcw, pos, fx, fy, cx, cy):
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    pc = pos @ R.T + t
    z = pc[:, 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    uv = jnp.stack([fx * pc[:, 0] * inv_z + cx, fy * pc[:, 1] * inv_z + cy], -1)
    return uv, z


@functools.partial(jax.jit, static_argnames=(
    "fx", "fy", "cx", "cy", "bounds", "th", "chi2"))
def _match_last_fused(Tcw, pos, mp_valid, row_ids,
                      last_octave, last_desc, last_angle,
                      kp_xy, kp_octave, kp_desc, kp_valid, kp_angle,
                      scale_factors, inv_sigma2, fx, fy, cx, cy, bounds,
                      th, chi2: float = 0.0):
    """Projection + in-image gating + last-frame search in ONE jit
    (each separate dispatch pays a tunnel round trip).

    The last frame's per-row descriptor/octave/angle are gathered ON
    DEVICE from its resident arrays via ``row_ids`` — the last frame
    never has to materialize on the host.

    With ``chi2 > 0`` the trusted-pose reprojection gate
    (CheckMatchesByProjection, src/Tracking.cc:1108-1142) fuses in too:
    the second returned mask keeps matches whose error under the prior
    pose passes chi2 * sigma^2 of the matched keypoint's octave."""
    oct_ = last_octave[row_ids]
    desc = last_desc[row_ids]
    ang = last_angle[row_ids]
    uv, z = _project_points(Tcw, pos, fx, fy, cx, cy)
    minx, maxx, miny, maxy = bounds
    in_img = ((z > 0) & (uv[:, 0] >= minx) & (uv[:, 0] < maxx)
              & (uv[:, 1] >= miny) & (uv[:, 1] < maxy))
    res = search.search_by_projection_last_frame(
        uv, oct_, desc, mp_valid & in_img, ang,
        kp_xy, kp_octave, kp_desc, kp_valid, kp_angle,
        scale_factors, th=th)
    if chi2 <= 0:
        return res, res.valid
    r = uv - kp_xy[res.idx]
    c2 = jnp.sum(r * r, -1) * inv_sigma2[kp_octave[res.idx]]
    return res, res.valid & (c2 <= chi2)


@functools.partial(jax.jit, static_argnames=(
    "fx", "fy", "cx", "cy", "bounds", "n_levels", "log_scale", "th",
    "chi2"))
def _frustum_search_fused(pos, normal, min_d, max_d, pvalid, desc,
                          Tcw, kp_xy, kp_octave, kp_desc, kp_valid,
                          kp_has_mp, old_pos, old_idx, old_valid,
                          scale_factors, inv_sigma2,
                          fx, fy, cx, cy, bounds, n_levels, log_scale, th,
                          chi2: float = 0.0):
    """isInFrustum + local-map projection search in ONE jit.

    With ``chi2 > 0`` (pose-prior mode) the trusted-pose gate runs in
    the same call for BOTH the new matches and the pre-existing bound
    features (old_pos/old_idx): returns (visible, match result,
    new-match gate, old-binding gate)."""
    fr = frustum.is_in_frustum(pos, normal, min_d, max_d, pvalid, Tcw,
                               fx, fy, cx, cy, bounds, n_levels, log_scale)
    r = search.search_by_projection_local_map(
        fr.uv, fr.pred_level, fr.view_cos, desc, fr.visible,
        kp_xy, kp_octave, kp_desc, kp_valid, kp_has_mp,
        scale_factors, th=th)
    if chi2 <= 0:
        return fr.visible, r, r.valid, old_valid

    def gate(pw, feat_idx, valid):
        uvp, z = _project_points(Tcw, pw, fx, fy, cx, cy)
        d = uvp - kp_xy[feat_idx]
        c2 = jnp.sum(d * d, -1) * inv_sigma2[kp_octave[feat_idx]]
        return valid & (z > 0) & (c2 <= chi2)

    new_gate = gate(pos, r.idx, r.valid)
    old_gate = gate(old_pos, old_idx, old_valid)
    return fr.visible, r, new_gate, old_gate


def _prior_step_core(Tcw,
                     pt_pos, pt_desc, pt_normal, pt_min, pt_max,
                     pt_alive,
                     bound_pid_rows, last_rows, cand_rows,
                     last_octave_all, last_desc_all, last_angle_all,
                     kp_xy, kp_octave, kp_desc, kp_valid, kp_angle,
                     scale_factors, inv_sigma2,
                     fx, fy, cx, cy, bounds, n_levels, log_scale,
                     th_last, th_local, chi2):
    """The ENTIRE steady-state pose-prior tracking step in ONE dispatch:

    1. project last frame's bound map points with the trusted pose and
       match them against the current keypoints
       (SearchByProjection(cur, last, th), src/ORBmatcher.cc:1633-1797),
    2. trusted-pose chi2 gate (CheckMatchesByProjection,
       src/Tracking.cc:1108-1142),
    3. mark the matched keypoints as bound,
    4. frustum-cull the local-map candidates (points currently bound are
       masked via an in-kernel sorted search of the bound pid rows)
       and run the local-map projection search against the remaining
       keypoints (src/ORBmatcher.cc:64-160),
    5. chi2-gate the new matches.

    Everything the reference does across TrackWithInitialPose +
    TrackLocalMap's search phase, as one kernel: through a tunnel whose
    round trip costs ~30-50 ms, the dispatch count IS the frame budget.
    The local-map candidate set is prepared at the END of the previous
    frame (its covisibility vote uses that frame's final bindings — the
    reference votes with the current frame's bindings; one-frame lag in
    the VOTE only, the search itself is exact).

    The map-point SoA (pt_*) is the persistent DEVICE-RESIDENT store
    (models/device_points.py): only the small row-index vectors cross
    the host<->chip link each frame; positions/descriptors are gathered
    here on device."""
    # --- gather last-frame bound points from the device point store ---
    b_ok = bound_pid_rows >= 0
    b_rows = jnp.clip(bound_pid_rows, 0, None)
    last_pos = pt_pos[b_rows]
    last_valid = b_ok & pt_alive[b_rows]
    # --- gather local-map candidates ---
    c_ok = cand_rows >= 0
    c_rows = jnp.clip(cand_rows, 0, None)
    cand_pos = pt_pos[c_rows]
    cand_normal = pt_normal[c_rows]
    cand_min = pt_min[c_rows]
    cand_max = pt_max[c_rows]
    cand_valid = c_ok & pt_alive[c_rows]
    cand_desc = pt_desc[c_rows]

    oct_ = last_octave_all[last_rows]
    desc = last_desc_all[last_rows]
    ang = last_angle_all[last_rows]
    uv, z = _project_points(Tcw, last_pos, fx, fy, cx, cy)
    minx, maxx, miny, maxy = bounds
    in_img = ((z > 0) & (uv[:, 0] >= minx) & (uv[:, 0] < maxx)
              & (uv[:, 1] >= miny) & (uv[:, 1] < maxy))
    res = search.search_by_projection_last_frame(
        uv, oct_, desc, last_valid & in_img, ang,
        kp_xy, kp_octave, kp_desc, kp_valid, kp_angle,
        scale_factors, th=th_last)
    r = uv - kp_xy[res.idx]
    c2 = jnp.sum(r * r, -1) * inv_sigma2[kp_octave[res.idx]]
    gate = res.valid & (c2 <= chi2)

    # per-feature "already bound" mask (mutual-best => unique targets)
    nf = kp_xy.shape[0]
    has_mp = jnp.zeros(nf, jnp.int32).at[res.idx].max(
        gate.astype(jnp.int32)) > 0

    # candidate rows whose point is GATED-bound this frame drop out.
    # The cand->bound row map is computed HERE by sorted search (4096
    # bound rows x 16384 probes is negligible on device) instead of on
    # the host: saves a 64 KB cand_bound_row upload per frame through
    # the link plus the host-side searchsorted (the link and the host
    # epilogue are the frame budget, not device FLOPs).  -1 pads on
    # both sides only ever match rows whose gate is False.
    order = jnp.argsort(bound_pid_rows)
    sorted_pids = bound_pid_rows[order]
    pos = jnp.clip(jnp.searchsorted(sorted_pids, cand_rows),
                   0, sorted_pids.shape[0] - 1)
    row_bound = (sorted_pids[pos] == cand_rows) & gate[order[pos]]
    cvalid = cand_valid & ~row_bound
    fr = frustum.is_in_frustum(cand_pos, cand_normal, cand_min, cand_max,
                               cvalid, Tcw, fx, fy, cx, cy, bounds,
                               n_levels, log_scale)
    r2 = search.search_by_projection_local_map(
        fr.uv, fr.pred_level, fr.view_cos, cand_desc, fr.visible,
        kp_xy, kp_octave, kp_desc, kp_valid, has_mp,
        scale_factors, th=th_local)
    uvp, z2 = _project_points(Tcw, cand_pos, fx, fy, cx, cy)
    d = uvp - kp_xy[r2.idx]
    c2n = jnp.sum(d * d, -1) * inv_sigma2[kp_octave[r2.idx]]
    keep_new = r2.valid & (z2 > 0) & (c2n <= chi2)
    # compact outputs: int16 indices + bit-packed masks — the result
    # fetch drops from ~130 KB to ~45 KB through the link.  Leaves 0-5
    # are the HOST-facing results (the only ones copied back); leaves
    # 6-8 stay on device and seed the NEXT step's chain prologue
    # (_track_prior_chain): the unpacked gate/keep masks and the bound
    # rows this step actually used.
    return (res.idx.astype(jnp.int16), jnp.packbits(res.valid),
            jnp.packbits(gate), jnp.packbits(fr.visible),
            r2.idx.astype(jnp.int16), jnp.packbits(keep_new),
            gate, keep_new, bound_pid_rows)


@functools.partial(jax.jit, static_argnames=(
    "fx", "fy", "cx", "cy", "bounds", "n_levels", "log_scale",
    "th_last", "th_local", "chi2"))
def _track_prior_step(Tcw,
                      pt_pos, pt_desc, pt_normal, pt_min, pt_max,
                      pt_alive,
                      bound_pid_rows, last_rows, cand_rows,
                      last_octave_all, last_desc_all, last_angle_all,
                      kp_xy, kp_octave, kp_desc, kp_valid, kp_angle,
                      scale_factors, inv_sigma2,
                      fx, fy, cx, cy, bounds, n_levels, log_scale,
                      th_last, th_local, chi2):
    """Classic (host-prepared) step: the bound/last row vectors were
    assembled by the host from the last CONSUMED frame's bindings.
    Used to bootstrap after init/reloc/fallbacks; steady state runs
    _track_prior_chain instead."""
    return _prior_step_core(
        Tcw, pt_pos, pt_desc, pt_normal, pt_min, pt_max, pt_alive,
        bound_pid_rows, last_rows, cand_rows,
        last_octave_all, last_desc_all, last_angle_all,
        kp_xy, kp_octave, kp_desc, kp_valid, kp_angle,
        scale_factors, inv_sigma2,
        fx, fy, cx, cy, bounds, n_levels, log_scale,
        th_last, th_local, chi2)


@functools.partial(jax.jit, static_argnames=(
    "fx", "fy", "cx", "cy", "bounds", "n_levels", "log_scale",
    "th_last", "th_local", "chi2"))
def _track_prior_chain(Tcw,
                       pt_pos, pt_desc, pt_normal, pt_min, pt_max,
                       pt_alive,
                       prev_bound_rows, prev_cand_rows,
                       prev_ridx16, prev_r2idx16, prev_gate, prev_keep,
                       cand_rows,
                       last_octave_all, last_desc_all, last_angle_all,
                       kp_xy, kp_octave, kp_desc, kp_valid, kp_angle,
                       scale_factors, inv_sigma2,
                       fx, fy, cx, cy, bounds, n_levels, log_scale,
                       th_last, th_local, chi2):
    """Device-resident tracking recurrence: reconstruct this step's
    bound set from the PREVIOUS step's device outputs — no host consume
    sits between two dispatches, so the result round trip leaves the
    critical path entirely (the host reads results 1-2 frames behind,
    purely for bookkeeping: bindings, keyframe decisions, counters).

    Prologue: the previous step matched bound row i -> feature
    ridx16[i] (kept iff gate[i]) and candidate row j -> feature
    r2idx16[j] (kept iff keep[j]); the searches are disjoint over
    features (the local-map search masks features the frame-to-frame
    pass bound), so the union has at most n_features (<= L) entries.
    A cumsum scatter compacts (pid_row, feature) pairs into the fixed
    (L,) bound vectors; overflow and padding rows scatter to a
    discarded slot L.  The host mirrors this derivation at consume
    time to know which pids the outputs refer to."""
    L = prev_bound_rows.shape[0]
    pid_all = jnp.concatenate([prev_bound_rows,
                               prev_cand_rows.astype(jnp.int32)])
    row_all = jnp.concatenate([
        prev_ridx16.astype(jnp.int32) & 0xFFFF,
        prev_r2idx16.astype(jnp.int32) & 0xFFFF])
    m = jnp.concatenate([prev_gate, prev_keep])
    pos = jnp.cumsum(m) - 1
    idx = jnp.where(m, jnp.minimum(pos, L - 1), L)
    bound = jnp.full((L + 1,), -1, jnp.int32).at[idx].set(pid_all)[:L]
    lrows = jnp.zeros((L + 1,), jnp.int32).at[idx].set(row_all)[:L]
    return _prior_step_core(
        Tcw, pt_pos, pt_desc, pt_normal, pt_min, pt_max, pt_alive,
        bound, lrows, cand_rows,
        last_octave_all, last_desc_all, last_angle_all,
        kp_xy, kp_octave, kp_desc, kp_valid, kp_angle,
        scale_factors, inv_sigma2,
        fx, fy, cx, cy, bounds, n_levels, log_scale,
        th_last, th_local, chi2)


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy"))
def _pose_opt_fused(Tcw0, pos, bound_idx, kp_xy, kp_octave,
                    inv_sigma2_lvl, valid, fx, fy, cx, cy):
    """Motion-only pose LM with on-device keypoint gathers (the frame
    stays device-resident)."""
    uv = kp_xy[bound_idx]
    isig = inv_sigma2_lvl[kp_octave[bound_idx]]
    return pose_opt.optimize_pose(Tcw0, pos, uv, isig, valid,
                                  fx, fy, cx, cy)


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "chi2"))
def _reproj_chi2_gate(Tcw, pos, bound_idx, kp_xy, kp_octave, inv_sigma2,
                      valid, fx, fy, cx, cy, chi2):
    """CheckMatchesByProjection (src/Tracking.cc:1108-1142): keep
    bindings whose reprojection error under the (trusted) pose passes
    the chi-squared gate.  Observed keypoints gather on device via
    ``bound_idx`` from the frame's resident arrays."""
    uv_obs = kp_xy[bound_idx]
    isig = inv_sigma2[kp_octave[bound_idx]]
    uv, z = _project_points(Tcw, pos, fx, fy, cx, cy)
    r = uv - uv_obs
    c2 = jnp.sum(r * r, -1) * isig
    return valid & (z > 0) & (c2 <= chi2)


class Tracker:
    def __init__(self, config: SlamConfig, store: MapStore,
                 factory: FrameFactory):
        self.cfg = config
        self.store = store
        self.factory = factory
        self.state = TrackState.NO_IMAGES_YET

        self.init_frame: Optional[Frame] = None
        self.last_frame: Optional[Frame] = None
        self.mapping_enabled: bool = True  # localization-only when False
        self.ref_kf: int = -1
        self.velocity: Optional[np.ndarray] = None  # Tcw_cur @ inv(Tcw_last)
        self.last_kf_frame_id: int = 0
        self.last_reloc_frame_id: int = -(10 ** 9)
        self.matches_inliers: int = 0

        # wired by System
        self.on_new_keyframe: Optional[Callable[[int], None]] = None
        # probe: is the mapping worker idle?  None = synchronous
        # pipeline (always idle).  Wired by System in async mode
        self.mapping_idle: Optional[Callable[[], bool]] = None
        self.on_reset: Optional[Callable[[], None]] = None
        self.relocalize: Optional[Callable[[Frame], bool]] = None

        self.timer = StageTimer()
        # device-side local-map preparation for the fused step, built at
        # the end of each tracked frame for the next one
        self._prep = None
        # in-flight pipelined frames, oldest first: list of
        # (frame, out leaves, meta); up to 2 deep (adaptive lag)
        self._pending = []
        # device-resident tracking recurrence state: the previous
        # dispatched step's device outputs + the frame/cand handles it
        # used (see _track_prior_chain).  None = next dispatch is a
        # classic host-prepared step
        self._chain = None
        self._last_meta = None  # meta of the most recent dispatch

        cam = config.cam
        self._cam_tuple = (float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy))
        from ..geom.camera import undistorted_bounds
        self.bounds = undistorted_bounds(cam)
        self.scale_factors = np.asarray(factory.scale_factors, np.float32)
        self.inv_sigma2 = np.asarray(factory.inv_sigma2, np.float32)
        # constants uploaded once, reused across every dispatch
        self._j_scales = jnp.asarray(self.scale_factors)
        self._j_inv_sigma2 = jnp.asarray(self.inv_sigma2)
        self.log_scale = float(np.log(config.orb.scale_factor))

    # ------------------------------------------------------------------
    def track(self, image: np.ndarray, timestamp: float = 0.0,
              pose_prior: Optional[np.ndarray] = None,
              started=None, pre_read_hook=None) -> Frame:
        """Process one frame — Tracking::trackImageWithPose
        (src/Tracking.cc:194-356) merged with upstream GrabImageMonocular.

        ``pre_read_hook``: called after the frame's device work is
        dispatched but before its results are read — a caller can queue
        the NEXT frame's extraction there so the device crunches it
        while this frame's results cross the tunnel back."""
        init_mode = self.state in (TrackState.NO_IMAGES_YET,
                                   TrackState.NOT_INITIALIZED)
        with self.timer.time("track/extract"):
            frame = self.factory.make(image, timestamp,
                                      Tcw=pose_prior, init_mode=init_mode,
                                      started=started)

        if self._pending:
            # one-frame-lag pipeline: commit the previous frame's
            # dispatched step before touching this one.  Steady state
            # takes the fast path: consume -> prep -> DISPATCH this
            # frame -> only then the keyframe epilogue, so the result
            # round trip overlaps the epilogue instead of following it
            if not init_mode:
                done = self._finish_pending_fast(frame, pre_read_hook)
                if done is not None:
                    return done
            else:
                self._finish_pending()

        if init_mode:
            with self.store.lock:
                self._initialize(frame, pose_prior)
                self.last_frame = frame
                if self.state == TrackState.OK:
                    self._prepare_next(frame)
            return frame

        ok = False
        fused_done = False
        if self.state == TrackState.OK:
            prep_ok = (self._prep is not None
                       and self._prep["frame"] is self.last_frame)
            if self.cfg.pose_prior and prep_ok:
                # fused path: dispatch+read run lock-free; only the
                # short apply section takes the map lock internally
                with self.timer.time("track/fused_step"):
                    out = self._fused_dispatch(frame, pre_read_hook)
                if self.cfg.pipelined_tracking:
                    # results consumed 1-2 frames later; the async
                    # copies (requested inside _fused_dispatch) land in
                    # the leaves' host caches on their own.  The meta
                    # MUST be _last_meta (what _fused_dispatch actually
                    # recorded): with a live chain the dispatch took the
                    # recurrence path and its masks decode via the lazy
                    # parent-chain meta, not via _prep — appending _prep
                    # here both misaligned the decode and left the lazy
                    # meta unconsumed (KeyError 'res' at the next
                    # consume, hit at a bench window boundary)
                    self._pending.append((frame, out, self._last_meta))
                    return frame
                verdict = self._fused_verdict(frame, out)
                if verdict == "ok":
                    ok = fused_done = True
                elif verdict == "lost":
                    ok = False
                    fused_done = True  # local-map stage ran; don't redo
                else:  # prior_fail -> reference-KF fallback + old path
                    with self.store.lock:
                        ok = self._track_reference_kf(frame)
            elif self.cfg.pose_prior:
                with self.store.lock:
                    with self.timer.time("track/refresh_replaced"):
                        self._refresh_replaced_bindings(self.last_frame)
                    with self.timer.time("track/prior"):
                        ok = self._track_with_prior(frame)
                    if not ok:
                        ok = self._track_reference_kf(frame)
            else:
                with self.store.lock:
                    with self.timer.time("track/refresh_replaced"):
                        self._refresh_replaced_bindings(self.last_frame)
                    if self.velocity is not None:
                        ok = self._track_motion_model(frame)
                    if not ok:
                        ok = self._track_reference_kf(frame)
        else:  # LOST
            with self.store.lock:
                ok = self._do_relocalize(frame)

        if ok and not fused_done:
            with self.timer.time("track/local_map"), self.store.lock:
                ok = self._track_local_map(frame)

        self._post_track(frame, ok)
        return frame

    def _post_track(self, frame: Frame, ok: bool):
        """The per-frame epilogue: state machine, keyframe decision,
        next-frame preparation, reset (src/Tracking.cc:330-356)."""
        do_reset = False
        with self.store.lock:
            if ok:
                self.state = TrackState.OK
                if not self.cfg.pose_prior and self.last_frame is not None:
                    self.velocity = frame.Tcw @ np.linalg.inv(
                        self.last_frame.Tcw)
                with self.timer.time("track/need_kf"):
                    need = (self.mapping_enabled
                            and self._need_new_keyframe(frame))
                if need:
                    with self.timer.time("track/create_kf"):
                        self._create_new_keyframe(frame)
            else:
                self.state = TrackState.LOST
                self.velocity = None
                self._prep = None
                self._chain = None
                do_reset = (self.store.n_valid_keyframes() <= 5
                            and self.on_reset is not None)

            if self.state == TrackState.OK and self.cfg.pose_prior:
                with self.timer.time("track/prep_next"):
                    self._prepare_next(frame)
        if do_reset:
            # outside the map lock: reset drains the mapping worker,
            # which must be able to take the lock to finish its queue
            self.on_reset()

        # per-frame glog-equivalent (src/Tracking.cc:654-656)
        log.info("frame %d: state=%s inliers=%d tracked=%d",
                 frame.frame_id, self.state.name, self.matches_inliers,
                 frame.n_tracked())
        self.last_frame = frame

    def _post_track_core(self, frame: Frame, ok: bool,
                         do_prep: bool = True) -> bool:
        """State machine + next-frame prep ONLY (pipelined fast path).
        The keyframe decision/creation, reset, and logging run in
        :meth:`_post_track_epilogue` — AFTER the caller has dispatched
        the next frame's fused step.  Dispatching first removes the
        epilogue (~25 ms of host bookkeeping) from the phase between a
        frame's dispatch and its result wait: measured on the chip, the
        fused step computes in ~2 ms and its 46 KB of outputs land in
        one ~32 ms round trip, so the earlier the dispatch, the more of
        that latency the NEXT frame's host work hides.  Returns
        ``do_reset`` for the epilogue."""
        do_reset = False
        with self.store.lock:
            if ok:
                self.state = TrackState.OK
                if not self.cfg.pose_prior and self.last_frame is not None:
                    self.velocity = frame.Tcw @ np.linalg.inv(
                        self.last_frame.Tcw)
            else:
                self.state = TrackState.LOST
                self.velocity = None
                self._prep = None
                self._chain = None
                do_reset = (self.store.n_valid_keyframes() <= 5
                            and self.on_reset is not None)
            if do_prep and self.state == TrackState.OK \
                    and self.cfg.pose_prior:
                with self.timer.time("track/prep_next"):
                    self._prepare_next(frame)
        self.last_frame = frame
        return do_reset

    def _post_track_epilogue(self, frame: Frame, ok: bool,
                             do_reset: bool):
        """Deferred half of the pipelined epilogue: keyframe decision
        (one keyframe staler than the sequential path w.r.t. the just
        -prepared candidate set — the new KF's triangulated points are
        produced asynchronously and land frames later either way),
        reset handshake, per-frame log."""
        if ok:
            with self.store.lock:
                with self.timer.time("track/need_kf"):
                    need = (self.mapping_enabled
                            and self._need_new_keyframe(frame))
                if need:
                    with self.timer.time("track/create_kf"):
                        self._create_new_keyframe(frame)
        if do_reset:
            self.on_reset()
        log.info("frame %d: state=%s inliers=%d tracked=%d",
                 frame.frame_id, self.state.name, self.matches_inliers,
                 frame.n_tracked())

    def _finish_pending(self):
        """Commit the pipelined frame: consume its fused-step results
        (already streamed to host), then run the standard epilogue.
        Falls back to reference-KF tracking / LOST exactly like the
        sequential path — just one frame later."""
        pframe, out, prep = self._pending.pop(0)
        with self.timer.time("track/finish_pending"):
            verdict = self._fused_verdict(pframe, out, prep)
            ok = False
            fused_done = False
            if verdict == "ok":
                ok = fused_done = True
            elif verdict == "lost":
                fused_done = True
            else:
                with self.store.lock:
                    ok = self._track_reference_kf(pframe)
            if ok and not fused_done:
                with self.store.lock:
                    ok = self._track_local_map(pframe)
            self._post_track(pframe, ok)

    def _prefetch_heads(self, k: int):
        """Fetch the first ``k`` pending steps' host-facing leaves in
        ONE batched ``device_get`` and swap them into the queue as
        numpy tuples (``_fused_verdict``'s own ``device_get`` is then a
        pass-through).  One tunnel round trip serves ``k`` consumes."""
        k = min(k, len(self._pending))
        with self.timer.time("fused/read_batch"):
            fetched = jax.device_get(tuple(
                tuple(self._pending[i][1][:6]) for i in range(k)))
        for i in range(k):
            pframe, _, prep = self._pending[i]
            self._pending[i] = (pframe, fetched[i], prep)

    def _consume_head(self, do_prep: bool = True) -> bool:
        """Consume the OLDEST in-flight pipelined frame: verdict ->
        bindings -> state machine (+ optional next-frame prep) ->
        keyframe epilogue.  Returns ok."""
        pframe, fut, prep = self._pending.pop(0)
        verdict = self._fused_verdict(pframe, fut, prep)
        ok = False
        fused_done = False
        if verdict == "ok":
            ok = fused_done = True
        elif verdict == "lost":
            fused_done = True
        else:
            with self.store.lock:
                ok = self._track_reference_kf(pframe)
        if verdict != "ok":
            # the device recurrence no longer matches host bindings
            # (fallback rebinding / loss): bootstrap the next dispatch
            # from a fresh host prep
            self._chain = None
        if ok and not fused_done:
            with self.store.lock:
                ok = self._track_local_map(pframe)
        do_reset = self._post_track_core(pframe, ok, do_prep=do_prep)
        self._post_track_epilogue(pframe, ok, do_reset)
        return ok

    def _finish_pending_fast(self, frame: Frame, pre_read_hook):
        """Adaptive-lag pipelined steady path.  Up to TWO fused steps
        stay in flight; the head is consumed only when it is FORCED
        (two already in flight) or FREE (its host transfer finished).
        On a fast link this degenerates to the classic one-frame lag;
        through a slow tunnel the consume trails the dispatch by two
        frames, so the dispatch->reply latency (~45 ms measured: ~2 ms
        compute + ~32 ms round trip + transfer) is paid once per TWO
        frame periods of host work instead of bounding every period.
        The cost: frame-to-frame matching runs against the newest
        CONSUMED frame (t-2 instead of t-1 under full lag).  The
        local-map candidate search is unaffected — it projects with
        frame t's own pose prior.  Returns the frame when dispatched,
        None when the caller must fall back (LOST, stale prep,
        reset)."""
        with self.timer.time("track/finish_pending"):
            # consume AT MOST ONE head per frame: consuming every ready
            # head collapses the pipeline back to zero lag, so the next
            # dispatch's round trip is paid in full again (and the prep
            # is rebuilt twice).  One-in one-out keeps the queue primed
            # at depth 2 and the head always arrived by consume time
            if len(self._pending) >= self.cfg.pipeline_depth:
                if self.cfg.pipeline_depth >= 3 \
                        and len(self._pending) >= 2:
                    # depth>=3 batched mode: fetch (depth-1) steps'
                    # results in ONE device_get (the read is one tunnel
                    # round trip regardless of payload — 46 KB vs 92 KB
                    # is noise against the ~28 ms rt), then commit them
                    # all, leaving one step in flight.  Steady state at
                    # depth 3 alternates consume-2 / consume-0, so each
                    # frame pays HALF a round trip instead of one
                    k = len(self._pending) - 1
                    self._prefetch_heads(k)
                    for i in range(k):
                        if i and self.state != TrackState.OK:
                            break  # drain below finishes the rest
                        self._consume_head(do_prep=(i == k - 1))
                else:
                    self._consume_head()
        if self.state != TrackState.OK:
            # drain whatever is still in flight with full semantics so
            # relocalization sees the newest state
            while self._pending:
                with self.timer.time("track/finish_pending"):
                    self._consume_head()
            return None
        prep_ok = (self._prep is not None
                   and self._prep["frame"] is self.last_frame)
        if not prep_ok:
            return None
        with self.timer.time("track/fused_step"):
            out = self._fused_dispatch(frame, pre_read_hook)
        # the async copies (requested inside _fused_dispatch, BEFORE
        # the next extraction is queued) stream into the leaves' host
        # caches on their own: the consume-time read is ~0.3 ms once
        # landed (a background reader thread issuing jax.device_get
        # instead costs a blocking RPC that contends with every other
        # tunnel transfer - measured 31-51 ms at consume time)
        self._pending.append((frame, out, self._last_meta))
        return frame

    def flush(self):
        """Finalize any in-flight pipelined frame (call before reading
        trajectories/maps or shutting down)."""
        while self._pending:
            self._finish_pending()
        # a flush is a pipeline boundary: the next dispatch bootstraps
        # from a fresh host prep instead of the device recurrence
        self._chain = None

    # ------------------------------------------------------------------
    # initialization (src/Tracking.cc:392-573)
    # ------------------------------------------------------------------
    def _initialize(self, frame: Frame, pose_prior: Optional[np.ndarray]):
        n_kp = int(frame.valid.sum())
        if self.init_frame is None or self.state == TrackState.NO_IMAGES_YET:
            if n_kp > self.cfg.init_min_keypoints:
                self.init_frame = frame
                self.state = TrackState.NOT_INITIALIZED
            return
        if n_kp <= self.cfg.init_min_keypoints:
            self.init_frame = None
            self.state = TrackState.NO_IMAGES_YET
            return

        f1, f2 = self.init_frame, frame
        res = search.search_for_initialization(
            f1.dev("xy"), f1.dev("desc"), f1.dev("valid"),
            f1.dev("octave"), f1.dev("angle"),
            f2.dev("xy"), f2.dev("desc"), f2.dev("valid"),
            f2.dev("octave"), f2.dev("angle"),
            window=self.cfg.init_match_window)
        res = res.host()
        valid = np.asarray(res.valid)
        idx = np.asarray(res.idx)
        n_matches = int(valid.sum())
        if n_matches < self.cfg.init_min_matches:
            # keep f2 as the new initial frame (reference restarts with
            # the current frame when matching fails, src/Tracking.cc:436-445)
            self.init_frame = frame
            return

        # both poses must be known: the prior mode supplies them per
        # frame and bootstrap hints may supply them in estimated mode;
        # otherwise run the upstream H/F-model RANSAC initializer.
        T1, T2 = f1.Tcw, f2.Tcw
        if pose_prior is None and np.allclose(T1, T2):
            self._initialize_two_view(f1, f2, valid, idx)
            return

        K = np.asarray(self.cfg.cam.K)
        rows = np.where(valid)[0]
        cols = idx[rows]
        nb = pad_bucket(len(rows))
        padn = nb - len(rows)
        uv1 = jnp.asarray(np.pad(f1.xy[rows], ((0, padn), (0, 0))))
        uv2 = jnp.asarray(np.pad(f2.xy[cols], ((0, padn), (0, 0))))
        P1 = triangulate.projection_matrix(jnp.asarray(K), jnp.asarray(T1))
        P2 = triangulate.projection_matrix(jnp.asarray(K), jnp.asarray(T2))
        X = triangulate.triangulate_dlt(P1, P2, uv1, uv2)
        sig1 = jnp.asarray(np.pad(self.factory.sigma2[f1.octave[rows]],
                                  (0, padn), constant_values=1.0))
        sig2 = jnp.asarray(np.pad(self.factory.sigma2[f2.octave[cols]],
                                  (0, padn), constant_values=1.0))
        fx, fy, cx, cy = self._cam_tuple
        chk = triangulate.check_triangulation(
            X, jnp.asarray(T1), jnp.asarray(T2), uv1, uv2,
            fx, fy, cx, cy, sig1, sig2)
        good = np.asarray(chk.good)[:len(rows)]
        X = X[:len(rows)]
        if good.sum() < self.cfg.init_min_triangulated:
            self.init_frame = frame
            return
        self._create_initial_map(f1, f2, rows[good], cols[good],
                                 np.asarray(X)[good])

    def _initialize_two_view(self, f1: Frame, f2: Frame,
                             valid: np.ndarray, idx: np.ndarray):
        """Upstream monocular initialization: H/F-model RANSAC relative
        pose + triangulation + median-depth gauge (the capability the
        fork deleted; geom/twoview.py)."""
        from ..geom import twoview
        rows = np.where(valid)[0]
        cols = idx[rows]
        nb = pad_bucket(len(rows))
        padn = nb - len(rows)
        uv1 = np.pad(f1.xy[rows], ((0, padn), (0, 0)))
        uv2 = np.pad(f2.xy[cols], ((0, padn), (0, 0)))
        isig = np.pad(self.factory.inv_sigma2[f2.octave[cols]], (0, padn),
                      constant_values=1.0)
        vmask = np.zeros(nb, bool)
        vmask[:len(rows)] = True
        samples = np.random.default_rng(f2.frame_id).integers(
            0, max(len(rows), 1), (200, 8)).astype(np.int32)
        res = twoview.initialize_two_view(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(vmask),
            jnp.asarray(isig), jnp.asarray(np.asarray(self.cfg.cam.K)),
            jnp.asarray(samples),
            min_triangulated=self.cfg.init_min_triangulated)
        if not bool(res.ok):
            return  # keep the initial frame, try with the next image
        ok_, R_, t_, X_, good_ = jax.device_get(
            (res.ok, res.R, res.t, res.points, res.good))
        good = good_[:len(rows)]
        X = X_[:len(rows)]
        f1.Tcw = np.eye(4, dtype=np.float32)
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, :3] = R_
        T2[:3, 3] = t_
        f2.Tcw = T2
        self._create_initial_map(f1, f2, rows[good], cols[good], X[good],
                                 estimated=True)

    def _compact_init_frame(self, frame: Frame, keep) -> np.ndarray:
        """Compact a 2x-budget init frame to the standard feature
        capacity, keeping the matched rows ``keep`` plus the
        highest-response remaining valid features.  Returns ``keep``
        remapped to the compacted row space.  Keeps every downstream
        stacked-kernel row count at ONE static shape for the whole run
        (see Frame.compact)."""
        keep = np.asarray(keep, np.int64)
        # compact to the PADDED capacity so init KFs land on the same
        # static row count as every regular frame (Pallas search kernels
        # need %128 heights; see ops.extractor.padded_feature_count)
        from ..ops.extractor import padded_feature_count
        cap = padded_feature_count(self.factory.params.n_features)
        if frame.n <= cap:
            return keep
        ukeep = np.unique(keep)
        if len(ukeep) >= cap:
            return keep
        in_keep = np.zeros(frame.n, bool)
        in_keep[ukeep] = True
        resp = np.where(np.asarray(frame.valid, bool),
                        np.asarray(frame.response, np.float32), -np.inf)
        rest = np.where(~in_keep)[0]
        rest = rest[np.argsort(-resp[rest], kind="stable")]
        sel = np.concatenate([ukeep, rest[:cap - len(ukeep)]])
        frame.compact(sel)
        remap = -np.ones(int(sel.max()) + 1, np.int64)
        remap[sel] = np.arange(len(sel))
        return remap[keep]

    def _create_initial_map(self, f1: Frame, f2: Frame, rows, cols, X,
                            estimated: bool = False):
        """CreateInitialMap (src/Tracking.cc:467-573; upstream
        CreateInitialMapMonocular when ``estimated``)."""
        rows = self._compact_init_frame(f1, rows)
        cols = self._compact_init_frame(f2, cols)
        store = self.store
        k1 = store.add_keyframe(f1)
        k2 = store.add_keyframe(f2)
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        new_pids = store.add_points_batch(
            pos=np.asarray(X, np.float32), desc=f2.desc[cols],
            kf1=k1, fi1=rows, kf2=k2, fi2=cols,
            first_frame=f2.frame_id, first_kf=k2).tolist()
        store.update_points_batch(new_pids)
        store.update_connections(k1)
        store.update_connections(k2)

        if estimated:
            # upstream CreateInitialMapMonocular: full BA fixing only
            # KF0, then median-depth gauge normalization
            self._run_init_full_ba(k1, k2)
        else:
            # structure-only BA with both poses fixed == the reference's
            # GlobalBundleAdjustemnt(20 it, fix both init KFs)
            # (src/Tracking.cc:536, include/Optimizer.h:80-82)
            from .local_mapping import run_structure_ba
            run_structure_ba(store, [k1, k2], self.cfg, iters=20)

        tracked = sum(1 for p in f2.mp_ids if p >= 0)
        if tracked < self.cfg.init_min_tracked_after_ba:
            if self.on_reset:
                self.on_reset()
            return

        if estimated:
            med = store.scene_median_depth(k1)
            if med <= 0:
                if self.on_reset:
                    self.on_reset()
                return
            inv = 1.0 / med
            live = np.where(np.asarray(store.mp_valid, bool))[0]
            store.mp_pos[live] = store.mp_pos[live] * inv
            T2 = store.kfs[k2].Tcw.copy()
            T2[:3, 3] *= inv
            store.set_kf_pose(k2, T2)
            f2.Tcw = T2.copy()
            store.update_points_batch(live)
        self.ref_kf = k2
        self.last_kf_frame_id = f2.frame_id
        self.state = TrackState.OK
        if self.on_new_keyframe:
            self.on_new_keyframe(k1)
            self.on_new_keyframe(k2)

    def _run_init_full_ba(self, k1: int, k2: int, iters: int = 20):
        """Full two-keyframe BA fixing only KF0 (upstream
        GlobalBundleAdjustemnt at init, Optimizer.h default gauge)."""
        from ..optim import ba as ba_mod
        from .local_mapping import gather_ba_problem
        store = self.store
        pids, packed = gather_ba_problem(store, [k1, k2],
                                         self.factory.inv_sigma2)
        if packed is None or len(pids) == 0:
            return
        obs_kf, obs_pt, obs_uv, obs_sig, meta = packed
        poses = np.stack([store.kfs[k].Tcw for k in (k1, k2)])
        points0 = np.asarray(store.mp_pos[np.asarray(pids, np.int64)])
        P = pad_bucket(len(pids))
        O = pad_bucket(len(obs_kf))
        fx, fy, cx, cy = self._cam_tuple
        eye = np.broadcast_to(np.eye(4, dtype=np.float32), (6, 4, 4))
        res = ba_mod.bundle_adjust(
            jnp.asarray(np.concatenate([poses, eye])),
            jnp.asarray(np.pad(points0, ((0, P - len(pids)), (0, 0)))),
            jnp.asarray(np.pad(obs_kf, (0, O - len(obs_kf)))),
            jnp.asarray(np.pad(obs_pt, (0, O - len(obs_kf)))),
            jnp.asarray(np.pad(obs_uv, ((0, O - len(obs_kf)), (0, 0)))),
            jnp.asarray(np.pad(obs_sig, (0, O - len(obs_kf)))),
            jnp.asarray(np.pad(np.ones(len(obs_kf), bool),
                               (0, O - len(obs_kf)))),
            jnp.asarray(np.pad(np.array([True, False]), (0, 6),
                               constant_values=True)),
            fx, fy, cx, cy, iters=iters, cg_iters=20)
        new_poses, new_pts, inl_all = jax.device_get(
            (res.cam_Tcw, res.points, res.obs_inlier))
        store.set_kf_pose(k2, new_poses[1])
        store.kfs[k2].frame.Tcw = new_poses[1].copy()
        for j, p in enumerate(pids):
            store.mp_pos[p] = new_pts[j]
        store.dirty_points.update(int(p) for p in pids)
        inl = inl_all[:len(obs_kf)]
        meta_kid, meta_fi = meta
        for o in np.where(~inl)[0]:
            pid = pids[obs_pt[o]]
            if store.mp_valid[pid]:
                store.erase_observation(pid, int(meta_kid[o]))

    # ------------------------------------------------------------------
    # frame-to-frame tracking
    # ------------------------------------------------------------------
    def _refresh_replaced_bindings(self, frame: Optional[Frame]):
        """CheckReplacedMapPointsInLastFrame (src/Tracking.cc:581-597),
        vectorized (replace chains are almost always depth 0/1)."""
        if frame is None:
            return
        rows = np.where(frame.mp_ids >= 0)[0]
        if len(rows) == 0:
            return
        pids = frame.mp_ids[rows].astype(np.int64)
        for _ in range(100):
            rb = np.asarray(self.store.mp_replaced_by[pids], np.int64)
            if not (rb >= 0).any():
                break
            pids = np.where(rb >= 0, rb, pids)
        alive = np.asarray(self.store.mp_valid[pids], bool)
        frame.mp_ids[rows] = np.where(alive, pids, -1).astype(np.int32)

    def _gather_last_frame_mps(self, last: Frame):
        has = (last.mp_ids >= 0) & ~last.mp_outlier
        ids = np.where(has)[0]
        if len(ids) == 0:
            return ids.astype(np.int32)
        live = np.asarray(self.store.mp_valid[last.mp_ids[ids]], bool)
        return ids[live].astype(np.int32)

    def _match_against_last(self, frame: Frame, Tcw_pred: np.ndarray,
                            th: float, chi2: float = 0.0):
        """SearchByProjection(cur, last, th) — bind map points of the
        last frame to current features (src/ORBmatcher.cc:1633-1797).
        With ``chi2 > 0`` the trusted-pose gate fuses into the same
        device call; returns (n_matches, n_good)."""
        last = self.last_frame
        ids = self._gather_last_frame_mps(last)
        if len(ids) == 0:
            return 0, 0
        pos = np.asarray(self.store.mp_pos[last.mp_ids[ids]])

        n = pad_bucket(len(ids))
        pad = n - len(ids)
        pos = np.pad(pos, ((0, pad), (0, 0)))
        ids_p = np.pad(ids, (0, pad))
        mp_valid = np.zeros(n, bool)
        mp_valid[:len(ids)] = True

        fx, fy, cx, cy = self._cam_tuple
        with self.timer.time("prior/dispatch"):
            res, gate = _match_last_fused(
                jnp.asarray(Tcw_pred), jnp.asarray(pos), jnp.asarray(mp_valid),
                jnp.asarray(ids_p),
                last.dev("octave"), last.dev("desc"), last.dev("angle"),
                frame.dev("xy"), frame.dev("octave"),
                frame.dev("desc"), frame.dev("valid"),
                frame.dev("angle"),
                self._j_scales, self._j_inv_sigma2,
                fx, fy, cx, cy, self.bounds, th, chi2)
        with self.timer.time("prior/read"):
            rvalid, ridx, ggate = jax.device_get((res.valid, res.idx, gate))
        rvalid = rvalid[:len(ids)]
        ridx = ridx[:len(ids)]
        ggate = ggate[:len(ids)]
        # bind only gate survivors (mutual-best => unique targets)
        sel = np.where(ggate)[0]
        frame.mp_ids[ridx[sel]] = last.mp_ids[ids[sel]]
        return int(rvalid.sum()), len(sel)

    def _pose_chi2_filter(self, frame: Frame) -> int:
        """Prior mode: gate current bindings by reprojection chi2 under
        the trusted pose; returns surviving count."""
        bound = np.where(frame.mp_ids >= 0)[0]
        if len(bound) == 0:
            return 0
        pos = np.asarray(self.store.mp_pos[frame.mp_ids[bound]])
        fx, fy, cx, cy = self._cam_tuple
        n = pad_bucket(len(bound))
        pad = n - len(bound)
        ok = np.asarray(_reproj_chi2_gate(
            jnp.asarray(frame.Tcw),
            jnp.asarray(np.pad(pos, ((0, pad), (0, 0)))),
            jnp.asarray(np.pad(bound, (0, pad))),
            frame.dev("xy"), frame.dev("octave"), self._j_inv_sigma2,
            jnp.asarray(np.pad(np.ones(len(bound), bool), (0, pad))),
            fx, fy, cx, cy, self.cfg.chi2_mono))[:len(bound)]
        frame.mp_ids[bound[~ok]] = -1
        return int(ok.sum())

    def _optimize_frame_pose(self, frame: Frame) -> int:
        """Motion-only LM over current bindings; flags outliers.
        Restores upstream PoseOptimization semantics."""
        bound = np.where(frame.mp_ids >= 0)[0]
        if len(bound) < 3:
            return 0
        pos = np.asarray(self.store.mp_pos[frame.mp_ids[bound]])
        n = pad_bucket(len(bound))
        pad = n - len(bound)
        fx, fy, cx, cy = self._cam_tuple
        res = _pose_opt_fused(
            jnp.asarray(frame.Tcw),
            jnp.asarray(np.pad(pos, ((0, pad), (0, 0)))),
            jnp.asarray(np.pad(bound, (0, pad))),
            frame.dev("xy"), frame.dev("octave"), self._j_inv_sigma2,
            jnp.asarray(np.pad(np.ones(len(bound), bool), (0, pad))),
            fx, fy, cx, cy)
        Tcw_h, inl = jax.device_get((res.Tcw, res.inliers))
        frame.Tcw = Tcw_h
        inl = inl[:len(bound)]
        frame.mp_outlier[:] = False
        frame.mp_outlier[bound[~inl]] = True
        return int(inl.sum())

    # ------------------------------------------------------------------
    # fused single-dispatch steady-state step (pose-prior mode)
    # ------------------------------------------------------------------
    def _prepare_next(self, frame: Frame):
        """Build the next frame's device-side inputs for
        :func:`_track_prior_step`: the frame's final bindings (the rows
        of the frame-to-frame search) and the local-map candidate SoA
        (the covisibility vote of UpdateLocalKeyFrames,
        src/Tracking.cc:890-1005, using THIS frame's bindings).  Runs
        after mapping/loop stages so positions are current; the uploads
        overlap the next frame's extraction."""
        self._refresh_replaced_bindings(frame)
        local_kfs = self._local_keyframes(frame)  # also votes ref_kf
        bound_idx = np.where((frame.mp_ids >= 0) & ~frame.mp_outlier)[0]
        if len(bound_idx):
            live = np.asarray(
                self.store.mp_valid[frame.mp_ids[bound_idx].astype(np.int64)],
                bool)
            bound_idx = bound_idx[live]
        if not local_kfs or len(bound_idx) == 0:
            self._prep = None
            return
        bound_pids = frame.mp_ids[bound_idx].astype(np.int64)
        allp = np.concatenate(
            [self.store.kfs[k].frame.mp_ids for k in local_kfs])
        uniq = np.unique(allp[allp >= 0])
        if len(uniq):
            uniq = uniq[np.asarray(
                self.store.mp_valid[uniq.astype(np.int64)], bool)]
        if len(uniq) == 0:
            self._prep = None
            return
        L = pad_bucket(len(bound_idx), self.cfg.pad_min_bound)
        C = pad_bucket(len(uniq), self.cfg.pad_min_cand)
        padl = L - len(bound_idx)
        padc = C - len(uniq)
        # refresh the device-resident point store (only dirty rows
        # cross the link), then ship ONLY row-index vectors — the
        # positions/descriptors are gathered on device in the fused step
        self.store.dev_points.sync(self.store)
        self._prep = dict(
            frame=frame,
            bound_idx=bound_idx.astype(np.int32),
            bound_pids=bound_pids,
            cand_pids=uniq.astype(np.int64),
            bound_pid_rows=jnp.asarray(np.pad(
                bound_pids.astype(np.int32), (0, padl),
                constant_values=-1)),
            last_rows=jnp.asarray(np.pad(bound_idx.astype(np.int32),
                                         (0, padl))),
            cand_rows=jnp.asarray(np.pad(
                uniq.astype(np.int32), (0, padc), constant_values=-1)),
        )

    def _fused_dispatch(self, frame: Frame, pre_read_hook=None):
        """Dispatch the one-kernel steady-state step (no read)."""
        p = self._prep
        last = self.last_frame
        fx, fy, cx, cy = self._cam_tuple
        th_local = 3.0 if (frame.frame_id - self.last_reloc_frame_id
                           < self.cfg.max_frames_between_kf) else 1.0
        with self.timer.time("fused/dispatch"):
            # atomic generation snapshot: the mapper's sync() may swap
            # the device arrays concurrently (async_mapping mode)
            dp_arrs = self.store.dev_points.snapshot()
            ch = self._chain if self.cfg.pipelined_tracking else None
            if ch is not None:
                # host mirror of the chain prologue happens at consume
                # time: this meta tells the consumer HOW to derive the
                # bound pid list from its parent's consumed masks
                self._last_meta = dict(
                    lazy=True, parent=self._last_meta,
                    cand_pids=p["cand_pids"], frame=frame)
                # recurrence: last step's device outputs seed this
                # step's bound set — no host consume in between
                out = _track_prior_chain(
                    jnp.asarray(frame.Tcw),
                    *dp_arrs,
                    ch["bound_rows"], ch["cand_rows"],
                    ch["ridx"], ch["r2idx"], ch["gate"], ch["keep"],
                    p["cand_rows"],
                    ch["frame"].dev("octave"), ch["frame"].dev("desc"),
                    ch["frame"].dev("angle"),
                    frame.dev("xy"), frame.dev("octave"),
                    frame.dev("desc"),
                    frame.dev("valid"), frame.dev("angle"),
                    self._j_scales, self._j_inv_sigma2,
                    fx, fy, cx, cy, self.bounds,
                    self.cfg.orb.n_levels, self.log_scale,
                    7.0, th_local, self.cfg.chi2_mono)
            else:
                self._last_meta = p
                out = _track_prior_step(
                    jnp.asarray(frame.Tcw),
                    *dp_arrs,
                    p["bound_pid_rows"], p["last_rows"], p["cand_rows"],
                    last.dev("octave"), last.dev("desc"),
                    last.dev("angle"),
                    frame.dev("xy"), frame.dev("octave"),
                    frame.dev("desc"),
                    frame.dev("valid"), frame.dev("angle"),
                    self._j_scales, self._j_inv_sigma2,
                    fx, fy, cx, cy, self.bounds,
                    self.cfg.orb.n_levels, self.log_scale,
                    7.0, th_local, self.cfg.chi2_mono)
            if self.cfg.pipelined_tracking:
                self._chain = dict(
                    frame=frame, cand_rows=p["cand_rows"],
                    ridx=out[0], r2idx=out[4],
                    gate=out[6], keep=out[7], bound_rows=out[8])
        # request the host copies BEFORE the hook dispatches the next
        # frame's extraction: the tunnel services requests in order, so
        # copies requested after a ~31 ms extract wait behind it and
        # the consume-time read degrades to a full round trip (36 ms
        # measured) instead of ~0 on landed data.  Leaves 6-8 are
        # device-only chain state - never copied
        for leaf in out[:6]:
            leaf.copy_to_host_async()
        if pre_read_hook is not None:
            pre_read_hook()
        return out

    def _fused_verdict(self, frame: Frame, out, p=None) -> str:
        """Consume the fused step's results.  Returns 'ok', 'prior_fail'
        (frame-to-frame match too weak -> try reference-KF tracking), or
        'lost' (local-map inliers below threshold,
        src/Tracking.cc:641-666)."""
        if p is None:
            p = self._prep
        if p.get("lazy") and "bound_pids" not in p:
            # mirror the chain prologue's compaction: the parent step's
            # gated frame-to-frame matches followed by its kept
            # local-map matches, in row order (exactly the device
            # cumsum-scatter order)
            par = p["parent"]["res"]
            p["bound_pids"] = np.concatenate([
                par["bound_pids"][par["gate"]],
                par["cand_pids"][par["keep"]]])
            p["parent"] = None  # break the meta chain (no leak)
        import os as _os
        if _os.environ.get("ORB_TRACK_READ_DEBUG"):
            import time as _t
            leaves = list(out[:6])
            ready = [bool(l.is_ready()) for l in leaves
                     if hasattr(l, "is_ready")]
            _t0 = _t.perf_counter()
            jax.device_get(leaves[0])
            d0 = (_t.perf_counter() - _t0) * 1e3
            _t0 = _t.perf_counter()
            jax.device_get(leaves[1:])
            d1 = (_t.perf_counter() - _t0) * 1e3
            print(f"# READ_DEBUG ready={ready} leaf0={d0:.1f}ms "
                  f"rest={d1:.1f}ms", flush=True)
        with self.timer.time("fused/read"):
            (ridx16, rvalid_p, gate_p, visible_p, r2idx16, keep_new_p) = \
                jax.device_get(tuple(out[:6]))
        ridx = ridx16.astype(np.int64) & 0xFFFF  # int16 -> row index
        r2idx = r2idx16.astype(np.int64) & 0xFFFF
        unpack = lambda a, n: np.unpackbits(a)[:n].astype(bool)  # noqa: E731
        Lp = len(ridx)
        Cp = len(r2idx)
        rvalid = unpack(rvalid_p, Lp)
        gate = unpack(gate_p, Lp)
        visible = unpack(visible_p, Cp)
        keep_new = unpack(keep_new_p, Cp)

        L = len(p["bound_pids"])
        C = len(p["cand_pids"])
        # chain consumers derive the NEXT step's pid list from these
        # masks - store them before any verdict-dependent early return
        # (the device chain already used them regardless of verdicts)
        p["res"] = dict(bound_pids=p["bound_pids"],
                        cand_pids=p["cand_pids"],
                        gate=gate[:L], keep=keep_new[:C])
        n_matches = int(rvalid[:L].sum())
        with self.timer.time("fused/apply"), self.store.lock:
            if n_matches < self.cfg.track_prior_min_matches:
                frame.mp_ids[:] = -1
                return "prior_fail"
            sel = np.where(gate[:L])[0]
            if len(sel) < self.cfg.track_prior_min_good:
                frame.mp_ids[:] = -1
                return "prior_fail"
            # the async mapper may have erased/replaced points since the
            # prep snapshot — follow replace chains, drop dead pids
            # (CheckReplacedMapPointsInLastFrame, src/Tracking.cc:581),
            # fully vectorized (chains are almost always depth 0/1)
            store = self.store

            def live_of(pids: np.ndarray) -> np.ndarray:
                pids = np.asarray(pids, np.int64)
                for _ in range(100):
                    rb = np.asarray(store.mp_replaced_by[pids], np.int64)
                    if not (rb >= 0).any():
                        break
                    pids = np.where(rb >= 0, rb, pids)
                alive = np.asarray(store.mp_valid[pids], bool) \
                    if len(pids) else np.zeros(0, bool)
                return np.where(alive, pids, -1)

            bsel = live_of(p["bound_pids"][sel])
            sel, bsel = sel[bsel >= 0], bsel[bsel >= 0]
            newsel = np.where(keep_new[:C])[0]
            csel = live_of(p["cand_pids"][newsel])
            newsel, csel = newsel[csel >= 0], csel[csel >= 0]
            if len(sel):
                frame.mp_ids[ridx[:L][sel]] = bsel.astype(np.int32)
            if len(newsel):
                frame.mp_ids[r2idx[:C][newsel]] = csel.astype(np.int32)

            # visible: current bindings (unconditional) + in-frustum cand
            vis_cand = p["cand_pids"][visible[:C]]
            vis_cand = vis_cand[np.asarray(
                self.store.mp_valid[vis_cand], bool)]
            vis_pids = np.unique(np.concatenate([vis_cand, bsel]))
            if len(vis_pids):
                self.store.mp_n_visible[vis_pids] = \
                    self.store.mp_n_visible[vis_pids] + 1
            found = frame.mp_ids[frame.mp_ids >= 0].astype(np.int64)
            if len(found):
                self.store.mp_n_found[found] = self.store.mp_n_found[found] + 1

            self.matches_inliers = len(sel) + len(newsel)
        need = (self.cfg.track_local_min_inliers_reloc
                if frame.frame_id - self.last_reloc_frame_id
                < self.cfg.max_frames_between_kf
                else self.cfg.track_local_min_inliers)
        return "ok" if self.matches_inliers >= need else "lost"

    def _track_with_prior(self, frame: Frame) -> bool:
        """TrackWithInitialPose (src/Tracking.cc:1060-1072): match +
        trusted-pose chi2 gate in one fused device call."""
        n, good = self._match_against_last(frame, frame.Tcw, th=7.0,
                                           chi2=self.cfg.chi2_mono)
        if n < self.cfg.track_prior_min_matches:
            frame.mp_ids[:] = -1
            return False
        return good >= self.cfg.track_prior_min_good

    def _track_motion_model(self, frame: Frame) -> bool:
        """Upstream TrackWithMotionModel."""
        Tcw_pred = (self.velocity @ self.last_frame.Tcw).astype(np.float32)
        frame.Tcw = Tcw_pred
        n, _ = self._match_against_last(frame, Tcw_pred, th=15.0)
        if n < 20:
            frame.mp_ids[:] = -1
            n, _ = self._match_against_last(frame, Tcw_pred, th=30.0)
        if n < 20:
            frame.mp_ids[:] = -1
            return False
        good = self._optimize_frame_pose(frame)
        return good >= 10

    def _track_reference_kf(self, frame: Frame) -> bool:
        """TrackWithReferenceKF (src/Tracking.cc:1080-1096): descriptor
        match against the reference KF's map points."""
        if self.ref_kf < 0:
            return False
        kf = self.store.kfs[self.ref_kf].frame
        ids = np.where(kf.mp_ids >= 0)[0]
        if len(ids):
            live = np.asarray(self.store.mp_valid[kf.mp_ids[ids]], bool)
            ids = ids[live].astype(np.int32)
        if len(ids) < self.cfg.track_refkf_min_matches:
            return False
        n_rows = pad_bucket(len(ids))
        pad = n_rows - len(ids)
        valid_rows = np.zeros(n_rows, bool)
        valid_rows[:len(ids)] = True
        # FeatureVector-style node blocking when a vocabulary exists
        # (src/ORBmatcher.cc:222-392); the relocalizer carries the
        # shared PlaceRecognition
        pr = getattr(self.relocalize, "pr", None)
        nk = pr.compute_nodes(kf) if pr is not None else None
        nf = pr.compute_nodes(frame) if nk is not None else None
        node1 = (jnp.asarray(np.pad(nk[ids], (0, pad), constant_values=-1))
                 if nf is not None else None)
        node2 = jnp.asarray(nf) if nf is not None else None
        res = search.search_descriptors(
            jnp.asarray(np.pad(kf.desc[ids], ((0, pad), (0, 0)))),
            jnp.asarray(valid_rows),
            jnp.asarray(np.pad(kf.angle[ids], (0, pad))), node1,
            frame.dev("desc"), frame.dev("valid"),
            frame.dev("angle"), node2,
            ratio=0.7)
        res = res.host()
        rvalid = res.valid[:len(ids)]
        ridx = res.idx[:len(ids)]
        n = 0
        for j in np.where(rvalid)[0]:
            frame.mp_ids[ridx[j]] = kf.mp_ids[ids[j]]
            n += 1
        if n < self.cfg.track_refkf_min_matches:
            frame.mp_ids[:] = -1
            return False
        if self.cfg.pose_prior:
            good = self._pose_chi2_filter(frame)
        else:
            frame.Tcw = self.store.kfs[self.ref_kf].Tcw.copy() \
                if self.velocity is None else frame.Tcw
            good = self._optimize_frame_pose(frame)
        return good >= self.cfg.track_refkf_min_good

    def _do_relocalize(self, frame: Frame) -> bool:
        if self.relocalize is not None and self.relocalize(frame):
            self.last_reloc_frame_id = frame.frame_id
            return True
        return False

    # ------------------------------------------------------------------
    # local map tracking (src/Tracking.cc:619-667, 789-1005)
    # ------------------------------------------------------------------
    def _local_keyframes(self, frame: Frame):
        """UpdateLocalKeyFrames (src/Tracking.cc:890-1005): vote by
        shared observations, add covisible neighbors/children/parent,
        cap at 80."""
        pids = frame.mp_ids[frame.mp_ids >= 0].astype(np.int64)
        if len(pids):
            pids = pids[np.asarray(self.store.mp_valid[pids], bool)]
        if len(pids) == 0:
            return []
        # vectorized observation vote over the obs mirror
        kidm, _, nm = self.store.obs.rows(pids)
        slot_ok = np.arange(kidm.shape[1])[None, :] < nm[:, None]
        voted = kidm[slot_ok]
        if len(voted) == 0:
            return []
        cnt = np.bincount(voted)
        nz = np.nonzero(cnt)[0]
        votes = {int(k): int(cnt[k]) for k in nz}
        local = sorted(votes, key=votes.get, reverse=True)
        local = [k for k in local if self.store.kfs[k].valid]
        out = list(local)
        seen = set(local)
        for kid in local:
            if len(out) >= self.cfg.max_local_keyframes:
                break
            for nb in self.store.get_best_covisibles(kid, 10):
                if nb not in seen:
                    out.append(nb)
                    seen.add(nb)
                    break
            kf = self.store.kfs[kid]
            for ch in kf.children:
                if ch not in seen and self.store.kfs[ch].valid:
                    out.append(ch)
                    seen.add(ch)
                    break
            if kf.parent >= 0 and kf.parent not in seen:
                out.append(kf.parent)
                seen.add(kf.parent)
        self.ref_kf = max(votes, key=votes.get)
        return out[:self.cfg.max_local_keyframes]

    def _track_local_map(self, frame: Frame) -> bool:
        with self.timer.time("lm/select_kfs"):
            local_kfs = self._local_keyframes(frame)
        if not local_kfs:
            return False
        with self.timer.time("lm/select_pts"):
            allp = np.concatenate(
                [self.store.kfs[k].frame.mp_ids for k in local_kfs])
            uniq = np.unique(allp[allp >= 0])
            if len(uniq) == 0:
                return False
            uniq = uniq[np.asarray(
                self.store.mp_valid[uniq.astype(np.int64)], bool)]
        if len(uniq) == 0:
            return False

        # frustum + projection search over points not already bound
        bound_idx = np.where(frame.mp_ids >= 0)[0]
        bound = frame.mp_ids[bound_idx]
        # points already tracked this frame get visible+1 unconditionally
        # (Tracking::SearchLocalPoints calls IncreaseVisible on current
        # bindings before the frustum pass, src/Tracking.cc:795-805)
        if len(bound):
            ub = np.unique(bound.astype(np.int64))
            self.store.mp_n_visible[ub] = self.store.mp_n_visible[ub] + 1
        cand = np.setdiff1d(uniq, bound, assume_unique=False)
        prior = self.cfg.pose_prior
        n_matched_new = 0
        good = 0
        if len(cand):
            with self.timer.time("lm/prep"):
                n = pad_bucket(len(cand), self.cfg.pad_min_cand)
                soa = self.store.points_soa(cand)
                pad = n - len(cand)
                nb = pad_bucket(max(len(bound_idx), 1),
                                self.cfg.pad_min_bound)
                padb = nb - len(bound_idx)
                old_pos = np.zeros((nb, 3), np.float32)
                if len(bound_idx):
                    old_pos[:len(bound_idx)] = np.asarray(
                        self.store.mp_pos[bound.astype(np.int64)])
                old_idx = np.pad(bound_idx, (0, padb)).astype(np.int32)
                old_valid = np.zeros(nb, bool)
                old_valid[:len(bound_idx)] = True
                fx, fy, cx, cy = self._cam_tuple
                th = 3.0 if (frame.frame_id - self.last_reloc_frame_id
                             < self.cfg.max_frames_between_kf) else 1.0
            # ONE fused frustum + search (+ trusted-pose gate) dispatch
            with self.timer.time("lm/dispatch"):
                vis_dev, res, new_gate, old_gate = _frustum_search_fused(
                    jnp.asarray(np.pad(soa["pos"], ((0, pad), (0, 0)))),
                    jnp.asarray(np.pad(soa["normal"], ((0, pad), (0, 0)))),
                    jnp.asarray(np.pad(soa["min_dist"], (0, pad))),
                    jnp.asarray(np.pad(soa["max_dist"], (0, pad))),
                    jnp.asarray(np.pad(soa["valid"], (0, pad))),
                    jnp.asarray(np.pad(soa["desc"], ((0, pad), (0, 0)))),
                    jnp.asarray(frame.Tcw),
                    frame.dev("xy"), frame.dev("octave"),
                    frame.dev("desc"), frame.dev("valid"),
                    jnp.asarray(frame.mp_ids >= 0),
                    jnp.asarray(old_pos), jnp.asarray(old_idx),
                    jnp.asarray(old_valid),
                    self._j_scales, self._j_inv_sigma2,
                    fx, fy, cx, cy, self.bounds,
                    self.cfg.orb.n_levels, self.log_scale, th,
                    self.cfg.chi2_mono if prior else 0.0)
            with self.timer.time("lm/read"):
                visible, ridx, rvalid, g_new, g_old = jax.device_get(
                    (vis_dev, res.idx, res.valid, new_gate, old_gate))
            vis_pids = np.asarray(cand, np.int64)[visible[:len(cand)]]
            if len(vis_pids):
                self.store.mp_n_visible[vis_pids] = \
                    self.store.mp_n_visible[vis_pids] + 1
            keep_new = (rvalid & g_new)[:len(cand)] if prior \
                else rvalid[:len(cand)]
            sel = np.where(keep_new)[0]
            frame.mp_ids[ridx[:len(cand)][sel]] = \
                np.asarray(cand, np.int32)[sel]
            n_matched_new += len(sel)
            if prior:
                bad_old = bound_idx[~g_old[:len(bound_idx)]]
                frame.mp_ids[bad_old] = -1
                good = len(sel) + int(g_old[:len(bound_idx)].sum())

        if prior:
            if not len(cand):
                good = self._pose_chi2_filter(frame)
        else:
            good = self._optimize_frame_pose(frame)

        # found counters for points that survived
        found = frame.mp_ids[(frame.mp_ids >= 0) & ~frame.mp_outlier]
        if len(found):
            self.store.mp_n_found[found.astype(np.int64)] = \
                self.store.mp_n_found[found.astype(np.int64)] + 1

        self.matches_inliers = good
        need = (self.cfg.track_local_min_inliers_reloc
                if frame.frame_id - self.last_reloc_frame_id
                < self.cfg.max_frames_between_kf
                else self.cfg.track_local_min_inliers)
        return good >= need

    # ------------------------------------------------------------------
    # keyframe decision (src/Tracking.cc:681-780)
    # ------------------------------------------------------------------
    def _need_new_keyframe(self, frame: Frame) -> bool:
        if self.ref_kf < 0:
            return False
        n_kfs = self.store.n_valid_keyframes()
        if (frame.frame_id - self.last_reloc_frame_id
                < self.cfg.max_frames_between_kf and n_kfs > self.cfg.max_frames_between_kf):
            return False
        min_obs = 3 if n_kfs > 2 else 2
        ref = self.store.kfs[self.ref_kf].frame
        rp = ref.mp_ids[ref.mp_ids >= 0].astype(np.int64)
        if len(rp):
            rp = rp[np.asarray(self.store.mp_valid[rp], bool)]
        n_ref = int((self.store.obs.n[rp] >= min_obs).sum()) if len(rp) else 0
        # LocalMapping::AcceptKeyFrames gate (src/Tracking.cc:559-615):
        # monocular NEVER inserts while mapping is busy — the feedback
        # loop that throttles KF production to the mapper's rate.
        # Without it an async mapper's queue grows unboundedly and
        # triangulated points land tens of frames behind the camera
        # (measured: queue depth 21, zero fresh points ever tracked).
        idle = self.mapping_idle() if self.mapping_idle else True
        c1a = frame.frame_id >= self.last_kf_frame_id + self.cfg.max_frames_between_kf
        c1b = (frame.frame_id >= self.last_kf_frame_id
               + self.cfg.min_frames_between_kf) and idle
        c2 = (self.matches_inliers < n_ref * self.cfg.ref_ratio
              and self.matches_inliers > 15)
        return (c1a or c1b) and c2 and idle

    def _create_new_keyframe(self, frame: Frame):
        kid = self.store.add_keyframe(frame)
        # bind observations for the KF's tracked points
        bound_pids = []
        for i, pid in enumerate(frame.mp_ids):
            if pid >= 0 and not frame.mp_outlier[i] and self.store.mp_valid[pid]:
                self.store.add_observation(pid, kid, i)
                bound_pids.append(pid)
            elif pid >= 0:
                frame.mp_ids[i] = -1
        # descriptor/normal refresh + covisibility update run at the
        # START of mapping's ProcessNewKeyFrame (src/LocalMapping.cc:
        # 180-197), i.e. on the mapping thread — not here on the
        # camera-rate tracking thread
        self.ref_kf = kid
        self.last_kf_frame_id = frame.frame_id
        if self.on_new_keyframe:
            self.on_new_keyframe(kid)
