"""Relocalization after tracking loss.

Replaces Tracking::Relocalization (src/Tracking.cc:1150-1259).  The
fork's scheme: candidates = BoW relocalization candidates UNION the
recent keyframes (Map::GetLastKeyFrames, src/Map.cc:175, the fork's
addition); per candidate a BoW descriptor match (>= 15), then
verification:

- pose-prior mode (the fork): bind matches and gate them by
  reprojection chi2 against the trusted input pose; success at >= 50
  good matches (src/Tracking.cc:1204-1246).
- estimated mode (upstream ORB-SLAM2): EPnP+RANSAC on the 3D-2D
  matches, LM pose optimization, projection-search escalation when
  inliers land in [10, 50), success at >= 50 inliers (upstream
  Tracking::Relocalization semantics restored; the reference deleted
  this path but BASELINE.json names it a required capability).
"""
from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..matching import search
from ..models.frame import Frame
from ..models.mapstore import MapStore
from ..optim import pnp, pose_opt
from .config import SlamConfig
from .place_recognition import PlaceRecognition
from .tracking import pad_bucket
from ..utils.logging import get_logger

log = get_logger("relocalization")


class Relocalizer:
    def __init__(self, cfg: SlamConfig, store: MapStore,
                 pr: PlaceRecognition):
        self.cfg = cfg
        self.store = store
        self.pr = pr
        cam = cfg.cam
        self._cam_tuple = (float(cam.fx), float(cam.fy),
                           float(cam.cx), float(cam.cy))
        from ..ops.extractor import level_sigma2, pyramid
        self.sigma2 = level_sigma2(cfg.orb)
        self.inv_sigma2 = (1.0 / self.sigma2).astype(np.float32)
        self.scale_factors = pyramid.scale_factors(
            cfg.orb.n_levels, cfg.orb.scale_factor)[0].astype(np.float32)
        self._j_scales = jnp.asarray(self.scale_factors)
        self._rng = np.random.default_rng(1)

    # ------------------------------------------------------------------
    def _candidates(self, frame: Frame) -> List[int]:
        store = self.store
        out: List[int] = []
        bow = self.pr.frame_bow_f(frame)
        if bow is not None:
            out.extend(self.pr.reloc_candidates(bow))
        # recent keyframes by source-frame id (Map::GetLastKeyFrames)
        lo = frame.frame_id - self.cfg.reloc_recent_kf_window
        for kf in store.kfs:
            if kf.valid and lo <= kf.frame.frame_id < frame.frame_id \
                    and kf.kid not in out:
                out.append(kf.kid)
        return out

    def _bow_match(self, kid: int, frame: Frame):
        """SearchByBoW(KF, F): KF's map-point features vs frame features.
        Returns (feat_kf, feat_frame) index arrays."""
        store = self.store
        fk = store.kfs[kid].frame
        ids = np.array([i for i, p in enumerate(fk.mp_ids)
                        if p >= 0 and store.mp_valid[p]], np.int32)
        if len(ids) == 0:
            return ids, ids
        n = pad_bucket(len(ids))
        pad = n - len(ids)
        v = np.zeros(n, bool)
        v[:len(ids)] = True
        # FeatureVector-style node blocking (src/ORBmatcher.cc:222-392)
        # when both sides have vocabulary node ids
        nk = self.pr.compute_nodes(fk)
        nf = self.pr.compute_nodes(frame) if nk is not None else None
        node1 = (jnp.asarray(np.pad(nk[ids], (0, pad), constant_values=-1))
                 if nf is not None else None)
        node2 = jnp.asarray(nf) if nf is not None else None
        res = search.search_descriptors(
            jnp.asarray(np.pad(fk.desc[ids], ((0, pad), (0, 0)))),
            jnp.asarray(v),
            jnp.asarray(np.pad(fk.angle[ids], (0, pad))), node1,
            frame.dev("desc"), frame.dev("valid"),
            frame.dev("angle"), node2,
            ratio=0.75)
        res = res.host()
        rvalid = res.valid[:len(ids)]
        ridx = res.idx[:len(ids)]
        rows = np.where(rvalid)[0]
        return ids[rows], ridx[rows]

    # ------------------------------------------------------------------
    def __call__(self, frame: Frame) -> bool:
        store = self.store
        fx, fy, cx, cy = self._cam_tuple
        for kid in self._candidates(frame):
            feat_kf, feat_fr = self._bow_match(kid, frame)
            if len(feat_kf) < self.cfg.track_refkf_min_matches:
                continue
            fk = store.kfs[kid].frame
            pids = np.array([fk.mp_ids[i] for i in feat_kf], np.int32)
            pts_w = np.asarray(store.mp_pos[pids.astype(np.int64)])
            uv = frame.xy[feat_fr]
            isig = self.inv_sigma2[frame.octave[feat_fr]]

            if self.cfg.pose_prior:
                # trusted-pose verification (src/Tracking.cc:1204-1246)
                pc = pts_w @ frame.Tcw[:3, :3].T + frame.Tcw[:3, 3]
                z = pc[:, 2]
                u = fx * pc[:, 0] / np.maximum(z, 1e-9) + cx
                v = fy * pc[:, 1] / np.maximum(z, 1e-9) + cy
                err2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
                good = (z > 0) & (err2 * isig <= self.cfg.chi2_mono)
                if good.sum() < self.cfg.track_local_min_inliers_reloc:
                    continue
                frame.mp_ids[:] = -1
                for j in np.where(good)[0]:
                    frame.mp_ids[feat_fr[j]] = pids[j]
                log.info("relocalized frame %d against KF %d (%d good)",
                         frame.frame_id, kid, int(good.sum()))
                return True

            # --- estimated mode: EPnP + RANSAC ---
            N = pad_bucket(len(pids), 64)
            padn = N - len(pids)
            H = 128
            samples = self._rng.integers(
                0, len(pids), (H, 4)).astype(np.int32)
            rr = pnp.pnp_ransac(
                jnp.asarray(np.pad(pts_w, ((0, padn), (0, 0)))),
                jnp.asarray(np.pad(uv, ((0, padn), (0, 0)))),
                jnp.asarray(np.pad(isig, (0, padn))),
                jnp.asarray(np.pad(np.ones(len(pids), bool), (0, padn))),
                jnp.asarray(samples), fx, fy, cx, cy, min_inliers=10)
            if not bool(rr.ok):
                continue
            Tcw_h, inl_h = jax.device_get((rr.Tcw, rr.inliers))
            frame.Tcw = Tcw_h
            frame.mp_ids[:] = -1
            inl = inl_h[:len(pids)]
            for j in np.where(inl)[0]:
                frame.mp_ids[feat_fr[j]] = pids[j]

            good = self._pose_optimize(frame)
            if good < 10:
                continue
            if good < self.cfg.track_local_min_inliers_reloc:
                # projection-search escalation (upstream: SearchByProjection
                # with th=10 then pose opt again)
                self._project_kf_points(kid, frame, th=10.0)
                good = self._pose_optimize(frame)
            if good >= self.cfg.track_local_min_inliers_reloc:
                log.info("relocalized frame %d against KF %d via EPnP "
                         "(%d inliers)", frame.frame_id, kid, good)
                return True
        return False

    # ------------------------------------------------------------------
    def _pose_optimize(self, frame: Frame) -> int:
        bound = np.where(frame.mp_ids >= 0)[0]
        if len(bound) < 3:
            return 0
        store = self.store
        pos = np.asarray(store.mp_pos[frame.mp_ids[bound]])
        n = pad_bucket(len(bound))
        pad = n - len(bound)
        fx, fy, cx, cy = self._cam_tuple
        res = pose_opt.optimize_pose(
            jnp.asarray(frame.Tcw),
            jnp.asarray(np.pad(pos, ((0, pad), (0, 0)))),
            jnp.asarray(np.pad(frame.xy[bound], ((0, pad), (0, 0)))),
            jnp.asarray(np.pad(self.inv_sigma2[frame.octave[bound]],
                               (0, pad))),
            jnp.asarray(np.pad(np.ones(len(bound), bool), (0, pad))),
            fx, fy, cx, cy)
        Tcw_h, inl_h = jax.device_get((res.Tcw, res.inliers))
        frame.Tcw = Tcw_h
        inl = inl_h[:len(bound)]
        for j, i in enumerate(bound):
            if not inl[j]:
                frame.mp_ids[i] = -1
        return int(inl.sum())

    def _project_kf_points(self, kid: int, frame: Frame, th: float):
        """SearchByProjection(CurrentFrame, KF, found, th, dist)
        (src/ORBmatcher.cc:1800-1940) — bind additional KF map points by
        projection with the current pose estimate."""
        store = self.store
        fk = store.kfs[kid].frame
        already = set(int(p) for p in frame.mp_ids if p >= 0)
        ids = np.array([i for i, p in enumerate(fk.mp_ids)
                        if p >= 0 and store.mp_valid[p]
                        and p not in already], np.int32)
        if len(ids) == 0:
            return
        pos = np.asarray(store.mp_pos[fk.mp_ids[ids]])
        fx, fy, cx, cy = self._cam_tuple
        pc = pos @ frame.Tcw[:3, :3].T + frame.Tcw[:3, 3]
        z = pc[:, 2]
        uv = np.stack([fx * pc[:, 0] / np.maximum(z, 1e-9) + cx,
                       fy * pc[:, 1] / np.maximum(z, 1e-9) + cy], -1)
        n = pad_bucket(len(ids))
        pad = n - len(ids)
        mp_valid = np.zeros(n, bool)
        mp_valid[:len(ids)] = z > 0
        res = search.search_by_projection_last_frame(
            jnp.asarray(np.pad(uv.astype(np.float32), ((0, pad), (0, 0)))),
            jnp.asarray(np.pad(fk.octave[ids], (0, pad))),
            jnp.asarray(np.pad(fk.desc[ids], ((0, pad), (0, 0)))),
            jnp.asarray(mp_valid),
            jnp.asarray(np.pad(fk.angle[ids], (0, pad))),
            frame.dev("xy"), frame.dev("octave"),
            frame.dev("desc"),
            jnp.asarray(frame.valid & (frame.mp_ids < 0)),
            frame.dev("angle"),
            self._j_scales, th=th)
        res = res.host()
        rvalid = res.valid[:len(ids)]
        ridx = res.idx[:len(ids)]
        for j in np.where(rvalid)[0]:
            frame.mp_ids[ridx[j]] = fk.mp_ids[ids[j]]
