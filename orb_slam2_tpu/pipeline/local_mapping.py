"""Local mapping: map-point culling, triangulation of new points,
fusion, local BA, keyframe culling.

Replaces src/LocalMapping.cc.  Runs synchronously per new keyframe (the
reference's mapping thread made the pipeline nondeterministic; here the
stage order is Process -> MapPointCulling -> CreateNewMapPoints ->
FusePointsInNeighbors -> LocalBA -> KeyFrameCulling, identical to
LocalMapping::Run's sequence, src/LocalMapping.cc:78-158).
"""
from __future__ import annotations

import functools
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..geom import triangulate
from ..matching import search, frustum
from ..models.mapstore import MapStore
from ..optim import points_opt, ba
from .config import SlamConfig
from .tracking import pad_bucket
from ..utils.logging import get_logger, StageTimer

log = get_logger("local_mapping")


def compute_F12(T1: np.ndarray, T2: np.ndarray, K: np.ndarray) -> np.ndarray:
    """Fundamental matrix of (KF1 -> KF2) from their poses
    (LocalMapping::ComputeF12, src/LocalMapping.cc:609-630):
    F12 = K^-T [t12]x R12 K^-1 with T12 = T1 @ T2^-1."""
    T12 = T1 @ np.linalg.inv(T2)
    R12, t12 = T12[:3, :3], T12[:3, 3]
    tx = np.array([
        [0, -t12[2], t12[1]],
        [t12[2], 0, -t12[0]],
        [-t12[1], t12[0], 0],
    ])
    Kinv = np.linalg.inv(K)
    return (Kinv.T @ tx @ R12 @ Kinv).astype(np.float32)


def _fuse_one(pos, normal, min_d, max_d, pvalid, desc,
              Tcw, kxy, koct, kdesc, kvalid,
              scale_factors, fx, fy, cx, cy, bounds,
              n_levels, log_scale, th, ratio):
    fr = frustum.is_in_frustum(
        pos, normal, min_d, max_d, pvalid, Tcw,
        fx, fy, cx, cy, bounds, n_levels, log_scale)
    r = search.search_by_projection_local_map(
        fr.uv, fr.pred_level, fr.view_cos, desc, fr.visible,
        kxy, koct, kdesc, kvalid, jnp.zeros_like(kvalid),
        scale_factors, th=th, ratio=ratio)
    return r.idx, r.dist, r.valid


def _fuse_stack_impl(pos, normal, min_d, max_d, pvalid, desc,
                     Tcw_s, kxy_s, koct_s, kdesc_s, kvalid_s,
                     scale_factors, fx, fy, cx, cy, bounds,
                     n_levels, log_scale, th, ratio):
    def body(args):
        Tcw, kxy, koct, kdesc, kvalid = args
        return _fuse_one(pos, normal, min_d, max_d, pvalid, desc,
                         Tcw, kxy, koct, kdesc, kvalid,
                         scale_factors, fx, fy, cx, cy, bounds,
                         n_levels, log_scale, th, ratio)

    return jax.lax.map(body, (Tcw_s, kxy_s, koct_s, kdesc_s, kvalid_s))


@functools.partial(jax.jit, static_argnames=("cap",))
def _compact_matches(sfeat, cap):
    """(..., P) int16 matched-feature-or--1 -> (flat positions (cap,)
    int32, feature ids (cap,) int16, total match count).

    The fuse stage's result matrix is ~97% -1 sentinels; shipping only
    the matched entries cuts its readback ~8x through the chip link.
    ``count > cap`` (never seen at reference scale) makes the caller
    fall back to fetching the full matrix it still holds."""
    flat = sfeat.reshape(-1)
    matched = flat >= 0
    # nonzero(size=) lowers to cumsum + gather — a full argsort here
    # measured ~40 ms/KF of extra device time (TPU sorts are bitonic)
    rows = jnp.nonzero(matched, size=cap, fill_value=0)[0].astype(jnp.int32)
    return rows, flat[rows], jnp.sum(matched)


def _unpack_mask(packed, n):
    """Device-side np.packbits inverse: (B, n/8) uint8 -> (B, n) bool
    (big-endian bit order, matching numpy's default)."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(packed.shape[0], -1)[:, :n].astype(bool)


def _gather_rows(pt_pos, pt_desc, pt_normal, pt_min, pt_max, pt_alive,
                 rows):
    """Gather a padded row-index vector (-1 = empty slot) from the
    device-resident point store."""
    ok = rows >= 0
    r = jnp.clip(rows, 0, None)
    return (pt_pos[r], pt_normal[r], pt_min[r], pt_max[r],
            ok & pt_alive[r], pt_desc[r])


@functools.partial(jax.jit, static_argnames=(
    "fx", "fy", "cx", "cy", "bounds", "n_levels", "log_scale", "th",
    "ratio"))
def _fuse_stack_rows(pt_pos, pt_desc, pt_normal, pt_min, pt_max,
                     pt_alive, rows,
                     Tcw_s, kxy_s, koct_s, kdesc_s, kvalid_packed,
                     scale_factors, fx, fy, cx, cy, bounds,
                     n_levels, log_scale, th=3.0, ratio=1.0):
    """Forward fuse with the point set gathered ON DEVICE by row index
    from the persistent point store — only the (P,) index vector
    crosses the link instead of a ~65 B/point SoA copy; the per-target
    keypoint validity mask arrives bit-packed (8x smaller)."""
    pos, normal, min_d, max_d, pvalid, desc = _gather_rows(
        pt_pos, pt_desc, pt_normal, pt_min, pt_max, pt_alive, rows)
    kvalid_s = _unpack_mask(kvalid_packed, kxy_s.shape[1])
    idx, dist, valid = _fuse_stack_impl(
        pos, normal, min_d, max_d, pvalid, desc,
        Tcw_s, kxy_s, koct_s, kdesc_s, kvalid_s,
        scale_factors, fx, fy, cx, cy, bounds,
        n_levels, log_scale, th, ratio)
    # compact readback: the TH_LOW(50) merge gate fused in-kernel, ONE
    # int16 (matched feature or -1) per (target, point) — 4.5x fewer
    # bytes over the tunnel than (idx, dist, valid)
    return jnp.where(valid & (dist <= 50), idx, -1).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=(
    "fx", "fy", "cx", "cy", "bounds", "n_levels", "log_scale", "th",
    "ratio"))
def _fuse_reverse_rows(pt_pos, pt_desc, pt_normal, pt_min, pt_max,
                       pt_alive, rows,
                       Tcw, kxy, koct, kdesc, kvalid,
                       scale_factors, fx, fy, cx, cy, bounds,
                       n_levels, log_scale, th=3.0, ratio=1.0):
    """Reverse fuse (neighbors' points into ONE keyframe), point set
    gathered on device by row index."""
    pos, normal, min_d, max_d, pvalid, desc = _gather_rows(
        pt_pos, pt_desc, pt_normal, pt_min, pt_max, pt_alive, rows)
    idx, dist, valid = _fuse_one(pos, normal, min_d, max_d, pvalid, desc,
                                 Tcw, kxy, koct, kdesc, kvalid,
                                 scale_factors, fx, fy, cx, cy, bounds,
                                 n_levels, log_scale, th, ratio)
    return jnp.where(valid & (dist <= 50), idx, -1).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=(
    "fx", "fy", "cx", "cy", "bounds", "n_levels", "log_scale", "th",
    "ratio"))
def _fuse_both_directions(
        own_pos, own_normal, own_min, own_max, own_valid, own_desc,
        Tcw_s, kxy_s, koct_s, kdesc_s, kvalid_s,
        cand_pos, cand_normal, cand_min, cand_max, cand_valid, cand_desc,
        Tcw0, kxy0, koct0, kdesc0, kvalid0,
        scale_factors, fx, fy, cx, cy, bounds,
        n_levels, log_scale, th=3.0, ratio=1.0):
    """Forward fuse (this KF's points into every target) AND reverse
    fuse (the targets' points into this KF) in ONE dispatch
    (src/LocalMapping.cc:548-586 runs them as 20+1 sequential calls)."""
    fwd = _fuse_stack_impl(
        own_pos, own_normal, own_min, own_max, own_valid, own_desc,
        Tcw_s, kxy_s, koct_s, kdesc_s, kvalid_s,
        scale_factors, fx, fy, cx, cy, bounds,
        n_levels, log_scale, th, ratio)
    rev = _fuse_one(cand_pos, cand_normal, cand_min, cand_max,
                    cand_valid, cand_desc,
                    Tcw0, kxy0, koct0, kdesc0, kvalid0,
                    scale_factors, fx, fy, cx, cy, bounds,
                    n_levels, log_scale, th, ratio)
    return fwd, rev


@functools.partial(jax.jit, static_argnames=(
    "fx", "fy", "cx", "cy", "scale_ratio_factor"))
def _triangulate_neighbors_fused(
        xy1, desc1, valid1, octave1, angle1, Tcw1,
        xy2_s, desc2_s, valid2_packed, oct2_s, ang2_s,
        F12_s, epi_s, Tcw2_s, o2_s, nb_valid,
        K, sigma2, scale_factors,
        fx, fy, cx, cy, scale_ratio_factor):
    """The WHOLE CreateNewMapPoints device side in one call:

    1. epipolar-gated BoW-free search against every neighbor
       (lax.map — one distance matrix alive at a time),
    2. first-neighbor-wins pair selection per KF1 row (the reference
       binds a feature to the first neighbor that matches it,
       src/LocalMapping.cc:327-346),
    3. per-pair DLT triangulation with that neighbor's camera,
    4. depth/reprojection/parallax gates + the scale-consistency gate
       (src/LocalMapping.cc:380-470).

    Returns per-KF1-row: (good, X, nb, col)."""
    valid2_s = _unpack_mask(valid2_packed, xy2_s.shape[1])

    def body(args):
        xy2, d2, v2, o2, a2, F, e = args
        r = search.search_for_triangulation(
            xy1, desc1, valid1, octave1, angle1, None,
            xy2, d2, v2, o2, a2, None, F, e, sigma2, scale_factors)
        return r.idx, r.valid

    sidx, svalid = jax.lax.map(
        body, (xy2_s, desc2_s, valid2_s, oct2_s, ang2_s, F12_s, epi_s))
    svalid = svalid & nb_valid[:, None]

    # first matching neighbor per row
    has = jnp.any(svalid, axis=0)                       # (N1,)
    nb = jnp.argmax(svalid, axis=0)                     # (N1,)
    rows = jnp.arange(xy1.shape[0])
    col = sidx[nb, rows]                                # (N1,)

    Tcw2 = Tcw2_s[nb]                                   # (N1, 4, 4)
    uv1 = xy1
    uv2 = xy2_s[nb, col]
    P1 = triangulate.projection_matrix(K, Tcw1)
    P2 = triangulate.projection_matrix(K, Tcw2)
    X = triangulate.triangulate_dlt_pairs(P1, P2, uv1, uv2)
    sig1 = sigma2[octave1]
    col_oct = oct2_s[nb, col]
    sig2 = sigma2[col_oct]
    chk = triangulate.check_triangulation_pairs(
        X, Tcw1, Tcw2, uv1, uv2, fx, fy, cx, cy, sig1, sig2)

    # scale-consistency gate
    o1 = -Tcw1[:3, :3].T @ Tcw1[:3, 3]
    d1 = jnp.linalg.norm(X - o1, axis=-1)
    d2 = jnp.linalg.norm(X - o2_s[nb], axis=-1)
    ratio_dist = d2 / jnp.maximum(d1, 1e-9)
    ratio_oct = scale_factors[octave1] / scale_factors[col_oct]
    good = (has & chk.good
            & (ratio_dist < ratio_oct * scale_ratio_factor)
            & (ratio_dist > ratio_oct / scale_ratio_factor))
    # compact readback: pass/fail bits + small-int indices only.  The
    # accepted points' 3D positions are re-triangulated on the host
    # from the same (uv1, uv2, poses) — the (N1, 3) f32 block was ~70%
    # of this stage's ~280 KB/KF transfer through the chip link.
    return (jnp.packbits(good), nb.astype(jnp.uint8),
            col.astype(jnp.uint16), jnp.packbits(has))


def gather_ba_problem(store: MapStore, kf_ids: List[int], inv_sigma2):
    """Build flat observation arrays for the given keyframes — fully
    vectorized per keyframe (the per-feature Python loop cost ~100 ms
    per keyframe at reference scale).

    Returns (pids, (obs_kf_local, obs_pt_local, obs_uv, obs_isig2,
    (meta_kid, meta_fi))) — the padded-array BA input."""
    li_parts, pid_parts, fi_parts, uv_parts, sig_parts, kid_parts = \
        [], [], [], [], [], []
    for li, kid in enumerate(kf_ids):
        fr = store.kfs[kid].frame
        fi = np.where(fr.mp_ids >= 0)[0]
        if len(fi) == 0:
            continue
        pids_k = fr.mp_ids[fi].astype(np.int64)
        live = np.asarray(store.mp_valid[pids_k], bool)
        fi, pids_k = fi[live], pids_k[live]
        if len(fi) == 0:
            continue
        li_parts.append(np.full(len(fi), li, np.int32))
        pid_parts.append(pids_k)
        fi_parts.append(fi)
        kid_parts.append(np.full(len(fi), kid, np.int64))
        uv_parts.append(fr.xy[fi])
        sig_parts.append(inv_sigma2[fr.octave[fi]])
    if not pid_parts:
        return [], None
    all_pids = np.concatenate(pid_parts)
    uniq, inv = np.unique(all_pids, return_inverse=True)
    obs_kf = np.concatenate(li_parts)
    obs_pt = inv.astype(np.int32)
    obs_uv = np.concatenate(uv_parts).astype(np.float32)
    obs_sig = np.concatenate(sig_parts).astype(np.float32)
    meta = (np.concatenate(kid_parts), np.concatenate(fi_parts))
    return [int(p) for p in uniq], (obs_kf, obs_pt, obs_uv, obs_sig, meta)


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy",
                                             "iters"))
def _sba_step_gathered(points0, obs_pt, kf_poses, xy_stack, oct_stack,
                       inv_sigma2_lvl, obs_cam, obs_fi, n_obs,
                       fx, fy, cx, cy, iters, lam0=None):
    """Structure-BA chunk with measurements gathered on device from the
    keyframes' resident feature arrays.

    Upload compression (the chip sits behind a ~13 MB/s tunnel that the
    camera-rate tracking reads share): index vectors arrive as
    uint16/uint8 and widen here; the validity mask never crosses the
    link at all — padding is a SUFFIX, so it derives from the scalar
    observation count.  The inlier verdicts return bit-packed (8x)."""
    obs_pt = obs_pt.astype(jnp.int32)
    obs_cam = obs_cam.astype(jnp.int32)
    obs_fi = obs_fi.astype(jnp.int32)
    obs_valid = jnp.arange(obs_pt.shape[0], dtype=jnp.int32) < n_obs
    obs_uv = xy_stack[obs_cam, obs_fi]
    obs_sig = inv_sigma2_lvl[oct_stack[obs_cam, obs_fi]]
    res = points_opt.optimize_points(
        points0, obs_pt, kf_poses, obs_uv, obs_sig, obs_valid,
        fx, fy, cx, cy, iters=iters, obs_cam=obs_cam, lam0=lam0)
    return res.points, jnp.packbits(res.obs_inlier), res.lam


def run_structure_ba(store: MapStore, kf_ids: List[int], cfg: SlamConfig,
                     iters: int = 10, timer: StageTimer | None = None):
    """Fixed-pose local BA == independent point refinement
    (src/Optimizer.cc:328-637 with fixedPose=true)."""
    timer = timer or StageTimer()
    from ..ops.extractor import level_sigma2
    inv_sigma2 = (1.0 / level_sigma2(cfg.orb)).astype(np.float32)
    with timer.time("sba/gather"):
        pids, packed = gather_ba_problem(store, kf_ids, inv_sigma2)
    if packed is None or len(pids) == 0:
        return
    obs_kf, obs_pt, obs_uv, obs_sig, meta = packed
    points0 = np.asarray(store.mp_pos[np.asarray(pids, np.int64)])
    poses = np.stack([store.kfs[k].Tcw for k in kf_ids])

    O = pad_bucket(len(obs_kf), cfg.pad_min_obs)
    P = pad_bucket(len(pids), cfg.pad_min_pts)
    padO = O - len(obs_kf)
    Kp = pad_bucket(len(kf_ids), 32)
    poses_p = np.concatenate(
        [poses, np.broadcast_to(np.eye(4, dtype=np.float32),
                                (Kp - len(kf_ids), 4, 4))])
    fx, fy, cx, cy = (float(cfg.cam.fx), float(cfg.cam.fy),
                      float(cfg.cam.cx), float(cfg.cam.cy))
    meta_kid, meta_fi = meta
    n2 = max(store.kfs[k].frame.n for k in kf_ids)
    with timer.time("sba/device"), store.unlocked():
        # LM iterations run in SHORT chunks (one dispatch each, point
        # state stays on device between chunks) so the camera-rate
        # tracking dispatch can slot into the device queue between
        # them — one long fori_loop kernel would block the queue for
        # its whole duration.  Chunk round trips cost the MAPPING
        # thread only.  Measurements (uv) and information (per-octave
        # sigma) gather ON DEVICE from the keyframes' resident feature
        # arrays — only index vectors cross the link.
        xy_stack = jnp.stack(
            [store.kfs[k].frame.dev_padded("xy", n2) for k in kf_ids]
            + [store.kfs[kf_ids[0]].frame.dev_padded("xy", n2)]
            * (Kp - len(kf_ids)))
        oct_stack = jnp.stack(
            [store.kfs[k].frame.dev_padded("octave", n2) for k in kf_ids]
            + [store.kfs[kf_ids[0]].frame.dev_padded("octave", n2)]
            * (Kp - len(kf_ids)))
        # compact index dtypes: local point/feature indices fit uint16
        # (P <= 65536, feature rows < 65536) and the camera index fits
        # uint8 when the local window pads to <= 256 keyframes — the
        # upload halves/quarters.  Wider fallbacks keep correctness for
        # oversized problems (one extra compiled dtype variant, only if
        # ever hit).
        pt_dt = np.uint16 if P <= 65536 else np.int32
        cam_dt = np.uint8 if Kp <= 256 else np.int32
        pts_dev = jnp.asarray(np.pad(points0, ((0, P - len(pids)), (0, 0))))
        poses_dev = jnp.asarray(poses_p.astype(np.float32))
        obs_fi_dev = jnp.asarray(np.pad(meta_fi.astype(np.uint16),
                                        (0, padO)))
        obs_cam_dev = jnp.asarray(np.pad(obs_kf.astype(cam_dt), (0, padO)))
        isig_dev = jnp.asarray(inv_sigma2)
        obs_pt_dev = jnp.asarray(np.pad(obs_pt.astype(pt_dt), (0, padO)))
        n_obs_dev = jnp.asarray(np.int32(len(obs_kf)))
        # chunk of 5: each LM chunk re-linearizes once on entry, so
        # fewer/larger chunks waste less (the one-assemble LM carries
        # H/g only within a dispatch); ~22 ms of device time per chunk
        # still lets the camera-rate tracking dispatch interleave
        chunk = 5
        done = 0
        pts_out = inl_packed = None
        # explicit initial damping: one compiled variant (lam0=None
        # would trace a second specialization for the first chunk)
        lam_dev = jnp.full((P,), 1e-3, jnp.float32)
        while done < iters:
            it = min(chunk, iters - done)
            # lam threads between chunks so the chunked solve matches a
            # single-call LM (a reset would re-try rejected steps)
            pts_out, inl_packed, lam_dev = _sba_step_gathered(
                pts_dev, obs_pt_dev, poses_dev, xy_stack, oct_stack,
                isig_dev, obs_cam_dev, obs_fi_dev, n_obs_dev,
                fx, fy, cx, cy, it, lam0=lam_dev)
            pts_dev = pts_out
            done += it
        new_pts_all, inl_packed_h = jax.device_get((pts_out, inl_packed))
    with timer.time("sba/apply"):
        new_pts = new_pts_all[:len(pids)]
        inl = np.unpackbits(inl_packed_h)[:len(obs_kf)].astype(bool)
        store.mp_pos[np.asarray(pids, np.int64)] = new_pts
        # erase outlier observations (the reference's post-BA edge
        # removal, src/Optimizer.cc:560-600)
        meta_kid, meta_fi = meta
        for o in np.where(~inl)[0]:
            pid = pids[obs_pt[o]]
            if store.mp_valid[pid]:
                store.erase_observation(pid, int(meta_kid[o]))
        store.update_points_batch(pids)


def run_local_ba(store: MapStore, center_kf: int, cfg: SlamConfig,
                 fixed_pose: bool = False, iters: int = 10,
                 timer: StageTimer | None = None):
    """LocalBundleAdjustment (src/Optimizer.cc:328-637): local KFs =
    center + its covisibles; fixed KFs = all other observers of the
    local points (plus KF 0)."""
    local = [center_kf] + [k for k in store.covis[center_kf]
                           if store.kfs[k].valid]
    if fixed_pose:
        run_structure_ba(store, local, cfg, iters=iters, timer=timer)
        return
    local_set = set(local)
    # points seen by local KFs
    pid_set = {}
    for kid in local:
        for pid in store.kfs[kid].frame.mp_ids:
            if pid >= 0 and store.mp_valid[pid] and pid not in pid_set:
                pid_set[pid] = len(pid_set)
    if not pid_set:
        return
    # fixed observers — vectorized over the obs mirror
    pid_arr = np.fromiter(pid_set.keys(), np.int64, len(pid_set))
    kidm, fim, nm = store.obs.rows(pid_arr)
    slot_ok = np.arange(kidm.shape[1])[None, :] < nm[:, None]
    observers = np.unique(kidm[slot_ok])
    fixed = [int(k) for k in observers
             if k not in local_set and store.kfs[k].valid]
    all_kfs = local + fixed
    kf_index = {k: i for i, k in enumerate(all_kfs)}
    fixed_mask = np.zeros(len(all_kfs), bool)
    for k in fixed:
        fixed_mask[kf_index[k]] = True
    if 0 in kf_index:
        fixed_mask[kf_index[0]] = True  # gauge
    if 1 in kf_index:
        fixed_mask[kf_index[1]] = True  # init pair holds the scale gauge
    if not fixed_mask.any():
        fixed_mask[0] = True

    from ..ops.extractor import level_sigma2
    inv_sigma2 = (1.0 / level_sigma2(cfg.orb)).astype(np.float32)

    # flatten (kf_local, pt_local, kid, fi) from the mirror, vectorized
    max_kid = max(kf_index)
    kid2local = np.full(max_kid + 2, -1, np.int64)
    for k, i in kf_index.items():
        kid2local[k] = i
    rows, cols = np.nonzero(slot_ok)
    ok_kid = kidm[rows, cols]
    in_graph = (ok_kid <= max_kid) & (kid2local[np.clip(ok_kid, 0, max_kid)] >= 0)
    rows, cols = rows[in_graph], cols[in_graph]
    o_kid = kidm[rows, cols]
    o_fi = fim[rows, cols]
    obs_kf = kid2local[o_kid].astype(np.int32)
    obs_pt = rows.astype(np.int32)      # pid_set insertion order == rows
    if len(obs_kf) < 10:
        return
    obs_uv = np.empty((len(obs_kf), 2), np.float32)
    oct_flat = np.empty(len(obs_kf), np.int32)
    for k in np.unique(o_kid):
        m = o_kid == k
        fr = store.kfs[k].frame
        obs_uv[m] = fr.xy[o_fi[m]]
        oct_flat[m] = fr.octave[o_fi[m]]
    obs_sig = inv_sigma2[oct_flat]
    n_obs = len(obs_kf)

    pids = list(pid_set.keys())
    poses = np.stack([store.kfs[k].Tcw for k in all_kfs])
    points0 = np.asarray(store.mp_pos[np.asarray(pids, np.int64)])

    K = pad_bucket(len(all_kfs), 8)
    P = pad_bucket(len(pids))
    O = pad_bucket(n_obs)
    fx, fy, cx, cy = (float(cfg.cam.fx), float(cfg.cam.fy),
                      float(cfg.cam.cx), float(cfg.cam.cy))
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), (K - len(all_kfs), 4, 4))
    with store.unlocked():
        res = ba.bundle_adjust(
            jnp.asarray(np.concatenate([poses, eye])),
            jnp.asarray(np.pad(points0, ((0, P - len(pids)), (0, 0)))),
            jnp.asarray(np.pad(obs_kf, (0, O - n_obs))),
            jnp.asarray(np.pad(obs_pt, (0, O - n_obs))),
            jnp.asarray(np.pad(obs_uv, ((0, O - n_obs), (0, 0)))),
            jnp.asarray(np.pad(obs_sig, (0, O - n_obs))),
            jnp.asarray(np.pad(np.ones(n_obs, bool), (0, O - n_obs))),
            jnp.asarray(np.pad(fixed_mask, (0, K - len(all_kfs)),
                               constant_values=True)),
            fx, fy, cx, cy, iters=iters, cg_iters=20)
        new_poses, new_pts, inl = jax.device_get(
            (res.cam_Tcw, res.points, res.obs_inlier))
    for i, kid in enumerate(all_kfs):
        if not fixed_mask[i]:
            store.set_kf_pose(kid, new_poses[i])
    for j, p in enumerate(pids):
        store.mp_pos[p] = new_pts[j]
    for o in np.where(~inl[:n_obs])[0]:
        kid, fi = int(o_kid[o]), int(o_fi[o])
        pid = pids[obs_pt[o]]
        if store.mp_valid[pid]:
            store.erase_observation(pid, kid)
    store.update_points_batch(pids)


class LocalMapper:
    def __init__(self, cfg: SlamConfig, store: MapStore):
        self.cfg = cfg
        self.store = store
        self.recent_points: List[int] = []
        self._fuse_touched: List[int] = []  # merge winners awaiting the
        #                                     batched refresh (see
        #                                     _fuse_neighbors)
        self.timer = StageTimer()
        self.on_keyframe_processed = None  # wired to loop closing
        scale, _, sigma2, _ = __import__(
            "orb_slam2_tpu.ops.pyramid", fromlist=["scale_factors"]
        ).scale_factors(cfg.orb.n_levels, cfg.orb.scale_factor)
        self.scale_factors = scale
        self.sigma2 = sigma2
        self.inv_sigma2 = (1.0 / sigma2).astype(np.float32)
        self._j_scales = jnp.asarray(self.scale_factors.astype(np.float32))
        self._j_sigma2 = jnp.asarray(self.sigma2.astype(np.float32))
        self.log_scale = float(np.log(cfg.orb.scale_factor))

    # ------------------------------------------------------------------
    def process_keyframe(self, kid: int, queue_pressure: bool = False):
        """One LocalMapping::Run iteration (src/LocalMapping.cc:78-158).

        Holds the map lock (Map::mMutexUpdateMap equivalent) for host
        bookkeeping; each heavy stage drops it around its device
        dispatch+read window so a concurrent tracking thread only ever
        waits on short host sections.

        ``queue_pressure``: more keyframes are already waiting — skip
        fusion and local BA for this one, exactly like the reference's
        mapping thread under load (SearchInNeighbors runs only
        ``if(!CheckNewKeyFrames())``, src/LocalMapping.cc:111, and a new
        insertion aborts the running local BA via
        mbAbortLocalBARequested, src/LocalMapping.cc:122-124, 161-167).
        The deferred work is covered by the next quiet keyframe."""
        with self.store.lock:
            self._process_keyframe_locked(kid, queue_pressure)

    def _process_keyframe_locked(self, kid: int,
                                 queue_pressure: bool = False):
        store = self.store
        log.info("KF %d begin (pressure=%s, alloc=%d)", kid,
                 queue_pressure, store.n_points())
        # ProcessNewKeyFrame (src/LocalMapping.cc:180-197): refresh the
        # bound points' descriptors/normals and the covisibility graph
        # here on the mapping thread (tracking only records bindings)
        with self.timer.time("mapping/process_kf"):
            f = store.kfs[kid].frame
            with self.timer.time("pkf/bound"):
                bound = f.mp_ids[f.mp_ids >= 0].astype(np.int64)
                if len(bound):
                    bound = bound[np.asarray(store.mp_valid[bound], bool)]
                bound = bound.tolist()
            with self.timer.time("pkf/upb"):
                store.update_points_batch(bound)
            with self.timer.time("pkf/conn"):
                store.update_connections(kid)
        n0 = store.n_valid_points()
        store.yield_lock()  # stage boundary: let the tracker in
        with self.timer.time("mapping/cull_points"):
            self._cull_map_points(kid)
        store.yield_lock()
        with self.timer.time("mapping/triangulate"):
            self._create_new_map_points(kid)
        n1 = store.n_valid_points()
        store.yield_lock()
        if not queue_pressure:
            with self.timer.time("mapping/fuse"):
                self._fuse_neighbors(kid)
            store.yield_lock()
            if store.n_valid_keyframes() > 2:
                with self.timer.time("mapping/local_ba"):
                    run_local_ba(store, kid, self.cfg,
                                 fixed_pose=self.cfg.pose_prior,
                                 iters=self.cfg.local_ba_iters,
                                 timer=self.timer)
            store.yield_lock()
        with self.timer.time("mapping/cull_keyframes"):
            self._cull_keyframes(kid)
        store.yield_lock()
        # glog-equivalent of src/LocalMapping.cc:101-103
        log.info("KF %d: +%d map points (total %d), %d keyframes",
                 kid, n1 - n0, store.n_valid_points(),
                 store.n_valid_keyframes())
        if self.on_keyframe_processed:
            with self.timer.time("mapping/loop_closing"):
                self.on_keyframe_processed(kid)

    # ------------------------------------------------------------------
    def _cull_map_points(self, kid: int):
        """MapPointCulling (src/LocalMapping.cc:206-248)."""
        store = self.store
        keep = []
        for pid in self.recent_points:
            if not store.mp_valid[pid]:
                continue
            age = kid - store.mp_first_kf[pid]
            if store.matched_ratio(pid) < self.cfg.mp_cull_min_ratio:
                store.erase_point(pid)
            elif age >= 2 and len(store.mp_obs[pid]) <= 2:
                store.erase_point(pid)
            elif age >= 3:
                pass  # graduated
            else:
                keep.append(pid)
        self.recent_points = keep

    # ------------------------------------------------------------------
    def _create_new_map_points(self, kid: int):
        """CreateNewMapPoints (src/LocalMapping.cc:255-495).

        The reference loops neighbor keyframes sequentially (20 searches,
        20 triangulations).  Here ALL neighbor searches run in ONE device
        call (lax.map over a stacked neighbor batch — sequential on
        device so only one distance matrix lives at a time) and all
        candidate pairs triangulate in ONE per-pair-camera DLT call.
        Through the TPU tunnel this cuts ~100 round trips to ~4."""
        store = self.store
        cfg = self.cfg
        kf1 = store.kfs[kid]
        K = np.asarray(cfg.cam.K)
        o1 = store.kf_center(kid)
        neighbors = store.get_best_covisibles(kid, cfg.triangulation_neighbors)

        f1 = kf1.frame
        unbound1 = (f1.mp_ids < 0) & f1.valid
        fx, fy, cx, cy = (float(cfg.cam.fx), float(cfg.cam.fy),
                          float(cfg.cam.cx), float(cfg.cam.cy))

        # --- eligible neighbors + F12/epipole, all host math ---
        with self.timer.time("tri/prep_host"):
            elig = []
            for kid2 in neighbors:
                kf2 = store.kfs[kid2]
                o2 = store.kf_center(kid2)
                baseline = float(np.linalg.norm(o1 - o2))
                med_depth = store.scene_median_depth(kid2)
                if med_depth <= 0 or baseline / med_depth < cfg.min_baseline_depth_ratio:
                    continue
                F12 = compute_F12(kf1.Tcw, kf2.Tcw, K)
                pc = kf2.Tcw[:3, :3] @ o1 + kf2.Tcw[:3, 3]
                z = pc[2] if abs(pc[2]) > 1e-9 else 1e-9
                uv_e = np.array([fx * pc[0] / z + cx, fy * pc[1] / z + cy],
                                np.float32)
                elig.append((kid2, F12, uv_e, o2))
            if not elig:
                store.update_connections(kid)
                return

            # --- stack neighbor frames ON DEVICE (cached padded copies):
            # only the small dynamic validity masks cross the tunnel ---
            B = len(elig)
            CH = 5  # neighbors per kernel (short kernels so the
            #         camera-rate tracking dispatch can interleave)
            n_ch = (B + CH - 1) // CH
            n2 = max(store.kfs[e[0]].frame.n for e in elig)
            frames2 = [store.kfs[e[0]].frame for e in elig]

        # the device side (search -> select -> DLT -> gates) runs as
        # n_ch short kernels dispatched back-to-back + ONE batched
        # read; the map lock is dropped for the whole window.  Chunks
        # preserve neighbor order, so first-chunk-with-a-match ==
        # first-matching-neighbor (the reference's binding rule).
        with self.timer.time("tri/device"), store.unlocked():
            parts = []
            for ci in range(n_ch):
                sub = list(range(ci * CH, min((ci + 1) * CH, B)))
                stack_list = [frames2[b] for b in sub]
                stack_list += [stack_list[0]] * (CH - len(sub))
                valid2 = np.zeros((CH, n2), bool)
                F12_s = np.tile(np.eye(3, dtype=np.float32), (CH, 1, 1))
                epi_s = np.zeros((CH, 2), np.float32)
                Tcw2_s = np.tile(np.eye(4, dtype=np.float32), (CH, 1, 1))
                o2_s = np.zeros((CH, 3), np.float32)
                nb_valid = np.zeros(CH, bool)
                for j, b in enumerate(sub):
                    kid2, F12, uv_e, o2 = elig[b]
                    f2 = frames2[b]
                    valid2[j, :f2.n] = (f2.mp_ids < 0) & f2.valid
                    F12_s[j] = F12
                    epi_s[j] = uv_e
                    Tcw2_s[j] = store.kfs[kid2].Tcw
                    o2_s[j] = o2
                    nb_valid[j] = True
                parts.append(_triangulate_neighbors_fused(
                    f1.dev("xy"), f1.dev("desc"), jnp.asarray(unbound1),
                    f1.dev("octave"), f1.dev("angle"),
                    jnp.asarray(kf1.Tcw),
                    jnp.stack([fr.dev_padded("xy", n2)
                               for fr in stack_list]),
                    jnp.stack([fr.dev_padded("desc", n2)
                               for fr in stack_list]),
                    jnp.asarray(np.packbits(valid2, axis=1)),
                    jnp.stack([fr.dev_padded("octave", n2)
                               for fr in stack_list]),
                    jnp.stack([fr.dev_padded("angle", n2)
                               for fr in stack_list]),
                    jnp.asarray(F12_s), jnp.asarray(epi_s),
                    jnp.asarray(Tcw2_s),
                    jnp.asarray(o2_s), jnp.asarray(nb_valid),
                    jnp.asarray(K.astype(np.float32)), self._j_sigma2,
                    self._j_scales,
                    fx, fy, cx, cy, float(1.5 * cfg.orb.scale_factor)))
            out = jax.device_get(parts)
            # merge: first chunk with a match wins (neighbor order)
            N1 = f1.n

            def unpack(ch):
                gb, nb_c, col_c, hb = ch
                return (np.unpackbits(gb)[:N1].astype(bool),
                        np.asarray(nb_c, np.int64),
                        np.asarray(col_c, np.int64),
                        np.unpackbits(hb)[:N1].astype(bool))

            good, nb, col, claimed = unpack(out[0])
            for ci in range(1, n_ch):
                g2, nb2, col2, h2 = unpack(out[ci])
                fresh = ~claimed & h2
                good[fresh] = g2[fresh]
                nb[fresh] = nb2[fresh] + ci * CH
                col[fresh] = col2[fresh]
                claimed |= h2

        with self.timer.time("tri/apply"):
            rows = np.where(good)[0]
            elig_kids = np.array([e[0] for e in elig], np.int32)
            kid2_arr = elig_kids[nb[rows]]
            cols = col[rows].astype(np.int32)
            # re-triangulate the accepted matches on host (f64 DLT; the
            # kernel already applied every gate to ITS triangulation).
            # Grouped by neighbor so the per-row work is numpy-batched.
            P1m = np.asarray(K.astype(np.float64) @ kf1.Tcw[:3, :4],
                             np.float32)
            X = np.zeros((N1, 3), np.float32)
            if len(rows):
                P2m = np.empty((len(rows), 3, 4), np.float32)
                uv2m = np.empty((len(rows), 2), np.float32)
                for k in np.unique(kid2_arr):
                    m = kid2_arr == k
                    kf2 = store.kfs[int(k)]
                    P2m[m] = (K.astype(np.float64)
                              @ kf2.Tcw[:3, :4]).astype(np.float32)
                    uv2m[m] = kf2.frame.xy[cols[m]]
                X[rows] = triangulate.triangulate_dlt_pairs_np(
                    P1m, P2m, f1.xy[rows], uv2m)
            # claim semantics of the old sequential loop: skip rows
            # whose f1 feature is already bound, whose target feature
            # is already bound, or whose (kid2, col) slot an earlier
            # row of THIS batch already claimed
            keep = f1.mp_ids[rows] < 0
            for k in np.unique(kid2_arr):
                m = kid2_arr == k
                f2ids = store.kfs[int(k)].frame.mp_ids
                keep_m = keep[m] & (f2ids[cols[m]] < 0)
                first = np.zeros(int(m.sum()), bool)
                first[np.unique(cols[m], return_index=True)[1]] = True
                keep[m] = keep_m & first
            rows, kid2_arr, cols = rows[keep], kid2_arr[keep], cols[keep]
            new_pids = store.add_points_batch(
                pos=X[rows], desc=f1.desc[rows], kf1=kid, fi1=rows,
                kf2=kid2_arr, fi2=cols, first_frame=f1.frame_id)
            self.recent_points.extend(new_pids.tolist())
        with self.timer.time("tri/update_points"):
            store.update_points_batch(new_pids.tolist())
        with self.timer.time("tri/update_conn"):
            store.update_connections(kid)

    # ------------------------------------------------------------------
    def _fuse_neighbors(self, kid: int):
        """FusePointsInNeighbors (src/LocalMapping.cc:501-606): project
        neighbors' map points into this KF and vice versa, merging
        duplicates."""
        store = self.store
        with self.timer.time("fuse/collect"):
            targets = store.get_best_covisibles(kid, 20)
            second = []
            for t in targets:
                for t2 in store.get_best_covisibles(t, 5):
                    if t2 != kid and t2 not in targets and t2 not in second:
                        second.append(t2)
            # fixed target-stack height: 24 covers the reference's 20
            # first-ring + second-ring picks; capping keeps ONE compiled
            # fuse shape for the whole run
            all_targets = (targets + second)[:24]

            # forward (this KF's points into each neighbor) and reverse
            # (neighbors' points into this KF) in ONE device call — the
            # reference runs them as 20+1 sequential searches
            # (src/LocalMapping.cc:548-586); candidate collection is
            # vectorized numpy over the obs mirror
            f0 = store.kfs[kid].frame
            own_arr = np.unique(f0.mp_ids[f0.mp_ids >= 0]).astype(np.int64)
            if len(own_arr):
                own_arr = own_arr[np.asarray(store.mp_valid[own_arr], bool)]
            if all_targets:
                allp = np.concatenate(
                    [store.kfs[t].frame.mp_ids for t in all_targets])
                allp = np.unique(allp[allp >= 0]).astype(np.int64)
                if len(allp):
                    allp = allp[np.asarray(store.mp_valid[allp], bool)]
                cand_arr = np.setdiff1d(allp, own_arr, assume_unique=True)
            else:
                cand_arr = np.zeros(0, np.int64)
            if len(cand_arr):
                kidm, _, nm = store.obs.rows(cand_arr)
                slot_ok = np.arange(kidm.shape[1])[None, :] < nm[:, None]
                has_kid = ((kidm == kid) & slot_ok).any(1)
                cand_arr = cand_arr[~has_kid]
            own = own_arr.tolist()
            cand = cand_arr.tolist()
        self._fuse_touched = []
        # ONE fuse variant, ever: empty own/cand pad to -1 rows that the
        # kernels mask out, so no alternate code path can compile a
        # second kernel mid-run (each stray variant costs a ~5 s remote
        # compile inside the measured window)
        if all_targets and (own or cand):
            self._fuse_combined(kid, all_targets, own, cand)
        # refresh (batched: one native medoid call + segment sums) —
        # covers this KF's bindings AND every merge winner, so the
        # per-replace refresh inside the loop is skipped entirely
        with self.timer.time("fuse/update_points"):
            ids = store.kfs[kid].frame.mp_ids
            store.update_points_batch(
                np.unique(ids[ids >= 0]).tolist() + self._fuse_touched)
        with self.timer.time("fuse/update_conn"):
            store.update_connections(kid)

    def _fuse_combined(self, kid: int, target_kids: List[int],
                       own: List[int], cand: List[int]):
        """Both fuse directions in one dispatch + one batched read."""
        store = self.store
        cfg = self.cfg
        f0 = store.kfs[kid].frame

        P1 = pad_bucket(len(own), cfg.pad_min_bound)
        own_rows = np.pad(np.asarray(own, np.int32), (0, P1 - len(own)),
                          constant_values=-1)
        P2 = pad_bucket(len(cand), cfg.pad_min_cand)
        cand_rows = np.pad(np.asarray(cand, np.int32),
                           (0, P2 - len(cand)), constant_values=-1)
        with self.timer.time("fuse/sync"):
            store.dev_points.sync(store)
            dp_args = store.dev_points.snapshot()

        T = len(target_kids)
        CH = 8  # targets per kernel: short kernels let the camera-rate
        #         tracking dispatch interleave in the device queue
        n_ch = (T + CH - 1) // CH
        n2 = max(store.kfs[t].frame.n for t in target_kids)
        frames_t = [store.kfs[t].frame for t in target_kids]

        fx, fy, cx, cy = (float(cfg.cam.fx), float(cfg.cam.fy),
                          float(cfg.cam.cx), float(cfg.cam.cy))
        from ..geom.camera import undistorted_bounds
        bounds = undistorted_bounds(cfg.cam)

        with self.timer.time("fuse/device"), store.unlocked():
            own_rows_dev = jnp.asarray(own_rows)
            fwd_parts = []
            for ci in range(n_ch):
                sub = frames_t[ci * CH:(ci + 1) * CH]
                subk = target_kids[ci * CH:(ci + 1) * CH]
                stack_list = sub + [sub[0]] * (CH - len(sub))
                Tcw_s = np.tile(np.eye(4, dtype=np.float32), (CH, 1, 1))
                kvalid = np.zeros((CH, n2), bool)
                for b, t in enumerate(subk):
                    Tcw_s[b] = store.kfs[t].Tcw
                    kvalid[b, :sub[b].n] = sub[b].valid
                fwd_parts.append(_fuse_stack_rows(
                    *dp_args, own_rows_dev,
                    jnp.asarray(Tcw_s),
                    jnp.stack([fr.dev_padded("xy", n2)
                               for fr in stack_list]),
                    jnp.stack([fr.dev_padded("octave", n2)
                               for fr in stack_list]),
                    jnp.stack([fr.dev_padded("desc", n2)
                               for fr in stack_list]),
                    jnp.asarray(np.packbits(kvalid, axis=1)),
                    self._j_scales, fx, fy, cx, cy, bounds,
                    cfg.orb.n_levels, self.log_scale, th=3.0, ratio=1.0))
            rev_dev = _fuse_reverse_rows(
                *dp_args, jnp.asarray(cand_rows),
                jnp.asarray(store.kfs[kid].Tcw),
                f0.dev("xy"), f0.dev("octave"), f0.dev("desc"),
                f0.dev("valid"),
                self._j_scales, fx, fy, cx, cy, bounds,
                cfg.orb.n_levels, self.log_scale, th=3.0, ratio=1.0)
            # ONE batched read of the COMPACTED match lists (plus the
            # rare full-matrix fallback when a chunk overflows the cap)
            FUSE_CAP = 2048
            comp = [_compact_matches(p, FUSE_CAP) for p in fwd_parts]
            rev_comp = _compact_matches(rev_dev, FUSE_CAP)
            with self.timer.time("fuse/read"):
                comp_h, rev_h = jax.device_get((comp, rev_comp))

            def decode(shape, comp_hc, full_handle):
                rows_c, feats_c, count = comp_hc
                count = int(count)
                if count > FUSE_CAP:           # overflow: fetch it all
                    return np.asarray(jax.device_get(full_handle),
                                      np.int16).reshape(shape)
                dense = np.full(int(np.prod(shape)), -1, np.int16)
                dense[rows_c[:count]] = feats_c[:count]
                return dense.reshape(shape)

            parts = [decode((CH, P1), c, p)
                     for c, p in zip(comp_h, fwd_parts)]
            rev_feat = decode((P2,), rev_h, rev_dev)
            sfeat = np.concatenate(parts)
        with self.timer.time("fuse/apply"):
            for b, t in enumerate(target_kids):
                self._apply_fuse(t, own, sfeat[b])
                store.yield_lock()
            self._apply_fuse(kid, cand, rev_feat)

    def _apply_fuse(self, kid: int, pids: List[int], feat16):
        """Shared fuse decision loop (ORBmatcher::Fuse tail,
        src/ORBmatcher.cc:1150-1216): replace or add observations.
        ``feat16``: per-point matched feature index or -1 (validity and
        the TH_LOW merge gate are already fused in-kernel).  Cheap
        liveness gates are vectorized; only rows that actually merge or
        bind reach the per-item graph mutation."""
        store = self.store
        f = store.kfs[kid].frame
        n = len(pids)
        pid_arr = np.asarray(pids, np.int64)
        ridx = np.asarray(feat16, np.int64)
        rows = np.where(ridx[:n] >= 0)[0]
        if len(rows) == 0:
            return
        alive = np.asarray(store.mp_valid[pid_arr[rows]], bool)
        rows = rows[alive]
        if len(rows) == 0:
            return
        # "already observes this KF" test vectorized over the mirror
        kidm, _, nm = store.obs.rows(pid_arr[rows])
        slot_ok = np.arange(kidm.shape[1])[None, :] < nm[:, None]
        has_kid = ((kidm == kid) & slot_ok).any(1)
        rows = rows[~has_kid]
        feats = np.asarray(ridx[:n], np.int64)[rows]
        for j, feat in zip(rows, feats):
            pid = int(pid_arr[j])
            if kid in store.mp_obs[pid]:
                continue  # bound earlier in this very loop
            # re-read the binding per iteration: replace_point earlier in
            # this loop can rewrite THIS keyframe's mp_ids (the reference
            # re-reads too, src/ORBmatcher.cc:1150-1216); a snapshot from
            # before the loop would let two live points claim one slot
            ex = f.mp_ids[int(feat)]
            if ex >= 0 and store.mp_valid[ex]:
                if ex == pid:
                    continue
                # keep the point with more observations; refresh of the
                # winner is deferred to the caller's batched update
                if len(store.mp_obs[ex]) > len(store.mp_obs[pid]):
                    store.replace_point(pid, int(ex), refresh=False)
                    self._fuse_touched.append(int(ex))
                else:
                    store.replace_point(int(ex), pid, refresh=False)
                    self._fuse_touched.append(pid)
            else:
                store.add_observation(pid, kid, int(feat))
                self._fuse_touched.append(pid)

    # ------------------------------------------------------------------
    def _cull_keyframes(self, kid: int):
        """KeyFrameCulling (src/LocalMapping.cc:688-772): erase local
        covisible KFs where >= 90% of points are seen >= 3 times at the
        same or finer scale elsewhere.

        Point-major screen: covisible candidates share most of their
        points, so each point's per-octave observation histogram is
        computed ONCE (one obs-mirror gather over the union) and every
        candidate is scored against cumulative counts — ~#candidates x
        less array work than the old per-candidate loop.  Candidates
        that pass the screen are re-verified sequentially against live
        state before erasure (an erase removes observations, so the
        reference's in-order loop can keep a later candidate the batch
        screen would cull)."""
        store = self.store
        cands = [c for c in store.get_best_covisibles(kid, 10 ** 9)
                 if c != 0 and store.kfs[c].valid]
        if not cands:
            return
        # gather each candidate's live bound features
        per_cand = []          # (cand, fi, pids, levels)
        all_pids = []
        for cand in cands:
            f = store.kfs[cand].frame
            fi = np.where(f.mp_ids >= 0)[0]
            if len(fi) == 0:
                continue
            pids = f.mp_ids[fi].astype(np.int64)
            live = np.asarray(store.mp_valid[pids], bool)
            fi, pids = fi[live], pids[live]
            if len(fi) == 0:
                continue
            per_cand.append((cand, fi, pids, f.octave[fi].astype(np.int64)))
            all_pids.append(pids)
        if not per_cand:
            return
        store.yield_lock()  # camera-rate thread gets a slot
        upids = np.unique(np.concatenate(all_pids))
        L = int(self.cfg.orb.n_levels)
        kidm, fim, nm = store.obs.rows(upids)
        slot_ok = np.arange(kidm.shape[1])[None, :] < nm[:, None]
        obs_p, cols = np.nonzero(slot_ok)
        octs = store.octave_table()[kidm[obs_p, cols],
                                    fim[obs_p, cols]].astype(np.int64)
        np.clip(octs, 0, L - 1, out=octs)
        hist = np.bincount(obs_p * L + octs,
                           minlength=len(upids) * L).reshape(len(upids), L)
        cum = np.cumsum(hist, axis=1)          # obs with octave <= t
        flagged = []
        for cand, fi, pids, levels in per_cand:
            rows = np.searchsorted(upids, pids)
            thr = np.minimum(levels + 1, L - 1)
            # subtract the candidate's own observation (octave == level
            # <= level+1, so it always counts itself once)
            n_redundant = int((cum[rows, thr] - 1 >= 3).sum())
            if n_redundant > self.cfg.kf_cull_redundancy * len(fi):
                flagged.append(cand)
        for cand in flagged:
            store.yield_lock()
            if self._cull_verify(cand):
                store.erase_keyframe(cand)

    def _cull_verify(self, cand: int) -> bool:
        """Exact redundancy check for one screened candidate against
        LIVE state (erasing an earlier candidate removes observations,
        which can rescue this one — matches the reference's sequential
        loop, src/LocalMapping.cc:688-772)."""
        store = self.store
        if not store.kfs[cand].valid:
            return False
        f = store.kfs[cand].frame
        fi = np.where(f.mp_ids >= 0)[0]
        if len(fi) == 0:
            return False
        pids = f.mp_ids[fi].astype(np.int64)
        live = np.asarray(store.mp_valid[pids], bool)
        fi, pids = fi[live], pids[live]
        if len(fi) == 0:
            return False
        levels = f.octave[fi]
        kidm, fim, nm = store.obs.rows(pids)
        slot_ok = (np.arange(kidm.shape[1])[None, :] < nm[:, None]) \
            & (kidm != cand)
        obs_l, cols = np.nonzero(slot_ok)
        if len(obs_l) == 0:
            return False
        octs = store.octave_table()[kidm[obs_l, cols],
                                    fim[obs_l, cols]].astype(np.int32)
        fine = octs <= levels[obs_l] + 1
        cnt = np.bincount(obs_l[fine], minlength=len(fi))
        return int((cnt >= 3).sum()) > self.cfg.kf_cull_redundancy * len(fi)


class AsyncMapper:
    """The reference's LocalMapping THREAD + keyframe queue
    (src/System.cc:96-100 spawns it; src/LocalMapping.cc:161-167 is the
    queue): tracking enqueues a keyframe id and keeps running at camera
    rate while mapping (and loop closing, which runs at the tail of
    ``process_keyframe``) executes here.  Synchronization is
    ``MapStore.lock``; the mapper drops it around device windows so the
    tracker only ever waits on short host bookkeeping sections.

    Exceptions raised by the worker are re-raised on the tracking thread
    at the next ``process_keyframe``/``drain`` call."""

    def __init__(self, mapper: LocalMapper):
        import os
        import queue
        import threading
        self.mapper = mapper
        self._q = queue.Queue()
        self._exc = None
        self._profile = None
        if os.environ.get("ORB_SLAM2_TPU_PROFILE_MAPPER"):
            import cProfile
            self._profile = cProfile.Profile()
        self._thread = threading.Thread(
            target=self._run, name="local_mapping", daemon=True)
        self._thread.start()

    def process_keyframe(self, kid: int):
        self._reraise()
        self._q.put(kid)

    def idle(self) -> bool:
        """LocalMapping::AcceptKeyFrames equivalent
        (src/LocalMapping.cc:572-583): no queued keyframe and none mid
        -processing.  The tracker's NeedNewKeyFrame gates monocular KF
        insertion on this (src/Tracking.cc:559-615) — the feedback loop
        that throttles keyframe production to what mapping can absorb."""
        return self._q.unfinished_tasks == 0

    def _run(self):
        while True:
            kid = self._q.get()
            try:
                if kid is None:
                    return
                # force the new KF's lazy host feature copies to
                # materialize BEFORE taking the map lock — this is a
                # device->host read (~tens of ms through a chip tunnel)
                # that must not run inside a locked section
                store = getattr(self.mapper, "store", None)
                if store is not None and kid < len(store.kfs):
                    fr = store.kfs[kid].frame
                    _ = fr.desc, fr.octave, fr.xy, fr.angle, fr.valid
                if self._profile is not None:
                    self._profile.enable()
                self.mapper.process_keyframe(
                    kid, queue_pressure=not self._q.empty())
                if self._profile is not None:
                    self._profile.disable()
            except BaseException as e:  # noqa: BLE001 — surfaced to caller
                self._exc = e
            finally:
                self._q.task_done()

    def _reraise(self):
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc

    def drain(self):
        """Block until the queue is empty (LocalMapping idle — the
        reference's CheckNewKeyFrames()==false state)."""
        self._q.join()
        self._reraise()

    def stop(self):
        """System::Shutdown thread join (src/System.cc:173-192)."""
        self._q.put(None)
        self._thread.join()
        if self._profile is not None:
            import pstats
            import sys
            st = pstats.Stats(self._profile, stream=sys.stderr)
            st.sort_stats("cumulative")
            st.print_stats(25)
        self._reraise()
