"""The concrete search routines, as pure masked-matrix functions.

Each function mirrors one ORBmatcher search (file:line cited per
function).  All take plain arrays (SoA keypoint fields) so they can be
fused into larger jitted pipeline stages.  Row convention: rows are the
"source" entities (map points / reference features), columns are the
candidate keypoints of the target frame.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import core
from .core import MatchResult, TH_LOW, TH_HIGH


def _chebyshev_window_mask(xy1: jnp.ndarray, xy2: jnp.ndarray, radius) -> jnp.ndarray:
    """(N,2) x (M,2) -> (N,M) bool: |dx|<=r and |dy|<=r (the reference's
    GetFeaturesInArea uses a square grid window, src/Frame.cc:371-459)."""
    dx = jnp.abs(xy1[:, None, 0] - xy2[None, :, 0])
    dy = jnp.abs(xy1[:, None, 1] - xy2[None, :, 1])
    r = jnp.asarray(radius)
    if r.ndim == 1:
        r = r[:, None]
    return (dx <= r) & (dy <= r)




def _pallas_eligible(n_rows: int, n_cols: int) -> bool:
    """The fused Pallas projection-search kernel applies on TPU when the
    padded shapes satisfy its tiling/stride limits.

    ``ORB_SLAM2_TPU_PALLAS_SEARCH=0`` forces the XLA twin everywhere
    (A/B instrumentation: the twin is bit-exact, so flipping it is a
    pure perf experiment)."""
    import os
    if os.environ.get("ORB_SLAM2_TPU_PALLAS_SEARCH", "1") == "0":
        return False
    from . import pallas_hamming as ph
    return (ph._on_tpu() and n_rows % ph.TILE == 0
            and n_cols % ph.TILE == 0
            and n_cols <= ph.COL_STRIDE and n_rows <= ph.ROW_STRIDE)


def _windowed_top2(desc_rows, desc_cols, uv, radius, lmin, lmax, rvalid,
                   kp_xy, kp_octave, cvalid):
    """Masked windowed top-2 + column-best, Pallas on TPU / XLA twin
    elsewhere.  Returns (best, best_idx, second, second_idx,
    col_best_row) with dist==pallas_hamming.MASK_D meaning "no match"."""
    from . import pallas_hamming as ph
    row_attr = jnp.stack(
        [uv[:, 0], uv[:, 1], jnp.asarray(radius, jnp.float32),
         lmin.astype(jnp.float32), lmax.astype(jnp.float32),
         rvalid.astype(jnp.float32)], axis=1)
    col_attr = jnp.stack(
        [kp_xy[:, 0], kp_xy[:, 1], kp_octave.astype(jnp.float32),
         cvalid.astype(jnp.float32)], axis=1)
    fn = (ph.masked_top2_mutual
          if _pallas_eligible(desc_rows.shape[0], desc_cols.shape[0])
          else ph.masked_top2_mutual_xla)
    bk, sk, ck = fn(desc_rows, desc_cols, row_attr, col_attr)
    best = bk // ph.COL_STRIDE
    bidx = (bk % ph.COL_STRIDE).astype(jnp.int32)
    second = sk // ph.COL_STRIDE
    sidx = (sk % ph.COL_STRIDE).astype(jnp.int32)
    col_row = (ck % ph.ROW_STRIDE).astype(jnp.int32)
    return best, bidx, second, sidx, col_row


@functools.partial(jax.jit, static_argnames=("window", "ratio", "check_rotation"))
def search_for_initialization(
    xy1, desc1, valid1, octave1, angle1,
    xy2, desc2, valid2, octave2, angle2,
    window: float = 100.0,
    ratio: float = 0.9,
    check_rotation: bool = True,
) -> MatchResult:
    """ORBmatcher::SearchForInitialization (src/ORBmatcher.cc:543-696).

    Level-0 features only, square window around the level-0 position,
    TH_LOW + best/second ratio, mutual-best dedup, rotation histogram.
    """
    dist = core.hamming_matrix(desc1, desc2)
    mask = (
        valid1[:, None] & valid2[None, :]
        & (octave1 == 0)[:, None] & (octave2 == 0)[None, :]
        & _chebyshev_window_mask(xy1, xy2, window)
    )
    res = core.best_match(dist, mask, max_dist=TH_LOW, ratio=ratio)
    valid = core.mutual_best(dist, mask, res)
    if check_rotation:
        valid = core.rotation_consistency_mask(angle1, angle2[res.idx], valid)
    return MatchResult(res.idx, res.dist, valid)


@functools.partial(jax.jit, static_argnames=("th", "ratio"))
def search_by_projection_local_map(
    uv_proj, pred_level, view_cos, mp_desc, mp_valid,
    kp_xy, kp_octave, kp_desc, kp_valid, kp_has_mp,
    scale_factors, th: float = 1.0,
    ratio: float = 0.8,
) -> MatchResult:
    """ORBmatcher::SearchByProjection(F, vpMapPoints, th)
    (src/ORBmatcher.cc:64-160) — local-map points vs current frame.

    uv_proj/pred_level/view_cos come from the frustum stage.  Radius is
    2.5 px when view_cos > 0.998 else 4.0, scaled by the predicted
    level's scale factor and by ``th`` (src/ORBmatcher.cc:87-99).  The
    ratio test applies only when best and second-best live on the same
    pyramid level (src/ORBmatcher.cc:139-147).  Keypoints already bound
    to a map point are excluded (src/ORBmatcher.cc:117-120).
    """
    from . import pallas_hamming as ph
    r_base = jnp.where(view_cos > 0.998, 2.5, 4.0)
    radius = r_base * th * scale_factors[pred_level]

    best, best_idx, second, second_idx, col_row = _windowed_top2(
        mp_desc, kp_desc, uv_proj, radius,
        pred_level - 1, pred_level + 1, mp_valid,
        kp_xy, kp_octave, kp_valid & ~kp_has_mp)
    same_level = kp_octave[best_idx] == kp_octave[second_idx]
    ratio_ok = jnp.where(
        same_level & (second < ph.MASK_D),
        best.astype(jnp.float32) <= ratio * second.astype(jnp.float32),
        True,
    )
    rows = jnp.arange(best.shape[0], dtype=jnp.int32)
    valid = ((best <= TH_HIGH) & ratio_ok
             & (col_row[best_idx] == rows))
    return MatchResult(best_idx, best, valid)


@functools.partial(jax.jit, static_argnames=("th", "check_rotation"))
def search_by_projection_last_frame(
    uv_proj, last_octave, mp_desc, mp_valid, mp_angle,
    kp_xy, kp_octave, kp_desc, kp_valid, kp_angle,
    scale_factors, th: float = 7.0,
    check_rotation: bool = True,
) -> MatchResult:
    """ORBmatcher::SearchByProjection(CurrentFrame, LastFrame, th, mono)
    (src/ORBmatcher.cc:1633-1797) — the TrackWithInitialPose matcher.

    Rows are the last frame's map-point-bearing features projected into
    the current frame with its (trusted or predicted) pose.  Radius
    th * scale[last_octave]; candidate levels [last-1, last+1]; TH_HIGH;
    rotation-consistency; mutual-best instead of the reference's
    overwrite-on-collision.
    """
    radius = th * scale_factors[last_octave]
    best, best_idx, second, second_idx, col_row = _windowed_top2(
        mp_desc, kp_desc, uv_proj, radius,
        last_octave - 1, last_octave + 1, mp_valid,
        kp_xy, kp_octave, kp_valid)
    rows = jnp.arange(best.shape[0], dtype=jnp.int32)
    valid = (best <= TH_HIGH) & (col_row[best_idx] == rows)
    if check_rotation:
        valid = core.rotation_consistency_mask(mp_angle, kp_angle[best_idx],
                                               valid)
    return MatchResult(best_idx, best, valid)


@functools.partial(jax.jit, static_argnames=("ratio", "check_rotation", "max_dist"))
def search_descriptors(
    desc1, valid1, angle1, node1,
    desc2, valid2, angle2, node2,
    ratio: float = 0.7,
    check_rotation: bool = True,
    max_dist: int = TH_LOW,
) -> MatchResult:
    """ORBmatcher::SearchByBoW (src/ORBmatcher.cc:222-392, 698-851).

    The reference walks aligned FeatureVector nodes purely as an
    acceleration; the acceptance rule is best-in-node + TH_LOW + ratio +
    rotation.  Here the node constraint is an equality mask on the
    vocabulary node id per feature (pass node=None to match across all
    pairs — used before a vocabulary is available, and for small N the
    dense matrix is faster anyway).
    """
    dist = core.hamming_matrix(desc1, desc2)
    mask = valid1[:, None] & valid2[None, :]
    if node1 is not None and node2 is not None:
        mask = mask & (node1[:, None] == node2[None, :])
    res = core.best_match(dist, mask, max_dist=max_dist, ratio=ratio)
    valid = core.mutual_best(dist, mask, res)
    if check_rotation:
        valid = core.rotation_consistency_mask(angle1, angle2[res.idx], valid)
    return MatchResult(res.idx, res.dist, valid)


@functools.partial(jax.jit, static_argnames=(
    "fx", "fy", "cx", "cy", "bounds", "n_levels", "log_scale", "th",
    "max_dist"))
def search_by_projection_sim3(
    pts_w, mp_desc, mp_normal, mp_max_dist, mp_valid,
    Scw,
    kp_xy, kp_octave, kp_desc, kp_valid, kp_has_mp,
    scale_factors,
    fx: float, fy: float, cx: float, cy: float,
    bounds: tuple, n_levels: int, log_scale: float,
    th: float = 7.5, max_dist: int = TH_LOW,
) -> MatchResult:
    """ORBmatcher::SearchByProjection(KF, Scw, vpPoints, vpMatched, th)
    (src/ORBmatcher.cc:394-540) — loop map points projected through a
    Sim3 world->camera into the current keyframe.

    Checks: positive depth, in-image, distance within the point's scale
    band, viewing cos > 0.5, candidate levels [pred-1, pred],
    radius th * scale[pred], Hamming <= TH_LOW, no ratio test.
    Already-matched keypoints are excluded.
    """
    from ..geom import sim3 as sim3_mod
    pc = sim3_mod.apply(Scw[None], pts_w[None])[0]
    z = pc[:, 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = fx * pc[:, 0] * inv_z + cx
    v = fy * pc[:, 1] * inv_z + cy
    minx, maxx, miny, maxy = bounds
    in_img = (u >= minx) & (u < maxx) & (v >= miny) & (v < maxy)

    # camera center in world: Scw^-1 * 0
    ow = sim3_mod.apply_one(sim3_mod.inv(Scw), jnp.zeros(3))
    po = pts_w - ow
    dist = jnp.linalg.norm(po, axis=-1)
    min_d = mp_max_dist / scale_factors[n_levels - 1]
    dist_ok = (dist >= 0.8 * min_d) & (dist <= 1.2 * mp_max_dist)
    vcos = jnp.sum(po * mp_normal, axis=-1) / jnp.maximum(dist, 1e-12)

    ratio_d = jnp.maximum(mp_max_dist, 1e-12) / jnp.maximum(dist, 1e-12)
    lvl = jnp.clip(jnp.ceil(jnp.log(ratio_d) / log_scale).astype(jnp.int32),
                   0, n_levels - 1)
    radius = th * scale_factors[lvl]

    row_ok = mp_valid & (z > 0) & in_img & dist_ok & (vcos > 0.5)
    uv = jnp.stack([u, v], axis=-1)
    lvl_ok = (kp_octave[None, :] >= lvl[:, None] - 1) & (
        kp_octave[None, :] <= lvl[:, None])
    dmat = core.hamming_matrix(mp_desc, kp_desc)
    mask = (row_ok[:, None] & kp_valid[None, :] & (~kp_has_mp)[None, :]
            & lvl_ok & _chebyshev_window_mask(uv, kp_xy, radius))
    res = core.best_match(dmat, mask, max_dist=max_dist, ratio=1.0)
    valid = core.mutual_best(dmat, mask, res)
    return MatchResult(res.idx, res.dist, valid)


def _sim3_directional_match(pc_src, desc_src, valid_src, max_dist_src,
                            S_dst_src,
                            kp_xy, kp_octave, kp_desc, kp_valid,
                            scale_factors, fx, fy, cx, cy, bounds,
                            n_levels, log_scale, th):
    """One direction of SearchBySim3: source map points (camera frame of
    their own KF) mapped through S_dst_src into the destination image and
    matched against the destination keypoints (src/ORBmatcher.cc:1430-1530)."""
    from ..geom import sim3 as sim3_mod
    pc = sim3_mod.apply(S_dst_src[None], pc_src[None])[0]
    z = pc[:, 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = fx * pc[:, 0] * inv_z + cx
    v = fy * pc[:, 1] * inv_z + cy
    minx, maxx, miny, maxy = bounds
    in_img = (u >= minx) & (u < maxx) & (v >= miny) & (v < maxy)
    dist = jnp.linalg.norm(pc, axis=-1)
    # scale-invariance slack 0.8/1.2 (GetMin/MaxDistanceInvariance,
    # src/MapPoint.cc:570-585 via ORBmatcher.cc:1467-1468)
    min_d = max_dist_src / scale_factors[n_levels - 1]
    dist_ok = (dist >= 0.8 * min_d) & (dist <= 1.2 * max_dist_src)
    ratio_d = jnp.maximum(max_dist_src, 1e-12) / jnp.maximum(dist, 1e-12)
    lvl = jnp.clip(jnp.ceil(jnp.log(ratio_d) / log_scale).astype(jnp.int32),
                   0, n_levels - 1)
    radius = th * scale_factors[lvl]

    row_ok = valid_src & (z > 0) & in_img & dist_ok
    uv = jnp.stack([u, v], axis=-1)
    # candidate octave band [pred-1, pred] (src/ORBmatcher.cc:1494)
    lvl_ok = (kp_octave[None, :] >= lvl[:, None] - 1) & (
        kp_octave[None, :] <= lvl[:, None])
    dmat = core.hamming_matrix(desc_src, kp_desc)
    mask = (row_ok[:, None] & kp_valid[None, :]
            & lvl_ok & _chebyshev_window_mask(uv, kp_xy, radius))
    res = core.best_match(dmat, mask, max_dist=TH_HIGH, ratio=1.0)
    return res


@functools.partial(jax.jit, static_argnames=(
    "fx", "fy", "cx", "cy", "bounds", "n_levels", "log_scale", "th"))
def search_by_sim3(
    pc1, desc1, valid1, max_dist1, kp_xy1, kp_octave1, kp_valid1,
    pc2, desc2, valid2, max_dist2, kp_xy2, kp_octave2, kp_valid2,
    S12,
    scale_factors,
    fx: float, fy: float, cx: float, cy: float,
    bounds: tuple, n_levels: int, log_scale: float,
    th: float = 7.5,
) -> MatchResult:
    """ORBmatcher::SearchBySim3 (src/ORBmatcher.cc:1368-1630):
    bidirectional Sim3-projected search between two keyframes' map-point
    features; a pair is accepted only when both directions agree.

    Rows are KF1 features (each carrying a map point, camera-1 frame
    position pc1); returns for each an index into KF2's features.
    """
    from ..geom import sim3 as sim3_mod
    S21 = sim3_mod.inv(S12)
    # KF2 points into image 1 (matched against KF1 keypoints)
    m21 = _sim3_directional_match(
        pc2, desc2, valid2, max_dist2, S12,
        kp_xy1, kp_octave1, desc1, kp_valid1 & valid1,
        scale_factors, fx, fy, cx, cy, bounds, n_levels, log_scale, th)
    # KF1 points into image 2
    m12 = _sim3_directional_match(
        pc1, desc1, valid1, max_dist1, S21,
        kp_xy2, kp_octave2, desc2, kp_valid2 & valid2,
        scale_factors, fx, fy, cx, cy, bounds, n_levels, log_scale, th)
    # agreement: m12[i] = j and m21[j] = i
    j = m12.idx                              # (N1,)
    agree = m12.valid & m21.valid[j] & (m21.idx[j] == jnp.arange(j.shape[0]))
    return MatchResult(j, m12.dist, agree)


def epipolar_distance_sq(xy1, xy2, F12) -> jnp.ndarray:
    """(N1,2) x (N2,2) -> (N1,N2): squared distance of x2 to the
    epipolar line of x1 under F12 (CheckDistEpipolarLine,
    src/ORBmatcher.cc:2013-2035)."""
    ones1 = jnp.ones_like(xy1[:, :1])
    x1h = jnp.concatenate([xy1, ones1], axis=1)  # (N1,3)
    lines = x1h @ F12  # (N1, 3): l = x1^T F12 (line in image 2)
    a, b, c = lines[:, 0:1], lines[:, 1:2], lines[:, 2:3]
    num = a * xy2[:, 0][None, :] + b * xy2[:, 1][None, :] + c
    den = a * a + b * b
    return (num * num) / jnp.maximum(den, 1e-12)


@functools.partial(jax.jit, static_argnames=("check_rotation", "epi_chi2"))
def search_for_triangulation(
    xy1, desc1, valid1, octave1, angle1, node1,
    xy2, desc2, valid2, octave2, angle2, node2,
    F12, epipole2_uv, sigma2_levels,
    scale_factors,
    check_rotation: bool = False,
    epi_chi2: float = 3.84,
) -> MatchResult:
    """ORBmatcher::SearchForTriangulation (src/ORBmatcher.cc:853-1057).

    Matches unbound features of KF1 against KF2 subject to the epipolar
    constraint under F12 (d^2 < 3.84 sigma^2 of the kp2 level) and a
    near-epipole exclusion (src/ORBmatcher.cc:953-960: skip kp2 closer
    than 100 * scale[octave2] px^2 to the epipole of camera 1 in image 2).
    Caller pre-masks features that already have map points via valid*.

    On TPU with %128-padded operands this runs as ONE fused Pallas
    kernel (epipolar gate + Hamming + top-2 + column-best; the (N1, N2)
    distance/mask matrices never reach HBM); elsewhere, or with BoW
    node blocking requested, the dense XLA formulation runs.
    """
    from . import pallas_hamming as ph

    dex = xy2[:, 0] - epipole2_uv[0]
    dey = xy2[:, 1] - epipole2_uv[1]
    far_from_epipole = (dex * dex + dey * dey) >= 100.0 * scale_factors[octave2]

    if node1 is None and node2 is None and not check_rotation:
        # epipolar lines of every row-1 feature in image 2, normalized
        # so the kernel's point-line test is (a'x + b'y + c')^2 < thr
        ones1 = jnp.ones_like(xy1[:, :1])
        lines = jnp.concatenate([xy1, ones1], axis=1) @ F12   # (N1, 3)
        den = lines[:, 0] ** 2 + lines[:, 1] ** 2
        s = jax.lax.rsqrt(jnp.maximum(den, 1e-12))
        row_attr = jnp.stack(
            [lines[:, 0] * s, lines[:, 1] * s, lines[:, 2] * s,
             valid1.astype(jnp.float32)], axis=1)
        thr = epi_chi2 * sigma2_levels[octave2]
        col_attr = jnp.stack(
            [xy2[:, 0], xy2[:, 1], thr,
             (valid2 & far_from_epipole).astype(jnp.float32)], axis=1)
        fn = (ph.masked_top2_epi
              if _pallas_eligible(desc1.shape[0], desc2.shape[0])
              else ph.masked_top2_epi_xla)
        bk, _, ck = fn(desc1, desc2, row_attr, col_attr)
        best = bk // ph.COL_STRIDE
        bidx = (bk % ph.COL_STRIDE).astype(jnp.int32)
        col_row = (ck % ph.ROW_STRIDE).astype(jnp.int32)
        rows = jnp.arange(best.shape[0], dtype=jnp.int32)
        valid = (best <= TH_LOW) & (col_row[bidx] == rows)
        return MatchResult(bidx, best, valid)

    dist = core.hamming_matrix(desc1, desc2)
    e2 = epipolar_distance_sq(xy1, xy2, F12)
    epi_ok = e2 < epi_chi2 * sigma2_levels[octave2][None, :]

    mask = (
        valid1[:, None] & (valid2 & far_from_epipole)[None, :] & epi_ok
    )
    if node1 is not None and node2 is not None:
        mask = mask & (node1[:, None] == node2[None, :])
    res = core.best_match(dist, mask, max_dist=TH_LOW)
    valid = core.mutual_best(dist, mask, res)
    if check_rotation:
        valid = core.rotation_consistency_mask(angle1, angle2[res.idx], valid)
    return MatchResult(res.idx, res.dist, valid)
