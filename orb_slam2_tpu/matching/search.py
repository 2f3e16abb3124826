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
    r_base = jnp.where(view_cos > 0.998, 2.5, 4.0)
    radius = r_base * th * scale_factors[pred_level]

    dist = core.hamming_matrix(mp_desc, kp_desc)
    lvl_ok = (kp_octave[None, :] >= pred_level[:, None] - 1) & (
        kp_octave[None, :] <= pred_level[:, None] + 1)
    mask = (
        mp_valid[:, None] & kp_valid[None, :] & (~kp_has_mp)[None, :]
        & lvl_ok & _chebyshev_window_mask(uv_proj, kp_xy, radius)
    )
    d = jnp.where(mask, dist, 1 << 20)
    best_idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.min(d, axis=1)
    d2 = jnp.where(
        jnp.arange(d.shape[1])[None, :] == best_idx[:, None], 1 << 20, d)
    second_idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
    second = jnp.min(d2, axis=1)
    same_level = kp_octave[best_idx] == kp_octave[second_idx]
    ratio_ok = jnp.where(
        same_level & (second < (1 << 20)),
        best.astype(jnp.float32) <= ratio * second.astype(jnp.float32),
        True,
    )
    res = MatchResult(best_idx, best, (best <= TH_HIGH) & ratio_ok)
    valid = core.mutual_best(dist, mask, res)
    return MatchResult(res.idx, res.dist, valid)


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
    dist = core.hamming_matrix(mp_desc, kp_desc)
    lvl_ok = (kp_octave[None, :] >= last_octave[:, None] - 1) & (
        kp_octave[None, :] <= last_octave[:, None] + 1)
    mask = (
        mp_valid[:, None] & kp_valid[None, :]
        & lvl_ok & _chebyshev_window_mask(uv_proj, kp_xy, radius)
    )
    res = core.best_match(dist, mask, max_dist=TH_HIGH)
    valid = core.mutual_best(dist, mask, res)
    if check_rotation:
        valid = core.rotation_consistency_mask(mp_angle, kp_angle[res.idx], valid)
    return MatchResult(res.idx, res.dist, valid)


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
    """
    dist = core.hamming_matrix(desc1, desc2)
    e2 = epipolar_distance_sq(xy1, xy2, F12)
    epi_ok = e2 < epi_chi2 * sigma2_levels[octave2][None, :]

    dex = xy2[:, 0] - epipole2_uv[0]
    dey = xy2[:, 1] - epipole2_uv[1]
    far_from_epipole = (dex * dex + dey * dey) >= 100.0 * scale_factors[octave2]

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
