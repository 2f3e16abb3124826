"""Batched frustum / visibility test for map points.

Replaces Frame::isInFrustum (src/Frame.cc:275-369) — run once over the
whole local map as array ops instead of per-point virtual calls — and
MapPoint::PredictScale (src/MapPoint.cc:593-637).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class FrustumResult(NamedTuple):
    visible: jnp.ndarray     # (P,) bool
    uv: jnp.ndarray          # (P, 2) projected pixel coords
    pred_level: jnp.ndarray  # (P,) int32 predicted pyramid level
    view_cos: jnp.ndarray    # (P,) cosine(normal, viewing ray)
    depth: jnp.ndarray       # (P,) camera-frame z


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "bounds", "n_levels", "log_scale_factor", "view_cos_limit"))
def is_in_frustum(
    pts_w: jnp.ndarray,
    normals: jnp.ndarray,
    min_dist: jnp.ndarray,
    max_dist: jnp.ndarray,
    valid: jnp.ndarray,
    Tcw: jnp.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    bounds: tuple,
    n_levels: int,
    log_scale_factor: float,
    view_cos_limit: float = 0.5,
) -> FrustumResult:
    """All checks of Frame::isInFrustum, batched:

    - positive depth (src/Frame.cc:292-296)
    - projection inside the undistorted image bounds (:299-308)
    - distance within [0.8*min_dist, 1.2*max_dist] (:311-319;
      the 0.8/1.2 slack lives in MapPoint::Get{Min,Max}DistanceInvariance,
      src/MapPoint.cc:558-570)
    - viewing cosine vs the mean normal > 0.5 (:322-330)
    - predicted level = ceil(log(max_dist/dist)/log(scale)) (:333,
      src/MapPoint.cc:593-637)
    """
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    pc = pts_w @ R.T + t
    z = pc[:, 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = fx * pc[:, 0] * inv_z + cx
    v = fy * pc[:, 1] * inv_z + cy

    minx, maxx, miny, maxy = bounds
    in_img = (u >= minx) & (u < maxx) & (v >= miny) & (v < maxy)

    ow = -R.T @ t  # camera center in world
    po = pts_w - ow
    dist = jnp.linalg.norm(po, axis=-1)
    dist_ok = (dist >= 0.8 * min_dist) & (dist <= 1.2 * max_dist)

    vcos = jnp.sum(po * normals, axis=-1) / jnp.maximum(dist, 1e-12)

    ratio = jnp.maximum(max_dist, 1e-12) / jnp.maximum(dist, 1e-12)
    lvl = jnp.ceil(jnp.log(ratio) / log_scale_factor).astype(jnp.int32)
    lvl = jnp.clip(lvl, 0, n_levels - 1)

    visible = valid & (z > 0) & in_img & dist_ok & (vcos > view_cos_limit)
    return FrustumResult(
        visible=visible,
        uv=jnp.stack([u, v], axis=-1),
        pred_level=lvl,
        view_cos=vcos,
        depth=z,
    )
