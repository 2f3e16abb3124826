"""Pinhole camera model with radial-tangential distortion, batched JAX.

Replaces the reference's scattered OpenCV camera code: projection in
Frame::isInFrustum (src/Frame.cc:275-369), cv::undistortPoints in
Frame::UndistortKeyPoints (src/Frame.cc:502-558), and the K/distCoef
YAML parsing of src/Tracking.cc:95-127.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Intrinsics(NamedTuple):
    """Static pinhole parameters. dist = (k1, k2, p1, p2, k3)."""
    fx: float
    fy: float
    cx: float
    cy: float
    dist: tuple = (0.0, 0.0, 0.0, 0.0, 0.0)
    width: int = 0
    height: int = 0

    @property
    def K(self):
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    @property
    def has_distortion(self) -> bool:
        return any(abs(d) > 0 for d in self.dist)


def project(cam: Intrinsics, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points (..., 3) -> pixel coords (..., 2).

    No distortion applied: the pipeline matches against *undistorted*
    keypoints, exactly like the reference (src/Frame.cc:502 undistorts
    once at frame construction; all projections then use plain K).
    """
    z = pts_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = cam.fx * pts_cam[..., 0] * inv_z + cam.cx
    v = cam.fy * pts_cam[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1)


def unproject(cam: Intrinsics, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Back-project undistorted pixels (..., 2) at depth (...) -> (..., 3)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def distort_normalized(cam: Intrinsics, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply radtan distortion to normalized coords (..., 2)."""
    k1, k2, p1, p2, k3 = [jnp.float32(d) for d in cam.dist]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: Intrinsics, uv: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Undistort pixel coords (..., 2) -> ideal pixel coords (..., 2).

    Fixed-point iteration (same scheme as cv::undistortPoints), fixed
    iteration count so it jits to straight-line code.  Behavioral
    equivalent of Frame::UndistortKeyPoints (src/Frame.cc:502-558).
    """
    if not cam.has_distortion:
        return uv
    xd = (uv[..., 0] - cam.cx) / cam.fx
    yd = (uv[..., 1] - cam.cy) / cam.fy
    target = jnp.stack([xd, yd], axis=-1)
    xy = target
    for _ in range(iters):
        d = distort_normalized(cam, xy)
        xy = xy + (target - d)
    u = xy[..., 0] * cam.fx + cam.cx
    v = xy[..., 1] * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def undistorted_bounds(cam: Intrinsics) -> tuple:
    """Image bounds after undistortion (minx, maxx, miny, maxy).

    Mirrors Frame::ComputeImageBounds (src/Frame.cc:560-597): undistort
    the four corners and take the axis-aligned envelope.
    """
    import numpy as np
    w, h = cam.width, cam.height
    corners = jnp.array(
        [[0.0, 0.0], [w, 0.0], [0.0, h], [w, h]], dtype=jnp.float32)
    und = np.asarray(undistort_points(cam, corners))
    if not cam.has_distortion:
        return (0.0, float(w), 0.0, float(h))
    return (
        float(min(und[0, 0], und[2, 0])),
        float(max(und[1, 0], und[3, 0])),
        float(min(und[0, 1], und[1, 1])),
        float(max(und[2, 1], und[3, 1])),
    )
