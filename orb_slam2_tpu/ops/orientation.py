"""Intensity-centroid keypoint orientation, batched.

Replaces IC_Angle (src/ORBextractor.cc:96-144): the angle of the vector
from the keypoint to the intensity centroid of a radius-15 circular
patch.  The reference loops per keypoint; here all keypoints gather
their patches at once and the moments are two masked reductions.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

HALF_PATCH = 15


def _patch_offsets(radius: int):
    d = np.arange(-radius, radius + 1)
    dy, dx = np.meshgrid(d, d, indexing="ij")
    mask = (dy * dy + dx * dx) <= radius * radius
    return dy.astype(np.int32), dx.astype(np.int32), mask.astype(np.float32)


_DY, _DX, _MASK = _patch_offsets(HALF_PATCH)


def gather_patches(image: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                   dy: jnp.ndarray, dx: jnp.ndarray) -> jnp.ndarray:
    """Gather (N, *offsets.shape) pixel patches with clamped indices."""
    h, w = image.shape
    yy = jnp.clip(ys[:, None, None] + dy[None], 0, h - 1)
    xx = jnp.clip(xs[:, None, None] + dx[None], 0, w - 1)
    return image[yy, xx]


def ic_angle(image: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Angles in radians, (N,). Keypoints assumed >= 15 px from border
    (guaranteed by the detector's border margin)."""
    dy = jnp.asarray(_DY)
    dx = jnp.asarray(_DX)
    mask = jnp.asarray(_MASK)
    patches = gather_patches(image, ys, xs, dy, dx)  # (N, 31, 31)
    m01 = jnp.sum(patches * (dy.astype(jnp.float32) * mask)[None], axis=(1, 2))
    m10 = jnp.sum(patches * (dx.astype(jnp.float32) * mask)[None], axis=(1, 2))
    return jnp.arctan2(m01, m10)
