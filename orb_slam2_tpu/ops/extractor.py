"""The fused ORB extractor: pyramid -> FAST -> distribute -> orient ->
blur -> describe, all static shapes, one jittable function per image size.

Replaces ORBextractor::operator() (src/ORBextractor.cc:1223-1340) and the
per-level feature budgeting of its constructor (src/ORBextractor.cc:511-529).
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import pyramid, fast, distribute, orientation, brief


class OrbParams(NamedTuple):
    n_features: int = 1000
    n_levels: int = 8
    scale_factor: float = 1.2
    th_fast_hi: float = 20.0
    th_fast_lo: float = 7.0
    # BRIEF sampling pattern: "random" (default, seeded Gaussian) or
    # "orb_learned" (OpenCV bit_pattern_31_ — descriptor-compatible
    # with OpenCV ORB / ORBvoc vocabularies; see ops/orb_pattern.py)
    pattern: str = "random"


class Features(NamedTuple):
    """SoA keypoint set, exactly ``n_features`` rows, mask-padded.

    xy       : (N, 2) float32 — level-0 pixel coords (x, y), raw/distorted.
    response : (N,) float32 — FAST score.
    angle    : (N,) float32 — IC orientation, radians.
    octave   : (N,) int32 — pyramid level.
    desc     : (N, 8) uint32 — packed 256-bit descriptor.
    valid    : (N,) bool.
    """
    xy: jnp.ndarray
    response: jnp.ndarray
    angle: jnp.ndarray
    octave: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray

    @property
    def n(self) -> int:
        return self.xy.shape[0]


def features_per_level(n_features: int, n_levels: int, scale_factor: float) -> List[int]:
    """Geometric budget per level, remainder to the last level — the
    same allocation as src/ORBextractor.cc:511-529."""
    f = 1.0 / scale_factor
    n0 = n_features * (1.0 - f) / (1.0 - f ** n_levels)
    out = []
    total = 0
    for lvl in range(n_levels - 1):
        n = int(round(n0 * f ** lvl))
        out.append(n)
        total += n
    out.append(max(n_features - total, 0))
    return out


def extract(image: jnp.ndarray, params: OrbParams) -> Features:
    """image: (H, W) float32 grayscale in [0, 255] -> Features.

    Pure function of the image; wrap in jax.jit (shapes are static per
    (H, W, params) combination — use ``make_extractor`` for a cached
    jitted callable).
    """
    levels = pyramid.build_pyramid(image, params.n_levels, params.scale_factor)
    budgets = features_per_level(params.n_features, params.n_levels, params.scale_factor)
    sf, _, _, _ = pyramid.scale_factors(params.n_levels, params.scale_factor)

    parts = []
    for lvl, (img_l, n_l) in enumerate(zip(levels, budgets)):
        if n_l == 0:
            continue
        keep, score = fast.detect(
            img_l, th_hi=params.th_fast_hi, th_lo=params.th_fast_lo)
        ys, xs, resp, valid = distribute.grid_topk(keep, score, n_l)
        ang = orientation.ic_angle(img_l, ys, xs)
        blurred = pyramid.gaussian_blur_7x7(img_l)
        desc = brief.compute_descriptors(blurred, ys, xs, ang,
                                         pattern=params.pattern)
        scale = jnp.float32(sf[lvl])
        xy = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32)], -1) * scale
        parts.append(Features(
            xy=xy,
            response=resp,
            angle=ang,
            octave=jnp.full((n_l,), lvl, jnp.int32),
            desc=desc,
            valid=valid,
        ))

    out = Features(*[jnp.concatenate([getattr(p, f) for p in parts], axis=0)
                     for f in Features._fields])
    # Pad the SoA height to a multiple of 128 (extra rows valid=False).
    # The fused Pallas top-2 search kernels (matching/pallas_hamming.py)
    # tile in 128-wide blocks and require %128 operand heights; a raw
    # n_features like 4000 would silently route every in-pipeline
    # projection search to the XLA fallback twin.
    pad = padded_feature_count(params.n_features) - out.n
    if pad > 0:
        out = Features(*[jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                         for a in out])
    return out


def padded_feature_count(n_features: int) -> int:
    """SoA row count for a requested feature budget: next multiple of
    128 (Pallas search-kernel tiling; see ``extract``)."""
    return -(-n_features // 128) * 128


@functools.lru_cache(maxsize=8)
def make_extractor(height: int, width: int, params: OrbParams):
    """Jitted extractor for a fixed image size + params."""
    @jax.jit
    def _run(image: jnp.ndarray) -> Features:
        return extract(image, params)
    return _run


def level_sigma2(params: OrbParams) -> np.ndarray:
    """Per-level keypoint variance table (mvLevelSigma2,
    src/ORBextractor.cc:498-505)."""
    return pyramid.scale_factors(params.n_levels, params.scale_factor)[2]
