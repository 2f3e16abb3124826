"""Steered-BRIEF 256-bit descriptors packed to uint32[8], batched.

Replaces computeOrbDescriptor + bit_pattern_31_
(src/ORBextractor.cc:155-470).  The reference hard-codes OpenCV's
learned 256-pair sampling pattern; we generate our own deterministic
pattern (seeded isotropic Gaussian, the original BRIEF construction,
sigma = patch/5, clipped to +-13 so rotated samples stay inside the
31x31 patch).  Descriptors are therefore ORB-class but not bit-
compatible with OpenCV — irrelevant here because the vocabulary is
trained on our own descriptors (the reference's ORBvoc.bin is trained
on OpenCV's, and we never load it).

Rotation is applied by steering the *pattern* with the keypoint angle
(same as the reference's cvRound(x*cos - y*sin) sampling), with all
keypoints processed in one gather.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

N_BITS = 256
PATTERN_CLIP = 13


def make_pattern(seed: int = 20240216) -> np.ndarray:
    """(256, 2, 2) int32 array of (pointA, pointB) offsets (x, y)."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, 31 / 5.0, size=(N_BITS, 2, 2))
    pts = np.clip(np.round(pts), -PATTERN_CLIP, PATTERN_CLIP)
    # avoid degenerate A == B pairs
    for i in range(N_BITS):
        while np.all(pts[i, 0] == pts[i, 1]):
            pts[i, 1] = np.clip(np.round(rng.normal(0, 31 / 5.0, 2)), -PATTERN_CLIP, PATTERN_CLIP)
    return pts.astype(np.int32)


_PATTERN = make_pattern()


def get_pattern(kind: str = "random") -> np.ndarray:
    """(256, 2, 2) sampling pattern by name.

    - ``"random"`` (default): the seeded Gaussian pattern above.
    - ``"orb_learned"``: OpenCV's learned ``bit_pattern_31_`` table
      (ops/orb_pattern.py; src/ORBextractor.cc:209-470) — bit-compatible
      with OpenCV ORB descriptors and ORBvoc vocabularies.
    """
    if kind == "random":
        return _PATTERN
    if kind == "orb_learned":
        from .orb_pattern import BIT_PATTERN_31
        return BIT_PATTERN_31.reshape(256, 2, 2)
    raise ValueError(f"unknown BRIEF pattern {kind!r}")


def compute_descriptors(
    image_blurred: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    angles: jnp.ndarray,
    pattern: str = "random",
) -> jnp.ndarray:
    """(N,) keypoints -> (N, 8) uint32 packed descriptors.

    ``image_blurred`` must be the 7x7 sigma=2 Gaussian-blurred level
    image (ORBextractor.cc:1300-1315 blurs before describing).
    """
    pat = jnp.asarray(get_pattern(pattern), dtype=jnp.float32)  # (256, 2, 2)
    px = pat[..., 0]  # (256, 2)
    py = pat[..., 1]
    ca = jnp.cos(angles)[:, None, None]
    sa = jnp.sin(angles)[:, None, None]
    # steered offsets, rounded to nearest (reference: cvRound)
    rx = jnp.round(px[None] * ca - py[None] * sa).astype(jnp.int32)  # (N, 256, 2)
    ry = jnp.round(px[None] * sa + py[None] * ca).astype(jnp.int32)

    h, w = image_blurred.shape
    yy = jnp.clip(ys[:, None, None] + ry, 0, h - 1)
    xx = jnp.clip(xs[:, None, None] + rx, 0, w - 1)
    # one flat gather (N, 512) — XLA lowers flat jnp.take noticeably
    # faster on TPU than the equivalent 2-D advanced indexing
    flat = (yy * w + xx).reshape(ys.shape[0], -1)
    vals = jnp.take(image_blurred.reshape(-1), flat, axis=0
                    ).reshape(ys.shape[0], -1, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (N, 256)

    # pack 256 bits -> 8 x uint32, bit i of word j = bit (32 j + i)
    bits = bits.reshape(-1, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
