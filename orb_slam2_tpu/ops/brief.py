"""Steered-BRIEF 256-bit descriptors packed to uint32[8], batched.

Replaces computeOrbDescriptor + bit_pattern_31_
(src/ORBextractor.cc:155-470).  The reference hard-codes OpenCV's
learned 256-pair sampling pattern; we generate our own deterministic
pattern (seeded isotropic Gaussian, the original BRIEF construction,
sigma = patch/5, clipped to +-13 so rotated samples stay inside the
sampling window).  Descriptors are therefore ORB-class but not bit-
compatible with OpenCV — irrelevant here because the vocabulary is
trained on our own descriptors (the reference's ORBvoc.bin is trained
on OpenCV's, and we never load it).

TPU-native formulation, two stages:

1. PATCH GATHER: one 39x39 window per keypoint via vmapped
   dynamic_slice (edge-padded, so border clamping matches the
   per-sample coordinate clip exactly).  This replaces ~2M scattered
   full-image pixel loads per frame (N x 512 gathers, measured
   14 ms/frame at the bench workload) with N contiguous 2-D slices.

2. STEERED COMPARISONS, one of two kernels:

   - ``exact`` (default): per-keypoint rotated offsets
     (cvRound(x cos - y sin), same as the reference) resolved INSIDE
     the gathered patch with one take_along_axis — bit-identical to
     steering against the full image, but the gather table is 1521
     elements per row instead of H*W.

   - ``binned`` (default): the steering angle quantized to ``N_BINS``
     bins turns every bit into the sign of a LINEAR functional of the
     patch, so the whole frame's descriptors become ONE (N, 1521) x
     (1521, N_BINS*256) bf16 matmul on the MXU, followed by LINEAR
     INTERPOLATION between the two adjacent bins' comparison values
     before the sign.  The interpolation matters: it recovers (and
     slightly beats) exact steering's matching quality, because it
     smooths the cvRound sampling noise that exact steering inherits.
     Measured on a 23-deg rotated-view pair (same-point Hamming
     distance, 256-bit descriptors, TH_LOW=50 acceptance):

         exact steering        24.9 mean   93.9% < 50
         48-bin nearest        ~26         ~93%
         48-bin interpolated   22.9 mean   94.7% < 50   <- default
         32-bin nearest        27.9 mean   89.9% < 50   (too coarse:
                               this setting cost a loop-proof failure)

     Chip cost at the bench workload: ~5 ms vs ~25 ms for exact
     (take_along_axis gathers are VPU-serial on TPU; the matmul is
     MXU work).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N_BITS = 256
PATTERN_CLIP = 13
N_BINS = 48
# rotated +-13 offsets reach radius 13*sqrt(2) ~= 18.4 -> 39x39 window
PATCH_R = 19
PATCH = 2 * PATCH_R + 1
_PAD = 4  # max |rotated offset| is 18 <= PATCH_R - 1; 4 >= 18 - 15 + 1


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


def _gather_patches(image_blurred: jnp.ndarray, ys: jnp.ndarray,
                    xs: jnp.ndarray) -> jnp.ndarray:
    """(N, PATCH*PATCH) windows centered on each keypoint.

    Edge-replicate padding reproduces the reference's per-sample
    coordinate clamp (row and column clamping are separable); the
    detector border (16 px) keeps every rotated offset (|off| <= 18)
    within the padded image.
    """
    n = ys.shape[0]
    h, w = image_blurred.shape
    img_p = jnp.pad(image_blurred, _PAD, mode="edge")
    y0 = jnp.clip(ys + _PAD - PATCH_R, 0, h + 2 * _PAD - PATCH)
    x0 = jnp.clip(xs + _PAD - PATCH_R, 0, w + 2 * _PAD - PATCH)

    def one_patch(y, x):
        return lax.dynamic_slice(img_p, (y, x), (PATCH, PATCH))

    return jax.vmap(one_patch)(y0, x0).reshape(n, PATCH * PATCH)


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) {0,1} -> (N, 8) uint32, bit i of word j = bit 32j+i."""
    bits = bits.reshape(-1, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


# ----------------------------------------------------------------------
# exact steering: per-keypoint rotated offsets inside the patch
# ----------------------------------------------------------------------

def _descriptors_exact(patches: jnp.ndarray, angles: jnp.ndarray,
                       pattern: str) -> jnp.ndarray:
    pat = jnp.asarray(get_pattern(pattern), dtype=jnp.float32)  # (256, 2, 2)
    px = pat[..., 0]  # (256, 2)
    py = pat[..., 1]
    ca = jnp.cos(angles)[:, None, None]
    sa = jnp.sin(angles)[:, None, None]
    # steered offsets, rounded to nearest (reference: cvRound)
    rx = jnp.round(px[None] * ca - py[None] * sa).astype(jnp.int32)  # (N, 256, 2)
    ry = jnp.round(px[None] * sa + py[None] * ca).astype(jnp.int32)
    flat = ((ry + PATCH_R) * PATCH + (rx + PATCH_R)).reshape(angles.shape[0], -1)
    vals = jnp.take_along_axis(patches, flat, axis=1).reshape(
        angles.shape[0], -1, 2)
    return _pack_bits((vals[..., 0] < vals[..., 1]).astype(jnp.uint32))


# ----------------------------------------------------------------------
# binned steering: one MXU matmul against per-bin +-1 weights
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _bin_weights_np(kind: str) -> np.ndarray:
    """(PATCH*PATCH, N_BINS*256) +-1/0 weight matrix: column b*256+s
    holds +1 at the bin-b-rotated B offset of pair s and -1 at its A
    offset (net 0 when both round to the same pixel -> bit 0, matching
    the strict I[A] < I[B] comparison)."""
    pat = get_pattern(kind).astype(np.float64)  # (256, 2, 2) as (x, y)
    px = pat[..., 0]  # (256, 2)
    py = pat[..., 1]
    W = np.zeros((PATCH * PATCH, N_BINS * N_BITS), np.float32)
    for b in range(N_BINS):
        th = 2.0 * np.pi * b / N_BINS
        ca, sa = np.cos(th), np.sin(th)
        rx = np.round(px * ca - py * sa).astype(np.int64)  # (256, 2)
        ry = np.round(px * sa + py * ca).astype(np.int64)
        flat = (ry + PATCH_R) * PATCH + (rx + PATCH_R)
        cols = b * N_BITS + np.arange(N_BITS)
        np.subtract.at(W, (flat[:, 0], cols), 1.0)  # -1 at A
        np.add.at(W, (flat[:, 1], cols), 1.0)       # +1 at B
    return W


@functools.lru_cache(maxsize=4)
def _bin_weights_dev(kind: str):
    """Device-resident bf16 weights (~24 MB), uploaded once per
    process; closed over by the jitted extractor as a constant buffer
    argument (jax passes closure device arrays as parameters, not
    baked literals).

    Materialized under `jax.ensure_compile_time_eval()`: array
    creation is otherwise STAGED when first called inside a jit trace,
    and the lru_cache would capture that trace's tracer and leak it
    into every later trace (UnexpectedTracerError)."""
    with jax.ensure_compile_time_eval():
        return jnp.asarray(_bin_weights_np(kind), jnp.bfloat16)


def _descriptors_binned(patches: jnp.ndarray, angles: jnp.ndarray,
                        pattern: str) -> jnp.ndarray:
    n = angles.shape[0]
    # integer comparison domain (the reference compares uint8 blurred
    # pixels); integers <= 255 are exact in bf16
    p_i = jnp.round(patches).astype(jnp.bfloat16)
    Wd = _bin_weights_dev(pattern)
    # (N, 1521) @ (1521, N_BINS*256) on the MXU; f32 accumulate (exact:
    # products are +-integers <= 255, sums of two)
    diffs = jnp.dot(p_i, Wd, preferred_element_type=jnp.float32)
    diffs = diffs.reshape(n, N_BINS, N_BITS)
    # linear interpolation between the two adjacent bins' comparison
    # values (see module docstring: beats both nearest-bin AND exact
    # steering on cross-view matching)
    tb = angles * (N_BINS / (2.0 * np.pi))
    b0 = jnp.floor(tb).astype(jnp.int32) % N_BINS
    b1 = (b0 + 1) % N_BINS
    t = (tb - jnp.floor(tb))[:, None]
    s0 = jnp.take_along_axis(diffs, b0[:, None, None], axis=1)[:, 0, :]
    s1 = jnp.take_along_axis(diffs, b1[:, None, None], axis=1)[:, 0, :]
    sel = (1.0 - t) * s0 + t * s1
    return _pack_bits((sel > 0).astype(jnp.uint32))


def compute_descriptors(
    image_blurred: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    angles: jnp.ndarray,
    pattern: str = "random",
    mode: str = "binned",
) -> jnp.ndarray:
    """(N,) keypoints -> (N, 8) uint32 packed descriptors.

    ``image_blurred`` must be the 7x7 sigma=2 Gaussian-blurred level
    image (ORBextractor.cc:1300-1315 blurs before describing).
    ``mode``: "binned" (interpolated-bin MXU matmul, default — best
    measured matching quality AND fastest) or "exact" (per-keypoint
    steering, the reference's formulation; see module docstring).
    """
    patches = _gather_patches(image_blurred, ys, xs)
    if mode == "exact":
        return _descriptors_exact(patches, angles, pattern)
    return _descriptors_binned(patches, angles, pattern)
