"""FAST-9/16 corner detection as dense vectorized mask arithmetic.

Replaces the per-cell OpenCV FAST calls of
ORBextractor::ComputeKeyPointsOctTree (src/ORBextractor.cc:1040-1160),
including the two-threshold fallback (iniThFAST=20 then minThFAST=7 for
empty 30x30 cells, src/ORBextractor.cc:1115-1124).

TPU-native recast: instead of data-dependent per-cell retries, we
compute a *threshold-free* corner score map once (the OpenCV FAST score
= the largest threshold at which the pixel is still a corner, computed
in closed form via circular arc-min), then derive both threshold masks
from it and blend per cell.  Identical acceptance semantics, one dense
pass, no control flow.

On TPU the score map runs as a Pallas kernel (one tile+halo DMA pass,
all 16 ring diffs and arc-mins in VMEM) instead of the XLA roll-stack
formulation, which materializes ~10 full-image (16, H, W) passes in
HBM — measured 10.4 ms -> ~1 ms per frame at the bench workload (8
levels of 1920x1440).  The XLA path remains the CPU/mesh twin; the two
agree exactly on the interior (the <=3 px frame differs — wrap vs zero
halo — and is masked by the 16 px detector border either way).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 (dy, dx), circularly ordered (OpenCV's
# 16-pixel ring).
CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

ARC = 9  # contiguous run length for FAST-9/16


def fast_score_map(image: jnp.ndarray) -> jnp.ndarray:
    """Dense FAST-9/16 score map.

    image: (H, W) float32.
    Returns (H, W) float32 where score[y, x] = the largest threshold t
    for which (y, x) is a FAST-9 corner (<= 0 if never).  This is
    exactly OpenCV's nonmax score, computed in closed form:

        score = max over the 16 arcs of length 9 of
                min over the arc of (p_i - p)      [bright arc]
           vs   min over the arc of (p - p_i)      [dark arc]

    The arc-min is computed with a log-doubling trick over the circular
    16-axis (min of 9 consecutive = min(min8, shift8(d))).

    Internally computes in bfloat16: pixel values are 0..255 and their
    differences are integers up to +-255, all exactly representable in
    bf16 for integer-valued images — identical scores at half the HBM
    traffic.  (Resized pyramid levels are non-integer; the <=0.5 unit
    rounding there is far below the FAST thresholds 7/20.)
    """
    im = image.astype(jnp.bfloat16)
    c = jnp.stack([jnp.roll(im, (-dy, -dx), axis=(0, 1)) for dy, dx in CIRCLE])
    d_bright = c - im[None]  # (16, H, W): p_i - p
    d_dark = -d_bright

    def arcmin9(d):
        m2 = jnp.minimum(d, jnp.roll(d, -1, axis=0))
        m4 = jnp.minimum(m2, jnp.roll(m2, -2, axis=0))
        m8 = jnp.minimum(m4, jnp.roll(m4, -4, axis=0))
        m9 = jnp.minimum(m8, jnp.roll(d, -8, axis=0))
        return jnp.max(m9, axis=0)

    return jnp.maximum(arcmin9(d_bright),
                       arcmin9(d_dark)).astype(jnp.float32)


# ----------------------------------------------------------------------
# Pallas TPU kernel: score map in one tiled pass
# ----------------------------------------------------------------------

def _score_tile_kernel(img_ref, out_ref, tile, sem):
    """One (TH, TW) output tile: DMA the (TH+8, TW+128) halo'd window
    from HBM, compute all 16 ring diffs + both arc-min reductions in
    VMEM."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    th = out_ref.shape[0]
    tw = out_ref.shape[1]
    dma = pltpu.make_async_copy(
        img_ref.at[pl.ds(i * th, th + 8), pl.ds(j * tw, tw + 128)],
        tile, sem)
    dma.start()
    dma.wait()
    # bf16 throughout: pixel diffs are integers within +-255, exact in
    # bf16, and min/max preserve exactness — half the VMEM footprint
    t = tile[:]
    # center at halo offset (+3, +3) in the padded window
    c = t[3:3 + th, 3:3 + tw]
    d_bright = [t[3 + dy:3 + dy + th, 3 + dx:3 + dx + tw] - c
                for dy, dx in CIRCLE]

    def arcmin9(d):
        # min over 9 consecutive ring positions, max over the 16 starts
        m2 = [jnp.minimum(d[k], d[(k + 1) % 16]) for k in range(16)]
        m4 = [jnp.minimum(m2[k], m2[(k + 2) % 16]) for k in range(16)]
        m8 = [jnp.minimum(m4[k], m4[(k + 4) % 16]) for k in range(16)]
        m9 = [jnp.minimum(m8[k], d[(k + 8) % 16]) for k in range(16)]
        out = m9[0]
        for k in range(1, 16):
            out = jnp.maximum(out, m9[k])
        return out

    d_dark = [-d for d in d_bright]
    out_ref[:] = jnp.maximum(arcmin9(d_bright),
                             arcmin9(d_dark)).astype(jnp.float32)


@functools.lru_cache(maxsize=32)
def _score_map_pallas(h: int, w: int):
    """Jittable Pallas score map for a fixed image shape."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # tile sized so the ~64 live (TH, TW) bf16 arc-min intermediates
    # stay well under the 16 MB VMEM budget
    TH = 128 if h >= 128 else max(8, (h + 7) // 8 * 8)
    TW = 256 if w >= 256 else max(128, (w + 127) // 128 * 128)
    gh = -(-h // TH)
    gw = -(-w // TW)

    def run(image):
        # 3 px halo top/left; bottom/right padded to the grid plus the
        # (8, 128)-aligned DMA window overrun
        pad_b = gh * TH + 8 - (h + 3)
        pad_r = gw * TW + 128 - (w + 3)
        img_p = jnp.pad(image.astype(jnp.bfloat16),
                        ((3, pad_b), (3, pad_r)))
        out = pl.pallas_call(
            _score_tile_kernel,
            grid=(gh, gw),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((gh * TH, gw * TW),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((TH + 8, TW + 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(img_p)
        return out[:h, :w]

    return run


def score_map(image: jnp.ndarray) -> jnp.ndarray:
    """Dense FAST-9/16 score map — Pallas kernel on TPU, XLA twin
    elsewhere (exact agreement outside the 3 px frame, which the
    detector border masks)."""
    if jax.default_backend() == "tpu":
        h, w = image.shape
        return _score_map_pallas(h, w)(image)
    return fast_score_map(image)


def nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression mask (ties broken toward the
    top-left so plateaus yield a single detection)."""
    h, w = score.shape
    pad = jnp.pad(score, 1, constant_values=-jnp.inf)
    # tiny raster-order bias so equal neighbors don't both survive
    bias = (
        jnp.arange(h + 2, dtype=score.dtype)[:, None] * (w + 2)
        + jnp.arange(w + 2, dtype=score.dtype)[None, :]
    ) * 1e-6
    biased = pad - bias
    neigh = jnp.stack(
        [
            biased[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
            if not (dy == 0 and dx == 0)
        ]
    )
    center = biased[1 : 1 + h, 1 : 1 + w]
    return center > jnp.max(neigh, axis=0)


def _cell_any(mask: jnp.ndarray, cell: int) -> jnp.ndarray:
    """Per-pixel broadcast of 'does my cell contain any True'."""
    h, w = mask.shape
    ph = (-h) % cell
    pw = (-w) % cell
    m = jnp.pad(mask, ((0, ph), (0, pw)))
    hc, wc = m.shape[0] // cell, m.shape[1] // cell
    cells = m.reshape(hc, cell, wc, cell).any(axis=(1, 3))
    back = jnp.repeat(jnp.repeat(cells, cell, axis=0), cell, axis=1)
    return back[:h, :w]


def detect(
    image: jnp.ndarray,
    th_hi: float = 20.0,
    th_lo: float = 7.0,
    cell: int = 30,
    border: int = 16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full detection pass for one pyramid level.

    Returns (corner_mask, score_map).  A pixel is kept if it is an NMS
    peak and either clears th_hi, or clears th_lo while its 30x30 cell
    has no th_hi corner (the reference's fallback semantics,
    src/ORBextractor.cc:1115-1124).  ``border`` masks the frame where
    the ring/descriptor would leave the image (EDGE_THRESHOLD-3 = 16,
    src/ORBextractor.cc:1047-1050).
    """
    score = score_map(image)
    h, w = image.shape
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    in_bounds = (yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border)

    peaks = nms3(jnp.where(in_bounds, score, -jnp.inf)) & in_bounds
    hi = peaks & (score > th_hi)
    lo = peaks & (score > th_lo)
    cell_has_hi = _cell_any(hi, cell)
    keep = hi | (lo & ~cell_has_hi)
    return keep, score
