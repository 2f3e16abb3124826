"""Image pyramid with static per-level shapes.

Replaces ORBextractor::ComputePyramid (src/ORBextractor.cc:1345-1410).
The reference resizes with cv::INTER_LINEAR level-to-level; we resize
from the previous level too (compounding matches OpenCV behavior more
closely than resizing from level 0 each time).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def level_shapes(
    height: int, width: int, n_levels: int, scale_factor: float
) -> List[Tuple[int, int]]:
    """Static (H, W) per level; level 0 is the input size."""
    shapes = []
    for lvl in range(n_levels):
        s = 1.0 / (scale_factor ** lvl)
        shapes.append((max(int(round(height * s)), 16), max(int(round(width * s)), 16)))
    return shapes


def scale_factors(n_levels: int, scale_factor: float):
    """(scale, inv_scale, sigma2, inv_sigma2) per level, like the
    mvScaleFactor/mvLevelSigma2 tables (src/ORBextractor.cc:486-505)."""
    import numpy as np
    sf = np.array([scale_factor ** i for i in range(n_levels)], np.float32)
    return sf, 1.0 / sf, sf * sf, 1.0 / (sf * sf)


def build_pyramid(
    image: jnp.ndarray, n_levels: int, scale_factor: float
) -> List[jnp.ndarray]:
    """image: (H, W) float32 in [0, 255] -> list of per-level images.

    Bilinear chain-resize; each level keeps a static shape from
    ``level_shapes``.
    """
    h, w = image.shape
    shapes = level_shapes(h, w, n_levels, scale_factor)
    levels = [image]
    for lvl in range(1, n_levels):
        prev = levels[-1]
        levels.append(
            jax.image.resize(prev, shapes[lvl], method="linear", antialias=False)
        )
    return levels


def gaussian_blur_7x7(image: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Separable 7x7 Gaussian, the descriptor pre-blur of
    ORBextractor.cc:1305 (GaussianBlur(..., Size(7,7), 2, 2, BORDER_REFLECT_101)).

    Shifted-add passes run in bfloat16 (half the HBM traffic); the
    <=1-unit rounding at 0..255 scale matches the reference's own uint8
    quantization of the blurred image before descriptor comparison.
    """
    import numpy as np
    r = 3
    x = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    kern = jnp.asarray(k, dtype=jnp.bfloat16)
    # reflect-101 padding then two 1-D convolutions via correlation
    pad = jnp.pad(image.astype(jnp.bfloat16), ((r, r), (r, r)),
                  mode="reflect")
    rows = sum(kern[i] * pad[i : i + image.shape[0], :] for i in range(2 * r + 1))
    cols = sum(kern[i] * rows[:, i : i + image.shape[1]] for i in range(2 * r + 1))
    return cols.astype(jnp.float32)
