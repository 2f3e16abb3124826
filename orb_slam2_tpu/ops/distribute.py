"""Spatially-uniform keypoint selection with static shapes.

Functional equivalent of ORBextractor::DistributeOctTree
(src/ORBextractor.cc:690-1008): the reference recursively quad-subdivides
until it has ~n cells and keeps the best-response corner per leaf.  The
behavioral contract is "pick up to n corners, spread evenly over the
image, preferring high response".

TPU-native recast: fixed grid cells sized so #cells ~= 2n, take the
top-k corners per cell (one reshape + lax.top_k), assign each candidate
a priority (cell-rank first, then response), and take the global top-n
by priority.  Round-robin by rank reproduces the octree's key property:
every occupied cell contributes its best corner before any cell
contributes its second.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax


def grid_topk(
    corner_mask: jnp.ndarray,
    score: jnp.ndarray,
    n_target: int,
    k_per_cell: int = 3,
    cell: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Select up to ``n_target`` corners, evenly spread.

    corner_mask, score: (H, W).
    Returns (ys, xs, valid) each (n_target,) int32 / bool, sorted by
    selection priority.  Slots beyond the number of available corners
    have valid=False.
    """
    h, w = corner_mask.shape
    if cell is None:
        # ~2*n_target cells; clamp to something reasonable
        cell = max(8, int(math.sqrt(h * w / max(2 * n_target, 1))))
    ph = (-h) % cell
    pw = (-w) % cell
    s = jnp.where(corner_mask, score, -jnp.inf)
    s = jnp.pad(s, ((0, ph), (0, pw)), constant_values=-jnp.inf)
    hp, wp = h + ph, w + pw
    hc, wc = hp // cell, wp // cell

    # (cells, cell*cell) layout; remember each pixel's global coords.
    tiles = s.reshape(hc, cell, wc, cell).transpose(0, 2, 1, 3).reshape(hc * wc, cell * cell)
    vals, idx = lax.top_k(tiles, k_per_cell)  # (cells, k)

    cy = (jnp.arange(hc * wc, dtype=jnp.int32) // wc)[:, None]
    cx = (jnp.arange(hc * wc, dtype=jnp.int32) % wc)[:, None]
    ys = cy * cell + idx // cell
    xs = cx * cell + idx % cell

    rank = jnp.broadcast_to(jnp.arange(k_per_cell, dtype=jnp.float32)[None, :], vals.shape)
    valid = jnp.isfinite(vals)
    # priority key: lower is better. rank dominates (score <= 255 always).
    key = jnp.where(valid, rank * 1024.0 - vals, jnp.inf)

    key = key.reshape(-1)
    ys = ys.reshape(-1)
    xs = xs.reshape(-1)
    scores = vals.reshape(-1)

    n_take = min(n_target, key.shape[0])
    neg_top, sel = lax.top_k(-key, n_take)
    out_y = ys[sel]
    out_x = xs[sel]
    out_s = scores[sel]
    out_valid = jnp.isfinite(-neg_top)
    if n_take < n_target:
        pad = n_target - n_take
        out_y = jnp.concatenate([out_y, jnp.zeros(pad, jnp.int32)])
        out_x = jnp.concatenate([out_x, jnp.zeros(pad, jnp.int32)])
        out_s = jnp.concatenate([out_s, jnp.full(pad, -jnp.inf, out_s.dtype)])
        out_valid = jnp.concatenate([out_valid, jnp.zeros(pad, bool)])
    return out_y.astype(jnp.int32), out_x.astype(jnp.int32), out_s, out_valid
