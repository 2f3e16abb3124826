"""Core matching primitives: Hamming distances + masked selection.

Replaces ORBmatcher::DescriptorDistance (src/ORBmatcher.cc:1991-2011),
the TH_LOW/TH_HIGH thresholds and best/second-best ratio logic common
to all search routines (include/ORBmatcher.h:217-219), and the
three-maxima rotation-histogram filter (src/ORBmatcher.cc:1943-1989).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Same acceptance thresholds as the reference (include/ORBmatcher.h:217-218).
TH_LOW = 50
TH_HIGH = 100
HISTO_BINS = 30  # HISTO_LENGTH (include/ORBmatcher.h:219)

_BIG = jnp.int32(1 << 20)  # "infinite" distance for masked-out pairs


def unpack_bits_pm1(desc: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) in {-1, +1}.

    Enables the MXU Hamming trick: for a, b in {-1,+1}^256,
    hamming(a, b) = (256 - a . b) / 2, exact in bf16xbf16->f32.
    """
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[0], 256)
    return (bits.astype(jnp.float32) * 2.0 - 1.0).astype(dtype)


def hamming_matrix(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) x (M, 8) uint32 -> (N, M) int32 Hamming distances.

    Runs on the MXU as a single 256-deep matmul rather than per-pair
    popcounts — the TPU replacement for the bit-hack popcount loop of
    src/ORBmatcher.cc:1991-2011.
    """
    a = unpack_bits_pm1(d1)
    b = unpack_bits_pm1(d2)
    dot = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return ((256.0 - dot) * 0.5).astype(jnp.int32)


def hamming_popcount(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Reference-semantics popcount path (used by tests as an oracle
    and for tiny problem sizes)."""
    acc = jnp.zeros((d1.shape[0], d2.shape[0]), jnp.int32)
    for k in range(8):
        x = jnp.bitwise_xor(d1[:, None, k], d2[None, :, k])
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    return acc


class MatchResult(NamedTuple):
    idx: jnp.ndarray    # (N,) int32 — best column per row (0 if none)
    dist: jnp.ndarray   # (N,) int32 — best distance (BIG if none)
    valid: jnp.ndarray  # (N,) bool

    def host(self) -> "MatchResult":
        """All three fields in ONE device->host transfer (separate
        np.asarray reads each pay a tunnel round trip)."""
        return MatchResult(*jax.device_get(tuple(self)))


def best_match(
    dist: jnp.ndarray,
    mask: jnp.ndarray,
    max_dist: int = TH_LOW,
    ratio: float | None = None,
) -> MatchResult:
    """Masked per-row best match with optional best/second-best ratio.

    dist: (N, M) int32, mask: (N, M) bool of admissible pairs.
    ``ratio``: accept only if best < ratio * second_best (the
    mfNNratio test used by SearchByBoW/SearchForInitialization,
    src/ORBmatcher.cc:330-344, 664-668).
    """
    d = jnp.where(mask, dist, _BIG)
    best_idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.min(d, axis=1)
    ok = best <= max_dist
    if ratio is not None:
        n = d.shape[1]
        d2 = jnp.where(
            jax.nn.one_hot(best_idx, n, dtype=bool), _BIG, d)
        second = jnp.min(d2, axis=1)
        ok = ok & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    return MatchResult(idx=best_idx, dist=best, valid=ok)


def mutual_best(dist: jnp.ndarray, mask: jnp.ndarray, fwd: MatchResult) -> jnp.ndarray:
    """Require row i's best column j to also have row i as ITS best.

    Subsumes the reference's 'steal the match if closer' dedup
    (src/ORBmatcher.cc:620-640): at most one row can win each column.
    Returns updated validity (N,) bool.
    """
    d = jnp.where(mask, dist, _BIG)
    col_best_row = jnp.argmin(d, axis=0).astype(jnp.int32)  # (M,)
    rows = jnp.arange(dist.shape[0], dtype=jnp.int32)
    return fwd.valid & (col_best_row[fwd.idx] == rows)


def rotation_consistency_mask(
    angle1: jnp.ndarray,
    angle2_of_match: jnp.ndarray,
    valid: jnp.ndarray,
    n_keep: int = 3,
) -> jnp.ndarray:
    """Keep only matches whose angle difference falls in the 3 most
    populated of 30 histogram bins (ComputeThreeMaxima,
    src/ORBmatcher.cc:1943-1989; the reference also drops bins with
    <10% of the max count — reproduced here).

    angle1: (N,) radians of source keypoints.
    angle2_of_match: (N,) radians of each source's matched keypoint.
    """
    rot = (angle1 - angle2_of_match) % (2.0 * jnp.pi)
    bins = jnp.clip(
        (rot * (HISTO_BINS / (2.0 * jnp.pi))).astype(jnp.int32), 0, HISTO_BINS - 1)
    counts = jnp.zeros((HISTO_BINS,), jnp.int32).at[bins].add(
        valid.astype(jnp.int32))
    top_vals, top_idx = jax.lax.top_k(counts, n_keep)
    # reference: keep bin k (k>0) only if count > 0.1 * max count
    keep_bin = top_vals > (top_vals[0].astype(jnp.float32) * 0.1).astype(jnp.int32)
    in_top = jnp.zeros((HISTO_BINS,), bool).at[top_idx].set(keep_bin)
    return valid & in_top[bins]
