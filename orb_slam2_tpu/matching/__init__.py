"""Descriptor matching ops — replaces src/ORBmatcher.cc (2k LoC).

The reference accelerates its 8 search routines with image grids, BoW
node alignment, and per-candidate loops.  On TPU the whole problem is
one dense masked distance matrix: 4000x4000x256-bit Hamming is ~4 GMAC
on the MXU (sub-millisecond), so every search becomes

    distance matrix (+/-1 bit-matmul)  ->  candidate mask (geometry,
    scale, rotation, BoW-node, epipolar)  ->  masked argmin + ratio
    test (+ mutual-best / rotation-histogram filters)

with no data-dependent control flow.
"""
from .core import (  # noqa: F401
    hamming_matrix,
    unpack_bits_pm1,
    best_match,
    mutual_best,
    rotation_consistency_mask,
    TH_LOW,
    TH_HIGH,
)
