"""Pallas TPU kernel: fused 256-bit Hamming distance + top-2 search.

The workhorse of every ORB matcher is "for each query descriptor, find
the best and second-best Hamming match" (src/ORBmatcher.cc:74-160 and
friends).  The XLA path (matching/core.py) materializes the unpacked
±1 operands and the full (N, M) distance matrix in HBM; this kernel
tiles the computation on the MXU and keeps everything in VMEM:

  per (128, 128) tile:  unpack both descriptor blocks to ±1 bf16 in
  VMEM -> one 256-deep MXU matmul -> distances -> running top-2 merge
  per query row.  The (N, M) matrix never exists in memory.

HBM traffic drops from O(N*M) to O(N + M); for the 4000x4000 frame-
match case that is 64 MB -> 250 KB.

API: :func:`hamming_top2_auto` returns (best_dist, best_idx,
second_dist) per row, dispatching to the Pallas kernel on TPU and the
XLA path (:func:`hamming_top2_xla`) on any other backend.
:func:`hamming_top2` is the raw TPU kernel (also runnable with
``interpret=True`` in tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1 << 20  # plain int: jnp scalars would be captured consts in the kernel
TILE = 128


def _unpack_word_pm1(block, w):
    """Word ``w`` of a (T, 8) uint32 block -> (T, 32) bf16 in {-1, +1}.

    Strictly 2-D: Mosaic cannot collapse a (T, 8, 32) -> (T, 256)
    reshape, so the 256-deep contraction runs as 8 accumulating
    32-deep MXU matmuls instead."""
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 32), 1)
    bits = (block[:, w][:, None] >> shifts) & jnp.uint32(1)
    # Mosaic can't cast uint32 -> float directly; hop through int32
    return bits.astype(jnp.int32).astype(jnp.float32) * 2 - 1


def _kernel(d1_ref, d2_ref, v2_ref, best_ref, idx_ref, second_ref):
    j = pl.program_id(1)

    d1 = d1_ref[:]
    d2 = d2_ref[:]
    dot = jnp.zeros((d1.shape[0], d2.shape[0]), jnp.float32)
    for w in range(8):
        a = _unpack_word_pm1(d1, w)      # (T, 32)
        b = _unpack_word_pm1(d2, w)
        dot = dot + jax.lax.dot_general(
            a, b.T, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    # keep distances in f32: Mosaic's argmin lowering supports f32 only
    d = (256.0 - dot) * 0.5

    # mask invalid columns (vectors travel as (1, 8, T) blocks: 1-D
    # arrays clash with XLA's T(1024) layout and (1, T) blocks violate
    # the sublane-divisibility rule, so row 0 of an 8-sublane block
    # carries the payload)
    v2 = v2_ref[0, 0, :]                  # (T,) int32
    d = d + (1 - v2)[None, :].astype(jnp.float32) * float(BIG)

    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    local_arg = jnp.argmin(d, axis=1).astype(jnp.int32)
    local_best = jnp.min(d, axis=1).astype(jnp.int32)
    d2nd = jnp.where(cols == local_arg[:, None], float(BIG), d)
    local_second = jnp.min(d2nd, axis=1).astype(jnp.int32)
    local_gidx = local_arg + j * TILE

    @pl.when(j == 0)
    def _():
        best_ref[0, 0, :] = local_best
        idx_ref[0, 0, :] = local_gidx
        second_ref[0, 0, :] = local_second

    @pl.when(j != 0)
    def _():
        b0 = best_ref[0, 0, :]
        s0 = second_ref[0, 0, :]
        i0 = idx_ref[0, 0, :]
        nb = jnp.minimum(b0, local_best)
        ns = jnp.minimum(jnp.maximum(b0, local_best),
                         jnp.minimum(s0, local_second))
        ni = jnp.where(local_best < b0, local_gidx, i0)
        best_ref[0, 0, :] = nb
        idx_ref[0, 0, :] = ni
        second_ref[0, 0, :] = ns


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_top2(desc1: jnp.ndarray, desc2: jnp.ndarray,
                 valid2: jnp.ndarray, interpret: bool = False):
    """Fused Hamming top-2: (N, 8) x (M, 8) uint32 + (M,) col validity
    -> (best (N,), best_idx (N,), second (N,)).  N, M must be multiples
    of 128 (callers already pad to power-of-4 buckets >= 256)."""
    N, M = desc1.shape[0], desc2.shape[0]
    assert N % TILE == 0 and M % TILE == 0, (N, M)
    grid = (N // TILE, M // TILE)
    v2 = jnp.broadcast_to(
        valid2.astype(jnp.int32).reshape(M // TILE, 1, TILE),
        (M // TILE, 8, TILE))
    vec_spec = lambda which: pl.BlockSpec(
        (1, 8, TILE), (lambda i, j: (j, 0, 0)) if which == "j"
        else (lambda i, j: (i, 0, 0)), memory_space=pltpu.VMEM)
    best, idx, second = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            vec_spec("j"),
        ],
        out_specs=[vec_spec("i"), vec_spec("i"), vec_spec("i")],
        out_shape=[
            jax.ShapeDtypeStruct((N // TILE, 8, TILE), jnp.int32),
            jax.ShapeDtypeStruct((N // TILE, 8, TILE), jnp.int32),
            jax.ShapeDtypeStruct((N // TILE, 8, TILE), jnp.int32),
        ],
        interpret=interpret,
    )(desc1, desc2, v2)
    return (best[:, 0, :].reshape(N), idx[:, 0, :].reshape(N),
            second[:, 0, :].reshape(N))


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    import jax as _jax
    try:
        return _jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def hamming_top2_auto(desc1, desc2, valid2):
    """Backend-dispatching fused Hamming top-2: Pallas kernel on TPU,
    XLA matmul path elsewhere (the kernel's Mosaic lowering is
    TPU-only)."""
    if _on_tpu():
        return hamming_top2(desc1, desc2, valid2)
    return hamming_top2_xla(desc1, desc2, valid2)


def hamming_top2_xla(desc1, desc2, valid2):
    """Reference XLA implementation (oracle for tests / non-TPU path)."""
    from . import core
    d = core.hamming_matrix(desc1, desc2)
    d = jnp.where(valid2[None, :], d, jnp.int32(BIG))
    best_idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.min(d, axis=1)
    cols = jnp.arange(d.shape[1])[None, :]
    d2 = jnp.where(cols == best_idx[:, None], jnp.int32(BIG), d)
    second = jnp.min(d2, axis=1)
    return best, best_idx, second


# ----------------------------------------------------------------------
# v2: masked top-2 + mutual-best in ONE kernel.
#
# Reproduces the full windowed projection-search inner loop
# (SearchByProjection's radius window + pyramid-level band + validity
# masks, src/ORBmatcher.cc:64-160 / :1633-1797) without ever
# materializing the (N, M) distance matrix or its ~6 mask byproducts
# in HBM.  Distances and indices travel as PACKED KEYS
# (key = dist * M + col), so plain f32 MIN reductions reproduce
# jnp.argmin's first-index tie-breaking exactly — no argmin, no
# in-kernel gathers (both are Mosaic trouble spots).
#
# Row attributes ride in ONE (G, 8, T) block using sublane rows:
#   0: proj u   1: proj v   2: radius   3: lvl_min   4: lvl_max
#   5: row valid
# Column attributes likewise: 0: kp x  1: kp y  2: octave  3: valid.
# ----------------------------------------------------------------------

MASK_D = 1023.0      # masked-pair distance sentinel (real max is 256)
COL_STRIDE = 4096    # key = d * COL_STRIDE + col  (requires M <= 4096)
ROW_STRIDE = 16384   # colkey = d * ROW_STRIDE + row (requires N <= 16384)


def _masked_kernel(d1_ref, d2_ref, rattr_ref, cattr_ref,
                   bkey_ref, skey_ref, ckey_ref):
    j = pl.program_id(1)

    d1 = d1_ref[:]
    d2 = d2_ref[:]
    dot = jnp.zeros((d1.shape[0], d2.shape[0]), jnp.float32)
    for w in range(8):
        a = _unpack_word_pm1(d1, w)
        b = _unpack_word_pm1(d2, w)
        dot = dot + jax.lax.dot_general(
            a, b.T, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    d = (256.0 - dot) * 0.5                     # (T, T) exact small ints

    ux = rattr_ref[0, 0, :][:, None]
    uy = rattr_ref[0, 1, :][:, None]
    rad = rattr_ref[0, 2, :][:, None]
    lmin = rattr_ref[0, 3, :][:, None]
    lmax = rattr_ref[0, 4, :][:, None]
    rval = rattr_ref[0, 5, :][:, None]
    cx = cattr_ref[0, 0, :][None, :]
    cy = cattr_ref[0, 1, :][None, :]
    coct = cattr_ref[0, 2, :][None, :]
    cval = cattr_ref[0, 3, :][None, :]

    ok = ((rval > 0) & (cval > 0)
          & (jnp.abs(ux - cx) <= rad) & (jnp.abs(uy - cy) <= rad)
          & (coct >= lmin) & (coct <= lmax))
    dm = jnp.where(ok, d, MASK_D)

    i = pl.program_id(0)
    # Mosaic's tpu.iota is integer-only; build f32 indices via int32
    cols = jax.lax.broadcasted_iota(
        jnp.int32, dm.shape, 1).astype(jnp.float32) + j * TILE
    rows = jax.lax.broadcasted_iota(
        jnp.int32, dm.shape, 0).astype(jnp.float32) + i * TILE
    key = dm * COL_STRIDE + cols                # f32-exact (< 2^24)
    ckey = dm * ROW_STRIDE + rows

    lb = jnp.min(key, axis=1)
    key2 = jnp.where(key == lb[:, None], MASK_D * COL_STRIDE + cols, key)
    ls = jnp.min(key2, axis=1)
    lc = jnp.min(ckey, axis=0)

    @pl.when(j == 0)
    def _():
        bkey_ref[0, 0, :] = lb
        skey_ref[0, 0, :] = ls

    @pl.when(j != 0)
    def _():
        b0 = bkey_ref[0, 0, :]
        s0 = skey_ref[0, 0, :]
        bkey_ref[0, 0, :] = jnp.minimum(b0, lb)
        skey_ref[0, 0, :] = jnp.minimum(jnp.maximum(b0, lb),
                                        jnp.minimum(s0, ls))

    # Column-best: the (j-indexed) output block is only VMEM-resident
    # across consecutive revisits, and j is the INNER grid dim — an
    # i-accumulating read-modify-write would see stale VMEM from a
    # different column tile at i>0.  Write a per-(i, j) partial instead
    # (each block written exactly once) and min-reduce over i outside.
    ckey_ref[0, 0, 0, :] = lc


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_top2_mutual(desc1, desc2, row_attr, col_attr,
                       interpret: bool = False):
    """(N, 8) x (M, 8) descs + packed attribute blocks ->
    (best_key (N,), second_key (N,), col_key (M,)) as int32.

    row_attr: (N, 6) f32 [u, v, radius, lvl_min, lvl_max, valid]
    col_attr: (M, 4) f32 [x, y, octave, valid]
    Decode: dist = key // COL_STRIDE, col = key % COL_STRIDE;
    col-side row = col_key % ROW_STRIDE.  dist == MASK_D -> no match.
    """
    N, M = desc1.shape[0], desc2.shape[0]
    assert N % TILE == 0 and M % TILE == 0, (N, M)
    assert M <= COL_STRIDE and N <= ROW_STRIDE, (N, M)
    grid = (N // TILE, M // TILE)

    ra = jnp.zeros((N // TILE, 8, TILE), jnp.float32)
    ra = ra.at[:, :6, :].set(
        row_attr.T.reshape(6, N // TILE, TILE).transpose(1, 0, 2))
    ca = jnp.zeros((M // TILE, 8, TILE), jnp.float32)
    ca = ca.at[:, :4, :].set(
        col_attr.T.reshape(4, M // TILE, TILE).transpose(1, 0, 2))

    vec_i = pl.BlockSpec((1, 8, TILE), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vec_j = pl.BlockSpec((1, 8, TILE), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM)
    bkey, skey, ckey_part = pl.pallas_call(
        _masked_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            vec_i, vec_j,
        ],
        out_specs=[vec_i, vec_i,
                   pl.BlockSpec((1, 1, 8, TILE), lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((N // TILE, 8, TILE), jnp.float32),
            jax.ShapeDtypeStruct((N // TILE, 8, TILE), jnp.float32),
            jax.ShapeDtypeStruct((N // TILE, M // TILE, 8, TILE),
                                 jnp.float32),
        ],
        interpret=interpret,
    )(desc1, desc2, ra, ca)
    ckey = jnp.min(ckey_part[:, :, 0, :], axis=0).reshape(M)
    return (bkey[:, 0, :].reshape(N).astype(jnp.int32),
            skey[:, 0, :].reshape(N).astype(jnp.int32),
            ckey.astype(jnp.int32))


def _epi_kernel(d1_ref, d2_ref, rattr_ref, cattr_ref,
                bkey_ref, skey_ref, ckey_ref):
    """Epipolar-gated variant of :func:`_masked_kernel` — the inner
    loop of SearchForTriangulation (src/ORBmatcher.cc:853-1057): the
    admissibility test is distance-to-epipolar-line instead of a
    projection window.  Row attrs carry the PRE-NORMALIZED line of
    feature i in image 2 (a, b, c scaled by 1/sqrt(a^2+b^2)), col attrs
    the keypoint position and its chi2*sigma^2 threshold."""
    j = pl.program_id(1)

    d1 = d1_ref[:]
    d2 = d2_ref[:]
    dot = jnp.zeros((d1.shape[0], d2.shape[0]), jnp.float32)
    for w in range(8):
        a = _unpack_word_pm1(d1, w)
        b = _unpack_word_pm1(d2, w)
        dot = dot + jax.lax.dot_general(
            a, b.T, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    d = (256.0 - dot) * 0.5

    la = rattr_ref[0, 0, :][:, None]
    lb = rattr_ref[0, 1, :][:, None]
    lc = rattr_ref[0, 2, :][:, None]
    rval = rattr_ref[0, 3, :][:, None]
    kx = cattr_ref[0, 0, :][None, :]
    ky = cattr_ref[0, 1, :][None, :]
    thr = cattr_ref[0, 2, :][None, :]
    cval = cattr_ref[0, 3, :][None, :]

    e = la * kx + lb * ky + lc
    ok = (rval > 0) & (cval > 0) & (e * e < thr)
    dm = jnp.where(ok, d, MASK_D)

    i = pl.program_id(0)
    # Mosaic's tpu.iota is integer-only; build f32 indices via int32
    cols = jax.lax.broadcasted_iota(
        jnp.int32, dm.shape, 1).astype(jnp.float32) + j * TILE
    rows = jax.lax.broadcasted_iota(
        jnp.int32, dm.shape, 0).astype(jnp.float32) + i * TILE
    key = dm * COL_STRIDE + cols
    ckey = dm * ROW_STRIDE + rows

    lb_ = jnp.min(key, axis=1)
    key2 = jnp.where(key == lb_[:, None], MASK_D * COL_STRIDE + cols, key)
    ls = jnp.min(key2, axis=1)
    lc_ = jnp.min(ckey, axis=0)

    @pl.when(j == 0)
    def _():
        bkey_ref[0, 0, :] = lb_
        skey_ref[0, 0, :] = ls

    @pl.when(j != 0)
    def _():
        b0 = bkey_ref[0, 0, :]
        s0 = skey_ref[0, 0, :]
        bkey_ref[0, 0, :] = jnp.minimum(b0, lb_)
        skey_ref[0, 0, :] = jnp.minimum(jnp.maximum(b0, lb_),
                                        jnp.minimum(s0, ls))

    ckey_ref[0, 0, 0, :] = lc_


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_top2_epi(desc1, desc2, row_attr, col_attr,
                    interpret: bool = False):
    """Epipolar-gated fused Hamming top-2 (SearchForTriangulation inner
    loop).  row_attr: (N, 4) f32 [la, lb, lc, valid] with (la, lb, lc)
    the epipolar line pre-normalized by 1/sqrt(la^2+lb^2); col_attr:
    (M, 4) f32 [x, y, chi2_threshold, valid].  Returns packed keys like
    :func:`masked_top2_mutual`."""
    N, M = desc1.shape[0], desc2.shape[0]
    assert N % TILE == 0 and M % TILE == 0, (N, M)
    assert M <= COL_STRIDE and N <= ROW_STRIDE, (N, M)
    grid = (N // TILE, M // TILE)

    ra = jnp.zeros((N // TILE, 8, TILE), jnp.float32)
    ra = ra.at[:, :4, :].set(
        row_attr.T.reshape(4, N // TILE, TILE).transpose(1, 0, 2))
    ca = jnp.zeros((M // TILE, 8, TILE), jnp.float32)
    ca = ca.at[:, :4, :].set(
        col_attr.T.reshape(4, M // TILE, TILE).transpose(1, 0, 2))

    vec_i = pl.BlockSpec((1, 8, TILE), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vec_j = pl.BlockSpec((1, 8, TILE), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM)
    bkey, skey, ckey_part = pl.pallas_call(
        _epi_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            vec_i, vec_j,
        ],
        out_specs=[vec_i, vec_i,
                   pl.BlockSpec((1, 1, 8, TILE), lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((N // TILE, 8, TILE), jnp.float32),
            jax.ShapeDtypeStruct((N // TILE, 8, TILE), jnp.float32),
            jax.ShapeDtypeStruct((N // TILE, M // TILE, 8, TILE),
                                 jnp.float32),
        ],
        interpret=interpret,
    )(desc1, desc2, ra, ca)
    ckey = jnp.min(ckey_part[:, :, 0, :], axis=0).reshape(M)
    return (bkey[:, 0, :].reshape(N).astype(jnp.int32),
            skey[:, 0, :].reshape(N).astype(jnp.int32),
            ckey.astype(jnp.int32))


def masked_top2_epi_xla(desc1, desc2, row_attr, col_attr):
    """Bit-exact XLA twin of :func:`masked_top2_epi` (oracle + the
    non-TPU execution path)."""
    from . import core
    N, M = desc1.shape[0], desc2.shape[0]
    d = core.hamming_matrix(desc1, desc2).astype(jnp.float32)
    la, lb, lc, rval = [row_attr[:, k][:, None] for k in range(4)]
    kx, ky, thr, cval = [col_attr[:, k][None, :] for k in range(4)]
    e = la * kx + lb * ky + lc
    ok = (rval > 0) & (cval > 0) & (e * e < thr)
    dm = jnp.where(ok, d, MASK_D)
    cols = jnp.arange(M, dtype=jnp.float32)[None, :]
    rows = jnp.arange(N, dtype=jnp.float32)[:, None]
    key = dm * COL_STRIDE + cols
    ckey = dm * ROW_STRIDE + rows
    bkey = jnp.min(key, axis=1)
    key2 = jnp.where(key == bkey[:, None], MASK_D * COL_STRIDE + cols, key)
    skey = jnp.min(key2, axis=1)
    return (bkey.astype(jnp.int32), skey.astype(jnp.int32),
            jnp.min(ckey, axis=0).astype(jnp.int32))


def masked_top2_mutual_xla(desc1, desc2, row_attr, col_attr):
    """Bit-exact XLA twin of :func:`masked_top2_mutual` (oracle + the
    non-TPU execution path)."""
    from . import core
    N, M = desc1.shape[0], desc2.shape[0]
    d = core.hamming_matrix(desc1, desc2).astype(jnp.float32)
    ux, uy, rad, lmin, lmax, rval = [row_attr[:, k][:, None]
                                     for k in range(6)]
    cx, cy, coct, cval = [col_attr[:, k][None, :] for k in range(4)]
    ok = ((rval > 0) & (cval > 0)
          & (jnp.abs(ux - cx) <= rad) & (jnp.abs(uy - cy) <= rad)
          & (coct >= lmin) & (coct <= lmax))
    dm = jnp.where(ok, d, MASK_D)
    cols = jnp.arange(M, dtype=jnp.float32)[None, :]
    rows = jnp.arange(N, dtype=jnp.float32)[:, None]
    key = dm * COL_STRIDE + cols
    ckey = dm * ROW_STRIDE + rows
    bkey = jnp.min(key, axis=1)
    key2 = jnp.where(key == bkey[:, None], MASK_D * COL_STRIDE + cols, key)
    skey = jnp.min(key2, axis=1)
    return (bkey.astype(jnp.int32), skey.astype(jnp.int32),
            jnp.min(ckey, axis=0).astype(jnp.int32))
