"""Native host runtime (orb_slam2_tpu/native) vs numpy oracles."""
import numpy as np
import pytest

from orb_slam2_tpu import native


def _rand_desc(rng, n):
    return rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint64).astype(np.uint32)


def test_native_builds():
    assert native.available(), "g++ is in the image; native must build"


def test_hamming_matrix_matches_numpy():
    rng = np.random.default_rng(0)
    a, b = _rand_desc(rng, 37), _rand_desc(rng, 53)
    got = native.hamming_matrix(a, b)
    x = np.bitwise_xor(a[:, None, :], b[None, :, :])
    want = np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)
    np.testing.assert_array_equal(got, want)


def test_min_median_descriptor():
    rng = np.random.default_rng(1)
    descs = _rand_desc(rng, 9)
    # make row 4 the obvious medoid: copy it several times
    descs[1] = descs[4]
    descs[7] = descs[4]
    idx = native.min_median_descriptor_index(descs)
    d = native.hamming_matrix(descs, descs)
    meds = np.median(d, axis=1)
    assert meds[idx] == meds.min()


def test_kfdb_query_counts_and_scores():
    db = native.NativeKfDatabase()
    db.add(0, {1: 0.5, 2: 0.5})
    db.add(1, {2: 0.25, 3: 0.75})
    db.add(2, {7: 1.0})
    kids, counts, scores = db.query({2: 0.4, 3: 0.6})
    got = dict(zip(kids.tolist(), counts.tolist()))
    assert got == {0: 1, 1: 2}
    sc = dict(zip(kids.tolist(), scores.tolist()))
    # L1 score: 0.5*sum(|a|+|b|-|a-b|) over shared words
    assert abs(sc[0] - 0.5 * (0.4 + 0.5 - 0.1)) < 1e-6
    assert abs(sc[1] - 0.5 * ((0.4 + 0.25 - 0.15) + (0.6 + 0.75 - 0.15))) < 1e-6
    # exclusion + erase
    kids, _, _ = db.query({2: 0.4, 3: 0.6}, exclude=[1])
    assert set(kids.tolist()) == {0}
    db.erase(0)
    kids, _, _ = db.query({2: 0.4, 3: 0.6})
    assert set(kids.tolist()) == {1}
    assert len(db) == 2


def test_covis_count():
    # 3 points: obs lists (excluding self kid 9)
    obs_kids = np.array([1, 2, 1, 2, 3, 1, 9], np.int32)
    obs_offsets = np.array([0, 2, 5, 7], np.int64)
    kids, weights = native.covis_count(obs_kids, obs_offsets, self_kid=9,
                                       threshold=2)
    got = dict(zip(kids.tolist(), weights.tolist()))
    assert got == {1: 3, 2: 2}
    # below threshold: single best kept
    kids, weights = native.covis_count(obs_kids, obs_offsets, self_kid=9,
                                       threshold=10)
    assert kids.tolist() == [1] and weights.tolist() == [3]
