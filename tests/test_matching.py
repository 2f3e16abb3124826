"""Tests for Hamming matching primitives and search routines."""
import numpy as np
import pytest

import jax.numpy as jnp

from orb_slam2_tpu.matching import core, search, frustum
from orb_slam2_tpu.ops import extractor

cv2 = pytest.importorskip("cv2")


def rand_desc(n, rng):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


class TestHamming:
    def test_mxu_trick_equals_popcount(self):
        rng = np.random.default_rng(0)
        d1 = jnp.asarray(rand_desc(100, rng))
        d2 = jnp.asarray(rand_desc(77, rng))
        a = np.asarray(core.hamming_matrix(d1, d2))
        b = np.asarray(core.hamming_popcount(d1, d2))
        np.testing.assert_array_equal(a, b)
        assert a.min() >= 0 and a.max() <= 256

    def test_zero_and_full_distance(self):
        d = jnp.asarray(np.array([[0] * 8, [0xFFFFFFFF] * 8], dtype=np.uint32))
        m = np.asarray(core.hamming_matrix(d, d))
        assert m[0, 0] == 0 and m[1, 1] == 0
        assert m[0, 1] == 256 and m[1, 0] == 256


class TestBestMatch:
    def test_ratio_and_mask(self):
        dist = jnp.asarray(np.array([
            [10, 40, 200],   # best 10, second 40 -> ratio .25 ok
            [30, 33, 200],   # ratio .91 -> fails ratio 0.8
            [5, 100, 200],   # best is masked out -> falls to 100
        ], np.int32))
        mask = jnp.asarray(np.array([
            [True, True, True],
            [True, True, True],
            [False, True, True],
        ]))
        res = core.best_match(dist, mask, max_dist=50, ratio=0.8)
        v = np.asarray(res.valid)
        assert v[0] and not v[1]
        assert np.asarray(res.idx)[0] == 0
        assert np.asarray(res.dist)[2] == 100

    def test_mutual_best(self):
        # rows 0 and 1 both want col 0; row 1 is closer
        dist = jnp.asarray(np.array([[20, 60], [10, 60]], np.int32))
        mask = jnp.ones((2, 2), bool)
        res = core.best_match(dist, mask, max_dist=100)
        v = np.asarray(core.mutual_best(dist, mask, res))
        assert not v[0] and v[1]

    def test_rotation_consistency(self):
        n = 100
        rng = np.random.default_rng(1)
        a1 = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        a2 = (a1 - 0.5).astype(np.float32)  # consistent rotation of 0.5 rad
        a2[:10] = rng.uniform(0, 2 * np.pi, 10)  # 10 outliers
        valid = jnp.ones(n, bool)
        keep = np.asarray(core.rotation_consistency_mask(
            jnp.asarray(a1), jnp.asarray(a2), valid))
        assert keep[10:].mean() > 0.95
        assert keep[:10].mean() < 0.5


def synth_pair(shift=(8, 5), h=240, w=320, seed=0):
    rng = np.random.default_rng(seed)
    big = rng.uniform(0, 255, size=((h + 64) // 8, (w + 64) // 8)).astype(np.float32)
    big = cv2.resize(big, (w + 64, h + 64), interpolation=cv2.INTER_CUBIC)
    big = np.clip(big, 0, 255).astype(np.float32)
    img1 = big[32:32 + h, 32:32 + w]
    img2 = big[32 + shift[1]:32 + shift[1] + h, 32 + shift[0]:32 + shift[0] + w]
    return img1, img2


class TestSearchForInitialization:
    def test_translation_recovered(self):
        img1, img2 = synth_pair()
        params = extractor.OrbParams(n_features=300, n_levels=3)
        run = extractor.make_extractor(240, 320, params)
        f1 = run(jnp.asarray(img1))
        f2 = run(jnp.asarray(img2))
        res = search.search_for_initialization(
            f1.xy, f1.desc, f1.valid, f1.octave, f1.angle,
            f2.xy, f2.desc, f2.valid, f2.octave, f2.angle,
            window=50.0)
        v = np.asarray(res.valid)
        assert v.sum() > 30, f"only {v.sum()} matches"
        xy1 = np.asarray(f1.xy)[v]
        xy2 = np.asarray(f2.xy)[np.asarray(res.idx)[v]]
        d = xy1 - xy2  # feature at (x,y) in img1 appears at (x-8, y-5) in img2
        med = np.median(d, axis=0)
        np.testing.assert_allclose(med, [8.0, 5.0], atol=1.0)
        inlier = (np.abs(d - [8, 5]) < 2).all(axis=1).mean()
        assert inlier > 0.8, f"inlier rate {inlier}"


class TestEpipolar:
    def test_distance_formula(self):
        rng = np.random.default_rng(2)
        F = rng.normal(size=(3, 3)).astype(np.float32)
        xy1 = rng.uniform(0, 320, size=(5, 2)).astype(np.float32)
        xy2 = rng.uniform(0, 320, size=(7, 2)).astype(np.float32)
        d = np.asarray(search.epipolar_distance_sq(
            jnp.asarray(xy1), jnp.asarray(xy2), jnp.asarray(F)))
        for i in range(5):
            l = np.array([xy1[i, 0], xy1[i, 1], 1.0]) @ F
            for j in range(7):
                num = l[0] * xy2[j, 0] + l[1] * xy2[j, 1] + l[2]
                ref = num ** 2 / (l[0] ** 2 + l[1] ** 2)
                np.testing.assert_allclose(d[i, j], ref, rtol=1e-3)


class TestFrustum:
    def test_gates(self):
        # points in front, behind, out of image, wrong distance
        pts = np.array([
            [0, 0, 5],      # visible
            [0, 0, -5],     # behind
            [50, 0, 5],     # projects outside
            [0, 0, 100],    # too far (max_dist 20)
            [0, 0, 5],      # bad viewing angle (normal flipped)
        ], np.float32)
        normals = np.tile(np.array([0, 0, 1], np.float32), (5, 1))
        normals[4] = [0, 0, -1]
        res = frustum.is_in_frustum(
            jnp.asarray(pts), jnp.asarray(normals),
            jnp.full(5, 1.0), jnp.full(5, 20.0), jnp.ones(5, bool),
            jnp.eye(4), 500., 500., 160., 120., (0., 320., 0., 240.),
            n_levels=8, log_scale_factor=float(np.log(1.2)))
        vis = np.asarray(res.visible)
        assert list(vis) == [True, False, False, False, False]
        np.testing.assert_allclose(np.asarray(res.uv)[0], [160, 120], atol=1e-3)

    def test_pred_level(self):
        pts = np.array([[0, 0, 10.0], [0, 0, 2.0]], np.float32)
        normals = np.tile(np.array([0, 0, 1], np.float32), (2, 1))
        res = frustum.is_in_frustum(
            jnp.asarray(pts), jnp.asarray(normals),
            jnp.full(2, 0.5), jnp.full(2, 12.0), jnp.ones(2, bool),
            jnp.eye(4), 500., 500., 160., 120., (0., 320., 0., 240.),
            n_levels=8, log_scale_factor=float(np.log(1.2)))
        lv = np.asarray(res.pred_level)
        assert lv[1] > lv[0]  # closer point -> coarser predicted level
