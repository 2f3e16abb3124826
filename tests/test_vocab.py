"""Tests for the BoW vocabulary and keyframe database."""
import numpy as np
import pytest

import jax.numpy as jnp

from orb_slam2_tpu.models.vocabulary import Vocabulary
from orb_slam2_tpu.models.keyframe_db import KeyFrameDatabase


def rand_desc(n, rng):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def perturb(desc, n_bits, rng):
    """Flip n_bits random bits of each descriptor."""
    out = desc.copy()
    for i in range(len(out)):
        for _ in range(n_bits):
            w = rng.integers(8)
            b = rng.integers(32)
            out[i, w] ^= np.uint32(1) << np.uint32(b)
    return out


def clustered_desc(n, rng, n_protos=120, spread=20):
    """Descriptors clustered around prototypes (like real ORB data)."""
    protos = rand_desc(n_protos, rng)
    idx = rng.integers(0, n_protos, n)
    return perturb(protos[idx], spread, rng), idx


@pytest.fixture(scope="module")
def voc():
    rng = np.random.default_rng(0)
    d, _ = clustered_desc(5000, rng)
    return Vocabulary.train(d, k=8, levels=3, kmeans_iters=4)


class TestVocabulary:
    def test_transform_shapes(self, voc):
        rng = np.random.default_rng(1)
        d = rand_desc(100, rng)
        w = voc.transform_np(d)
        assert w.shape == (100,)
        assert (w >= 0).all() and (w < voc.n_words).all()

    def test_device_matches_host(self, voc):
        rng = np.random.default_rng(2)
        d = rand_desc(64, rng)
        w_host = voc.transform_np(d)
        w_dev, nodes = voc.transform(jnp.asarray(d))
        np.testing.assert_array_equal(np.asarray(w_dev), w_host)
        # node ids are the level-2 prefix of the word path
        np.testing.assert_array_equal(
            np.asarray(nodes), w_host // voc.k ** (voc.levels - voc.node_level))

    def test_similar_descriptors_same_word(self, voc):
        rng = np.random.default_rng(3)
        d, _ = clustered_desc(200, rng)
        d2 = perturb(d, 4, rng)  # 4 more flipped bits of 256
        w1 = voc.transform_np(d)
        w2 = voc.transform_np(d2)
        assert (w1 == w2).mean() > 0.5

    def test_bow_scoring_discriminates(self, voc):
        rng = np.random.default_rng(4)
        a = rand_desc(300, rng)
        a_noisy = perturb(a, 6, rng)
        b = rand_desc(300, rng)
        valid = np.ones(300, bool)
        va = voc.bow_vector(a, valid)
        va2 = voc.bow_vector(a_noisy, valid)
        vb = voc.bow_vector(b, valid)
        s_same = Vocabulary.score_l1(va, va2)
        s_diff = Vocabulary.score_l1(va, vb)
        # the tiny 512-word test vocab gives random pairs substantial
        # overlap; the production 10k-word vocab separates much harder
        assert s_same > 1.5 * s_diff, (s_same, s_diff)
        assert abs(Vocabulary.score_l1(va, va) - 1.0) < 1e-5

    def test_save_load_roundtrip(self, voc, tmp_path):
        p = str(tmp_path / "voc.npz")
        voc.save(p)
        voc2 = Vocabulary.load(p)
        rng = np.random.default_rng(5)
        d = rand_desc(50, rng)
        np.testing.assert_array_equal(voc.transform_np(d), voc2.transform_np(d))


class TestKeyFrameDatabase:
    def test_loop_candidates(self, voc):
        """Build a fake map: 10 'keyframes' with distinct appearance,
        the 10th revisits the 2nd's appearance."""
        from orb_slam2_tpu.models.mapstore import MapStore
        from orb_slam2_tpu.models.frame import Frame
        rng = np.random.default_rng(6)
        store = MapStore()
        db = KeyFrameDatabase(voc)
        descs = []
        n = 200
        for i in range(10):
            if i == 9:
                d = perturb(descs[2], 4, rng)  # revisit of KF 2
            else:
                d = rand_desc(n, rng)
            descs.append(d)
            f = Frame(frame_id=i, timestamp=0.0,
                      xy=np.zeros((n, 2), np.float32),
                      xy_raw=np.zeros((n, 2), np.float32),
                      response=np.zeros(n, np.float32),
                      angle=np.zeros(n, np.float32),
                      octave=np.zeros(n, np.int32),
                      desc=d, valid=np.ones(n, bool),
                      Tcw=np.eye(4, dtype=np.float32),
                      mp_ids=np.full(n, -1, np.int32),
                      mp_outlier=np.zeros(n, bool))
            kid = store.add_keyframe(f)
            db.add(kid, voc.bow_vector(d, np.ones(n, bool)))
        # covisibility: consecutive keyframes are connected
        for i in range(10):
            for j in (i - 1, i + 1):
                if 0 <= j < 10:
                    store.covis[i][j] = 30
        cands = db.detect_loop_candidates(store, 9, min_score=0.01)
        assert 2 in cands, cands
        assert 8 not in cands and 9 not in cands  # covisibles excluded

    def test_erase(self, voc):
        from orb_slam2_tpu.models.mapstore import MapStore
        rng = np.random.default_rng(7)
        db = KeyFrameDatabase(voc)
        store = MapStore()
        d = rand_desc(100, rng)
        vec = voc.bow_vector(d, np.ones(100, bool))
        db.add(0, vec)
        db.erase(0)
        # the erased keyframe must no longer surface in any query
        kids, _, _ = db._db.query(vec)
        assert 0 not in kids.tolist()
        assert 0 not in db.bow
