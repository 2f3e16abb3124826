"""Format + scale proof for the DBoW2 binary vocabulary interchange:
a generated production-size ORBvoc.bin (k=10, L=6 -> 1,111,111 nodes /
1M words, the layout of TemplatedVocabulary::saveToBinaryFile,
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1444-1546) must parse into
the level-block device layout and transform descriptors consistently.

The reference loads exactly this class of file at startup
(src/System.cc:64-72); this test proves the parser handles the real
node count, not just toy trees.
"""
import struct
import time

import numpy as np
import pytest

from orb_slam2_tpu.io.orbvoc import load_orbvoc_binary
from orb_slam2_tpu.models.vocabulary import Vocabulary

K, L = 10, 6
N_NODES = sum(K ** d for d in range(L + 1))  # 1,111,111


def _write_million_node_voc(path, rng):
    """Write a complete k=10 L=6 tree in the DBoW2 binary layout:
    node records in breadth-first id order, each
    {parent:i32, desc:u8[32], weight:f32, leaf:u8}."""
    size_node = 4 + 32 + 4 + 1
    n_rec = N_NODES - 1
    rec = np.zeros(n_rec, dtype=np.dtype(
        [("parent", "<i4"), ("desc", "u1", (32,)),
         ("weight", "<f4"), ("leaf", "u1")]))
    # ids are assigned level by level: level d spans
    # [sum_{i<d} k^i, sum_{i<=d} k^i)
    starts = np.cumsum([0] + [K ** d for d in range(L + 1)])
    row = 0
    for d in range(1, L + 1):
        n = K ** d
        ids = np.arange(n)
        rec["parent"][row:row + n] = starts[d - 1] + ids // K
        rec["leaf"][row:row + n] = 1 if d == L else 0
        if d == L:
            rec["weight"][row:row + n] = rng.random(n).astype(np.float32)
        row += n
    rec["desc"] = rng.integers(0, 256, (n_rec, 32), dtype=np.uint8)
    with open(path, "wb") as f:
        f.write(struct.pack("<IIiiii", N_NODES, size_node, K, L, 0, 0))
        rec.tofile(f)


@pytest.mark.slow
def test_million_node_orbvoc_parses_and_transforms(tmp_path):
    rng = np.random.default_rng(0)
    p = tmp_path / "ORBvoc.bin"
    t0 = time.perf_counter()
    _write_million_node_voc(str(p), rng)
    voc = load_orbvoc_binary(str(p))
    t_parse = time.perf_counter() - t0

    assert voc.k == K and voc.levels == L
    assert voc.n_words == 10 ** 6
    assert voc.centers[-1].shape == (10 ** 6, 8)
    assert voc.idf.shape == (10 ** 6,)
    # weights survived into idf (leaf weights are nonzero on average)
    assert float(np.mean(voc.idf)) > 0.05

    # transform a batch of descriptors: words must be valid ids and the
    # descent must be consistent (same descriptor -> same word)
    desc = rng.integers(0, 2 ** 32, (512, 8), dtype=np.uint64).astype(np.uint32)
    w1 = voc.transform_np(desc)
    w2 = voc.transform_np(desc)
    assert (w1 == w2).all()
    assert (0 <= w1).all() and (w1 < voc.n_words).all()
    # distinct descriptors spread over many words (no degenerate tree)
    assert len(np.unique(w1)) > 256
    # full 1.1M-node parse must stay practical at startup (reference
    # loads its binary vocab in seconds, src/System.cc:64-72)
    assert t_parse < 120, f"parse took {t_parse:.1f}s"
