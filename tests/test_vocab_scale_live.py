"""Production-scale place recognition IN-SYSTEM (VERDICT r2 task 3):
run the drifted-circuit loop proof with a 1,111,111-node (k=10, L=6,
1M-word) ORBvoc.bin as the LIVE vocabulary — the same startup path as
the reference (src/System.cc:64-72 loads ORBvoc at boot; every KF's
BoW is computed against it, src/Frame.cc:483-500).

The vocabulary is synthetic-hierarchical (io/orbvoc.synthetic_orbvoc —
zero-egress environment, the trained ORBvoc.bin cannot be downloaded)
but has the REAL node count, binary format, and descent depth, so it
exercises the production configuration of the parser, the device
descent (35 MB of centers as traced args), the inverted file at 1M
words, and the FeatureVector node blocking.
"""
import time

import numpy as np
import pytest

from orb_slam2_tpu.io.orbvoc import (load_orbvoc_binary, save_orbvoc_binary,
                                     synthetic_orbvoc)
from orb_slam2_tpu.pipeline import TrackState
from orb_slam2_tpu.utils import synth

import test_loop_proof as lp

cv2 = pytest.importorskip("cv2")


@pytest.mark.slow
def test_loop_closes_under_million_word_vocab(tmp_path):
    # generate + round-trip through the DBoW2 binary format, like the
    # reference's boot sequence
    voc = synthetic_orbvoc(k=10, L=6, seed=7)
    p = tmp_path / "ORBvoc.bin"
    save_orbvoc_binary(voc, str(p))
    t0 = time.perf_counter()
    voc = load_orbvoc_binary(str(p))
    t_load = time.perf_counter() - t0
    assert voc.n_words == 10 ** 6
    assert t_load < 120, f"startup parse {t_load:.1f}s"

    world = synth.make_world(seed=3)
    true, fed = lp._drifted_poses()
    sys_ = lp._run(world, true, fed, enable_loop=True, vocab=voc)

    ok = sum(1 for (_, _, _, s) in sys_.trajectory if s == TrackState.OK)
    assert ok > 0.7 * len(true), f"tracked {ok}/{len(true)}"
    # the proof: the full loop chain fired with the 1M-word vocabulary
    # doing candidate retrieval
    assert sys_.loop_closer.n_loops_closed >= 1, \
        "loop closure never fired under the 1M-word vocabulary"
    assert np.isfinite(sys_.map_points()).all()

    # per-KF BoW stays cheap at 1M words (device descent; the r2 host
    # path measured 111 ms/KF at 10k words and scales with tree size)
    f = sys_.store.kfs[-1].frame
    voc.transform(f.dev("desc"))  # warm the jit
    t0 = time.perf_counter()
    w, n = voc.transform(f.dev("desc"))
    np.asarray(w)
    dt = time.perf_counter() - t0
    assert dt < 2.0, f"1M-word BoW transform took {dt:.2f}s"
