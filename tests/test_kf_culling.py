"""KeyFrameCulling (src/LocalMapping.cc:688-772): the point-major
screen + sequential re-verify must erase a redundant keyframe, keep
non-redundant ones, and preserve the reference's IN-ORDER semantics —
erasing one candidate removes its observations, which can rescue the
next candidate from culling."""
import numpy as np

from orb_slam2_tpu.geom.camera import Intrinsics
from orb_slam2_tpu.models.mapstore import MapStore
from orb_slam2_tpu.pipeline.config import SlamConfig
from orb_slam2_tpu.pipeline.local_mapping import LocalMapper

from test_mapstore import _frame


def _cfg():
    return SlamConfig(cam=Intrinsics(fx=500.0, fy=500.0, cx=320.0,
                                     cy=240.0, width=640, height=480))


def _build(n_observers=4, n_pts=20):
    """KFs 1..n_observers all observe the same ``n_pts`` points at
    octave 0 (slot j); KF 0 exists but observes nothing (kid 0 is
    never culled).  Every observer is covisible with every other."""
    store = MapStore()
    store.set_scale_info(1.2, 8)
    for i in range(n_observers + 1):
        store.add_keyframe(_frame(i))
    for j in range(n_pts):
        pid = store.add_point(
            pos=np.array([j, 0, 5.0], np.float32),
            desc=store.kfs[1].frame.desc[j],
            normal=np.array([0, 0, 1.0], np.float32),
            min_dist=0.1, max_dist=100.0, first_kf=1, first_frame=1)
        for k in range(1, n_observers + 1):
            store.add_observation(pid, k, j)
    for i in range(n_observers + 1):
        store.update_connections(i)
    return store


def test_redundant_keyframe_is_culled_sequentially():
    # 4 observers: each point is seen 3 times elsewhere -> every
    # candidate passes the pre-state screen.  The reference's in-order
    # loop erases the FIRST candidate; that drops the others to 2
    # other-observers (< 3) so they must survive the re-verify.
    store = _build(n_observers=4)
    mapper = LocalMapper(_cfg(), store)
    mapper._cull_keyframes(1)
    erased = [k for k in (2, 3, 4) if not store.kfs[k].valid]
    assert len(erased) == 1
    assert store.kfs[1].valid


def test_non_redundant_keyframes_survive():
    # 3 observers: each point is seen only 2 times elsewhere (< 3) ->
    # nothing is redundant, nothing is culled.
    store = _build(n_observers=3)
    mapper = LocalMapper(_cfg(), store)
    mapper._cull_keyframes(1)
    assert all(store.kfs[k].valid for k in (1, 2, 3))


def test_coarser_scale_does_not_count():
    # observations at a coarser octave (> level + 1) must not count
    # toward redundancy (the reference's scaleLevel<=scaleLevel+1 gate)
    store = MapStore()
    store.set_scale_info(1.2, 8)
    for i in range(5):
        f = _frame(i)
        if i >= 2:
            f.octave[:] = 4  # other observers see it much coarser
        store.add_keyframe(f)
    for j in range(20):
        pid = store.add_point(
            pos=np.array([j, 0, 5.0], np.float32),
            desc=store.kfs[1].frame.desc[j],
            normal=np.array([0, 0, 1.0], np.float32),
            min_dist=0.1, max_dist=100.0, first_kf=1, first_frame=1)
        for k in range(1, 5):
            store.add_observation(pid, k, j)
    for i in range(5):
        store.update_connections(i)
    mapper = LocalMapper(_cfg(), store)
    # candidate 1 sees everything at octave 0; the 3 other observers
    # are at octave 4 > 0 + 1 -> zero redundant points -> kept
    mapper._cull_keyframes(2)
    assert store.kfs[1].valid
