"""MapStore graph semantics: covisibility updates, spanning-tree
reparenting on keyframe erasure, point merge/replace chains."""
import numpy as np
import pytest

from orb_slam2_tpu.models.frame import Frame
from orb_slam2_tpu.models.mapstore import MapStore


def _frame(fid, n=40):
    rng = np.random.default_rng(fid)
    return Frame(
        frame_id=fid, timestamp=float(fid),
        xy=rng.uniform(0, 640, (n, 2)).astype(np.float32),
        xy_raw=rng.uniform(0, 640, (n, 2)).astype(np.float32),
        response=np.ones(n, np.float32),
        angle=np.zeros(n, np.float32),
        octave=np.zeros(n, np.int32),
        desc=rng.integers(0, 2 ** 32, (n, 8),
                          dtype=np.uint64).astype(np.uint32),
        valid=np.ones(n, bool),
        Tcw=np.eye(4, dtype=np.float32),
        mp_ids=np.full(n, -1, np.int32),
        mp_outlier=np.zeros(n, bool),
    )


def _build_chain(n_kf=4, pts_per_pair=16):
    """KFs in a chain; consecutive KFs share >= 15 points (the
    covisibility edge threshold, src/KeyFrame.cc:396-520) at disjoint
    feature slots: pair (i, i+1) binds features [20+j] of KF i and
    [j] of KF i+1."""
    store = MapStore()
    store.set_scale_info(1.2, 4)
    for i in range(n_kf):
        store.add_keyframe(_frame(i))
    for i in range(n_kf - 1):
        for j in range(pts_per_pair):
            pid = store.add_point(
                pos=np.array([i, j, 5.0], np.float32),
                desc=store.kfs[i].frame.desc[j],
                normal=np.array([0, 0, 1.0], np.float32),
                min_dist=0.1, max_dist=100.0, first_kf=i, first_frame=i)
            store.add_observation(pid, i, 20 + j)
            store.add_observation(pid, i + 1, j)
    for i in range(n_kf):
        store.update_connections(i)
    return store


def test_update_connections_builds_tree():
    store = _build_chain()
    # each middle KF is connected to both neighbors
    assert 0 in store.covis[1] and 2 in store.covis[1]
    # spanning tree: parent chain from first insertion order
    assert store.kfs[1].parent == 0
    assert 1 in store.kfs[0].children


def test_erase_keyframe_reparents_children():
    store = _build_chain()
    # tree: 0 <- 1 <- 2 <- 3 (each child of the previous via best covis)
    parent_of_2 = store.kfs[2].parent
    assert parent_of_2 in (0, 1)
    store.erase_keyframe(1)
    assert not store.kfs[1].valid
    # children of 1 must have a new valid parent, never 1
    for kf in store.kfs:
        if kf.valid and kf.parent >= 0:
            assert kf.parent != 1
            assert store.kfs[kf.parent].valid or kf.parent == 0
    # covisibility no longer references 1
    for kid, edges in enumerate(store.covis):
        assert 1 not in edges
    # Tcp recorded for trajectory recovery
    assert store.kfs[1].Tcp is not None


def test_erase_kf0_is_refused():
    store = _build_chain()
    store.erase_keyframe(0)
    assert store.kfs[0].valid


def test_not_erase_defers():
    store = _build_chain()
    store.kfs[2].not_erase = True
    store.erase_keyframe(2)
    assert store.kfs[2].valid and store.kfs[2].to_be_erased


def test_replace_point_transfers_observations():
    store = _build_chain()
    # two points seen by disjoint KFs
    a = store.add_point(np.zeros(3, np.float32), store.kfs[0].frame.desc[0],
                        np.array([0, 0, 1.0], np.float32), 0.1, 10.0, 0, 0)
    b = store.add_point(np.ones(3, np.float32), store.kfs[2].frame.desc[0],
                        np.array([0, 0, 1.0], np.float32), 0.1, 10.0, 2, 2)
    store.add_observation(a, 0, 11)
    store.add_observation(a, 1, 11)
    store.add_observation(a, 2, 10)
    store.add_observation(b, 2, 11)
    store.add_observation(b, 3, 11)
    store.add_observation(b, 3, 11)
    store.replace_point(a, b)
    assert not store.mp_valid[a]
    assert store.resolve_replaced(a) == b
    # a's observers now bind b (where b had no prior binding)
    assert store.kfs[0].frame.mp_ids[11] == b
    assert 0 in store.mp_obs[b] and 3 in store.mp_obs[b]


def test_erase_observation_kills_weak_points():
    store = MapStore()
    store.set_scale_info(1.2, 4)
    for i in range(3):
        store.add_keyframe(_frame(i))
    pid = store.add_point(np.zeros(3, np.float32),
                          store.kfs[0].frame.desc[0],
                          np.array([0, 0, 1.0], np.float32), 0.1, 10.0, 0, 0)
    for k in range(3):
        store.add_observation(pid, k, 0)
    store.erase_observation(pid, 0)  # falls to 2 obs -> dies
    assert not store.mp_valid[pid]
    # bindings cleaned up
    for k in range(3):
        assert store.kfs[k].frame.mp_ids[0] == -1
