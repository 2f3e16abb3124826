"""IO layer tests: launch/settings config, pose files, trajectory
formats, ORBvoc.bin parsing."""
import struct

import numpy as np
import pytest

from orb_slam2_tpu import io as io_mod
from orb_slam2_tpu.io import poses as poses_mod
from orb_slam2_tpu.io.orbvoc import load_orbvoc_binary


def test_launch_toml(tmp_path):
    p = tmp_path / "launch.toml"
    p.write_text(
        'FBoWVocabularyPath = "voc.bin"\n'
        'ImagesCollectionPath = "imgs.txt"\n'
        'CameraPoseCollectionPath = "cams.txt"\n'
        'ORBSLAMConfigPath = "settings.yaml"\n')
    cfg = io_mod.load_launch_toml(str(p))
    assert cfg.vocabulary_path == "voc.bin"
    assert cfg.orbslam_config_path == "settings.yaml"


def test_settings_yaml(tmp_path):
    p = tmp_path / "settings.yaml"
    p.write_text("""%YAML:1.0
# shenzhen_simple.yaml schema
Camera.fx: 960.0
Camera.fy: 960.0
Camera.cx: 960.0
Camera.cy: 720.0
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.fps: 10.0
Camera.RGB: 1
ORBextractor.nFeatures: 4000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
""")
    cfg = io_mod.load_settings_yaml(str(p))
    assert cfg.cam.fx == 960.0
    assert cfg.cam.width == 1920 and cfg.cam.height == 1440
    assert cfg.orb.n_features == 4000
    assert cfg.orb.n_levels == 8
    assert cfg.fps == 10.0


def test_ue4_pose_loading(tmp_path):
    p = tmp_path / "cams.txt"
    # header + two poses: identity quaternion at two positions
    p.write_text("# x y z qx qy qz qw\n"
                 "10 0 -5 0 0 0 1\n"
                 "11 0 -5 0 0 0 1\n")
    Tcw_list, revert = poses_mod.load_ue4_camera_poses(str(p))
    assert len(Tcw_list) == 2
    # first camera is rebased to the origin
    np.testing.assert_allclose(Tcw_list[0], np.eye(4), atol=1e-6)
    # second camera moved +1 along UE4 x = camera forward (z in cam frame)
    c2 = -Tcw_list[1][:3, :3].T @ Tcw_list[1][:3, 3]
    np.testing.assert_allclose(c2, [0, 0, 1], atol=1e-5)
    # revert transform maps SLAM origin back to the first UE4-RH position
    np.testing.assert_allclose(revert[:3, 3], [10, 0, 5], atol=1e-5)


def test_tum_trajectory_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    Tcw_list = []
    for _ in range(5):
        w = rng.normal(0, 0.3, 3)
        th = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        R = np.eye(3) + np.sin(th) / th * K + (1 - np.cos(th)) / th**2 * K @ K
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = rng.normal(0, 2, 3)
        Tcw_list.append(T.astype(np.float32))
    ts = np.arange(5) * 0.1
    p = tmp_path / "traj.txt"
    poses_mod.save_tum_trajectory(str(p), ts, Tcw_list)
    ts2, Twc_list = poses_mod.load_tum_trajectory(str(p))
    np.testing.assert_allclose(ts, ts2, atol=1e-6)
    for Tcw, Twc in zip(Tcw_list, Twc_list):
        np.testing.assert_allclose(np.linalg.inv(Tcw), Twc, atol=1e-4)


def test_kitti_trajectory(tmp_path):
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1, 2, 3]
    p = tmp_path / "kitti.txt"
    poses_mod.save_kitti_trajectory(str(p), [T])
    vals = np.loadtxt(str(p)).reshape(3, 4)
    np.testing.assert_allclose(vals, np.linalg.inv(T)[:3], atol=1e-6)


# ----------------------------------------------------------------------
# ORBvoc.bin
# ----------------------------------------------------------------------
def _write_orbvoc(path, k, L, nodes):
    """nodes: list of (parent, desc32 bytes, weight, is_leaf) in node-id
    order starting from node 1 (the DBoW2 binary layout)."""
    size_node = 4 + 32 + 4 + 1
    with open(path, "wb") as f:
        f.write(struct.pack("<IIiiii", len(nodes) + 1, size_node, k, L, 0, 0))
        for parent, desc, weight, leaf in nodes:
            f.write(struct.pack("<i", parent))
            f.write(desc)
            f.write(struct.pack("<f", weight))
            f.write(struct.pack("<B", 1 if leaf else 0))


def _clustered_descs():
    """Descriptors with real cluster structure so Hamming tree descent
    is well-defined: internal prototypes all-0 / all-1, leaves a few
    bit flips away from their parent."""
    z = np.zeros(32, np.uint8)
    o = np.full(32, 255, np.uint8)

    def flip(base, *byte_idx):
        b = base.copy()
        for i in byte_idx:
            b[i] ^= 0x0F
        return bytes(b)

    return [bytes(z), bytes(o),
            flip(z, 0), flip(z, 5), flip(o, 2), flip(o, 9)]


def test_orbvoc_complete_tree(tmp_path):
    """k=2, L=2 complete tree: 2 internal + 4 leaf words."""
    descs = _clustered_descs()
    nodes = [
        (0, descs[0], 0.0, False),   # nid 1, depth 1
        (0, descs[1], 0.0, False),   # nid 2, depth 1
        (1, descs[2], 0.5, True),    # nid 3 -> word 0
        (1, descs[3], 0.6, True),    # nid 4 -> word 1
        (2, descs[4], 0.7, True),    # nid 5 -> word 2
        (2, descs[5], 0.8, True),    # nid 6 -> word 3
    ]
    p = tmp_path / "voc.bin"
    _write_orbvoc(str(p), 2, 2, nodes)
    voc = load_orbvoc_binary(str(p))
    assert voc.k == 2 and voc.levels == 2
    assert voc.n_words == 4
    # transform each leaf descriptor: must land on its own word slot
    leaf_desc = np.stack([
        np.frombuffer(d, np.uint8).view("<u4") for d in descs[2:]])
    words = voc.transform_np(leaf_desc.astype(np.uint32))
    # slots: leaf j of internal i -> slot i*2+j; idf = stored weights
    assert list(words) == [0, 1, 2, 3]
    np.testing.assert_allclose(voc.idf[words], [0.5, 0.6, 0.7, 0.8])
    assert list(voc.word_of_slot[words]) == [0, 1, 2, 3]


def test_orbvoc_ragged_tree(tmp_path):
    """An early leaf at depth 1 must still resolve to one word."""
    cl = _clustered_descs()
    d = [cl[0], cl[1], cl[2], cl[3]]  # early leaf keeps the all-1 proto
    nodes = [
        (0, d[0], 0.0, False),   # nid 1, internal
        (0, d[1], 0.9, True),    # nid 2, EARLY leaf (depth 1) -> word 0
        (1, d[2], 0.4, True),    # nid 3 -> word 1
        (1, d[3], 0.3, True),    # nid 4 -> word 2
    ]
    p = tmp_path / "voc.bin"
    _write_orbvoc(str(p), 2, 2, nodes)
    voc = load_orbvoc_binary(str(p))
    early = np.frombuffer(d[1], np.uint8).view("<u4")[None].astype(np.uint32)
    w = voc.transform_np(early)[0]
    assert voc.word_of_slot[w] == 0
    assert voc.idf[w] == np.float32(0.9)
    # the two real depth-2 leaves still resolve correctly
    l1 = np.frombuffer(d[2], np.uint8).view("<u4")[None].astype(np.uint32)
    l2 = np.frombuffer(d[3], np.uint8).view("<u4")[None].astype(np.uint32)
    assert voc.word_of_slot[voc.transform_np(l1)[0]] == 1
    assert voc.word_of_slot[voc.transform_np(l2)[0]] == 2


def test_orbvoc_binary_roundtrip_with_trained_vocab(tmp_path):
    """Train our own vocabulary, save it in the DBoW2 binary format,
    parse it back: word assignments and weights must survive."""
    from orb_slam2_tpu.models.vocabulary import Vocabulary
    from orb_slam2_tpu.io.orbvoc import save_orbvoc_binary

    rng = np.random.default_rng(5)
    desc = rng.integers(0, 2 ** 32, (3000, 8),
                        dtype=np.uint64).astype(np.uint32)
    voc = Vocabulary.train(desc, k=4, levels=3, kmeans_iters=3, seed=0)
    p = tmp_path / "voc.bin"
    save_orbvoc_binary(voc, str(p))
    voc2 = load_orbvoc_binary(str(p))
    assert voc2.k == 4 and voc2.levels == 3
    q = desc[:200]
    w1 = voc.transform_np(q)
    w2 = voc2.transform_np(q)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_allclose(voc2.idf[w2], voc.idf[w1], rtol=1e-6)


def test_orbvoc_text_format(tmp_path):
    """DBoW2 text format (upstream ORBvoc.txt layout)."""
    descs = _clustered_descs()
    lines = ["2 2 0 0"]
    nodes = [
        (0, descs[0], 0.0, 0), (0, descs[1], 0.0, 0),
        (1, descs[2], 0.5, 1), (1, descs[3], 0.6, 1),
        (2, descs[4], 0.7, 1), (2, descs[5], 0.8, 1),
    ]
    for parent, d, w, leaf in nodes:
        b = np.frombuffer(d, np.uint8)
        lines.append(f"{parent} {leaf} " + " ".join(map(str, b)) + f" {w}")
    p = tmp_path / "voc.txt"
    p.write_text("\n".join(lines) + "\n")
    from orb_slam2_tpu.io.orbvoc import load_orbvoc_text
    voc = load_orbvoc_text(str(p))
    assert voc.k == 2 and voc.levels == 2
    leaf_desc = np.stack([
        np.frombuffer(d, np.uint8).view("<u4") for d in descs[2:]])
    words = voc.transform_np(leaf_desc.astype(np.uint32))
    assert list(words) == [0, 1, 2, 3]
    np.testing.assert_allclose(voc.idf[words], [0.5, 0.6, 0.7, 0.8])
