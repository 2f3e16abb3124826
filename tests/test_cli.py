"""CLI end-to-end: the mono_shenzhen-style launch flow on synthetic
data (npy images, UE4-convention pose file, launch.toml, YAML settings)."""
import json
import os

import numpy as np
import pytest

from orb_slam2_tpu import cli
from orb_slam2_tpu.geom.camera import Intrinsics
from orb_slam2_tpu.utils import synth

cv2 = pytest.importorskip("cv2")

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0, width=640, height=480)


def _ue4_pose_line(Toc_inv):
    """Invert the loader's conversion: given a desired Tcw (=Tco), emit
    a UE4 pose line that load_ue4_camera_poses maps back to it (up to
    the first-camera rebase)."""
    # loader: Rwc = quat(R) @ rotCam2UE4, twc = (x, y, -z_ue4)
    Twc = np.linalg.inv(Toc_inv)
    rot_cam2ue4 = np.array([[0., 0., 1.], [1., 0., 0.], [0., 1., 0.]])
    Rq = Twc[:3, :3] @ rot_cam2ue4.T
    # quaternion from Rq
    t = np.trace(Rq)
    qw = np.sqrt(max(t + 1, 1e-12)) / 2
    qx = (Rq[2, 1] - Rq[1, 2]) / (4 * qw)
    qy = (Rq[0, 2] - Rq[2, 0]) / (4 * qw)
    qz = (Rq[1, 0] - Rq[0, 1]) / (4 * qw)
    x, y, z = Twc[:3, 3]
    return f"{x} {y} {-z} {qx} {qy} {qz} {qw}"


def test_cli_run_launch(tmp_path):
    world = synth.make_world(seed=3)
    poses = synth.aerial_trajectory(10, speed=0.4)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    img_paths = []
    for i, T in enumerate(poses):
        img = synth.render(world, CAM, T)
        p = img_dir / f"{i:03d}.npy"
        np.save(p, img)
        img_paths.append(str(p))

    (tmp_path / "imgs.txt").write_text("\n".join(img_paths) + "\n")
    pose_lines = ["# x y z qx qy qz qw"]
    for T in poses:
        pose_lines.append(_ue4_pose_line(T))
    (tmp_path / "cams.txt").write_text("\n".join(pose_lines) + "\n")
    (tmp_path / "settings.yaml").write_text("""%YAML:1.0
Camera.fx: 450.0
Camera.fy: 450.0
Camera.cx: 320.0
Camera.cy: 240.0
Camera.fps: 10.0
ORBextractor.nFeatures: 800
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 4
""")
    (tmp_path / "launch.toml").write_text(
        f'FBoWVocabularyPath = ""\n'
        f'ImagesCollectionPath = "{tmp_path}/imgs.txt"\n'
        f'CameraPoseCollectionPath = "{tmp_path}/cams.txt"\n'
        f'ORBSLAMConfigPath = "{tmp_path}/settings.yaml"\n')

    out_dir = tmp_path / "Out"
    rc = cli.main(["run", str(tmp_path / "launch.toml"),
                   "--out", str(out_dir), "--no-loop"])
    assert rc == 0
    assert (out_dir / "map.ply").exists()
    tracked = sorted(out_dir.glob("tracked_*.ply"))
    assert len(tracked) >= 5
    # tracked PLY carries the frame element with pose + K
    data = tracked[-1].read_bytes()
    head = data.partition(b"end_header")[0].decode()
    assert "element frame 1" in head
    assert "property float tcw15" in head
    assert "property float k8" in head


def test_cli_kitti_and_euroc_runners(tmp_path):
    """The dataset runners drive the estimated-pose pipeline end to end
    on synthetic frames laid out in each dataset's directory schema."""
    world = synth.make_world(seed=3)
    poses = synth.aerial_trajectory(8, speed=0.4)

    # --- KITTI layout: seq/image_0/NNNNNN.npy ---
    kitti = tmp_path / "kitti_seq"
    (kitti / "image_0").mkdir(parents=True)
    for i, T in enumerate(poses):
        np.save(kitti / "image_0" / f"{i:06d}.npy",
                synth.render(world, CAM, T))
    (tmp_path / "settings.yaml").write_text("""%YAML:1.0
Camera.fx: 450.0
Camera.fy: 450.0
Camera.cx: 320.0
Camera.cy: 240.0
Camera.fps: 10.0
ORBextractor.nFeatures: 800
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 4
""")
    rc = cli.main(["kitti", str(kitti), "--no-loop",
                   "--settings", str(tmp_path / "settings.yaml"),
                   "--traj-out", str(tmp_path / "kitti_traj.txt")])
    assert rc == 0
    assert (tmp_path / "kitti_traj.txt").exists()

    # --- EuRoC ASL layout: seq/mav0/cam0/{data.csv,data/*.npy} ---
    euroc = tmp_path / "euroc_seq"
    data = euroc / "mav0" / "cam0" / "data"
    data.mkdir(parents=True)
    lines = ["#timestamp [ns],filename"]
    for i, T in enumerate(poses):
        name = f"{i:019d}.npy"
        np.save(data / name, synth.render(world, CAM, T))
        lines.append(f"{int(i * 5e7)},{name}")
    (euroc / "mav0" / "cam0" / "data.csv").write_text("\n".join(lines))
    rc = cli.main(["euroc", str(euroc), "--no-loop",
                   "--settings", str(tmp_path / "settings.yaml"),
                   "--traj-out", str(tmp_path / "euroc_traj.txt")])
    assert rc == 0
    assert (tmp_path / "euroc_traj.txt").exists()
