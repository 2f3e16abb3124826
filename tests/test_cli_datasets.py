"""Dataset-runner CLIs end-to-end on synthetic sequences written to
disk in each dataset's native layout (no dataset egress in this
environment, so the runners are proven against format-faithful
synthetic sequences).

- ``tum``:   rgb.txt ("t rel_path") + PNG frames  (upstream mono_tum)
- ``kitti``: image_0/%06d.png at fixed fps        (upstream mono_kitti)
- ``euroc``: mav0/cam0/data.csv + data/<ns>.png   (upstream mono_euroc)

Each runs the ESTIMATED-pose pipeline (H/F two-view init, motion-model
tracking) and writes a trajectory file; asserted: enough frames track
OK and the sim3-aligned ATE against ground truth is small.
"""
import numpy as np
import pytest

from orb_slam2_tpu import cli
from orb_slam2_tpu.geom.camera import Intrinsics
from orb_slam2_tpu.utils import synth

cv2 = pytest.importorskip("cv2")

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0, width=640, height=480)

SETTINGS = """%YAML:1.0
Camera.fx: 450.0
Camera.fy: 450.0
Camera.cx: 320.0
Camera.cy: 240.0
Camera.width: 640
Camera.height: 480
Camera.fps: 10.0
ORBextractor.nFeatures: 800
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 4
"""

N_FRAMES = 16


def _render_frames(tmp_path):
    world = synth.make_world(seed=3)
    # curved sweep (yaw) so the sim3-aligned ATE check is not
    # degenerate on a straight-line trajectory
    poses = synth.aerial_trajectory(N_FRAMES, speed=0.35, yaw_rate=0.08)
    frames = [np.clip(synth.render(world, CAM, T), 0, 255).astype(np.uint8)
              for T in poses]
    (tmp_path / "settings.yaml").write_text(SETTINGS)
    return poses, frames


def _check_trajectory(path, poses, n_expected, fmt):
    """Parse camera centers from the trajectory file and compare to
    ground truth under a sim3 alignment (estimated-pose monocular has a
    free global scale/pose gauge)."""
    lines = [ln for ln in open(path).read().splitlines() if ln.strip()]
    assert len(lines) == n_expected
    centers = []
    for ln in lines:
        v = np.array(ln.split(), np.float64)
        if fmt == "tum":     # t x y z qx qy qz qw (camera center twc)
            centers.append(v[1:4])
        else:                # kitti: 3x4 row-major Twc
            T = v.reshape(3, 4)
            centers.append(T[:, 3])
    est = np.asarray(centers)
    gt = np.stack([np.linalg.inv(T)[:3, 3] for T in poses[-n_expected:]])
    err = synth.ate_rmse(est, gt, align="sim3")
    # trajectory span is ~5 units; a tracked run aligns well under 5%
    assert err < 0.25, f"ATE {err}"


def test_cli_tum_runner(tmp_path):
    poses, frames = _render_frames(tmp_path)
    (tmp_path / "rgb").mkdir()
    lines = ["# timestamp filename"]
    for i, img in enumerate(frames):
        rel = f"rgb/{i:04d}.png"
        cv2.imwrite(str(tmp_path / rel), img)
        lines.append(f"{i / 10.0:.6f} {rel}")
    (tmp_path / "rgb.txt").write_text("\n".join(lines) + "\n")

    traj = tmp_path / "traj.txt"
    rc = cli.main(["tum", str(tmp_path), "--settings",
                   str(tmp_path / "settings.yaml"),
                   "--traj-out", str(traj), "--no-loop"])
    assert rc == 0
    lines = [ln for ln in open(traj).read().splitlines() if ln.strip()]
    assert len(lines) >= N_FRAMES - 4, f"only {len(lines)} tracked"
    _check_trajectory(traj, poses, len(lines), "tum")


def test_cli_kitti_runner(tmp_path):
    poses, frames = _render_frames(tmp_path)
    (tmp_path / "image_0").mkdir()
    for i, img in enumerate(frames):
        cv2.imwrite(str(tmp_path / "image_0" / f"{i:06d}.png"), img)

    traj = tmp_path / "traj.txt"
    rc = cli.main(["kitti", str(tmp_path), "--settings",
                   str(tmp_path / "settings.yaml"),
                   "--traj-out", str(traj), "--no-loop"])
    assert rc == 0
    lines = [ln for ln in open(traj).read().splitlines() if ln.strip()]
    assert len(lines) >= N_FRAMES - 4, f"only {len(lines)} tracked"
    _check_trajectory(traj, poses, len(lines), "kitti")


def test_cli_euroc_runner(tmp_path):
    poses, frames = _render_frames(tmp_path)
    data_dir = tmp_path / "mav0" / "cam0" / "data"
    data_dir.mkdir(parents=True)
    lines = ["#timestamp [ns],filename"]
    for i, img in enumerate(frames):
        ns = int(i / 10.0 * 1e9)
        name = f"{ns}.png"
        cv2.imwrite(str(data_dir / name), img)
        lines.append(f"{ns},{name}")
    (tmp_path / "mav0" / "cam0" / "data.csv").write_text(
        "\n".join(lines) + "\n")

    traj = tmp_path / "traj.txt"
    rc = cli.main(["euroc", str(tmp_path), "--settings",
                   str(tmp_path / "settings.yaml"),
                   "--traj-out", str(traj), "--no-loop"])
    assert rc == 0
    lines = [ln for ln in open(traj).read().splitlines() if ln.strip()]
    assert len(lines) >= N_FRAMES - 4, f"only {len(lines)} tracked"
    _check_trajectory(traj, poses, len(lines), "tum")
