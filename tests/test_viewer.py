"""Live viewer (utils/viewer.LiveViewer): the reference's Viewer thread
role (src/Viewer.cc:84) — frame overlay + map render watchable DURING a
run, served over HTTP and refreshed on disk, with O(1) per-frame cost
on the tracking thread.
"""
import json
import os
import time
import urllib.request

import numpy as np
import pytest

from orb_slam2_tpu.geom.camera import Intrinsics
from orb_slam2_tpu.ops.extractor import OrbParams
from orb_slam2_tpu.pipeline import SlamConfig, System
from orb_slam2_tpu.utils import synth
from orb_slam2_tpu.utils.viewer import LiveViewer

cv2 = pytest.importorskip("cv2")

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                 width=640, height=480)


def test_live_viewer_serves_during_run(tmp_path):
    cfg = SlamConfig(
        cam=CAM, orb=OrbParams(n_features=600, n_levels=4), fps=10.0,
        pose_prior=True, init_min_matches=60, init_min_triangulated=40,
        init_min_tracked_after_ba=60)
    sys_ = System(cfg, enable_loop_closing=False)
    viewer = LiveViewer(sys_.store, port=0, out_dir=str(tmp_path),
                        frame_period_s=0.15, map_period_s=0.5
                        ).attach(sys_)
    assert viewer.port

    world = synth.make_world(seed=3, tex_size=1024)
    poses = synth.aerial_trajectory(6, height=10.0, speed=0.5)
    mid_status = None
    for i, T in enumerate(poses):
        sys_.track_monocular_with_pose(
            synth.render(world, CAM, T), i * 0.1, T)
        if i == 4:  # DURING the run, not after
            time.sleep(0.4)
            base = f"http://127.0.0.1:{viewer.port}"
            mid_status = json.loads(
                urllib.request.urlopen(base + "/status.json",
                                       timeout=10).read())
    assert mid_status is not None and mid_status["frames_seen"] >= 4

    time.sleep(1.2)  # let the render worker publish the last frame+map
    base = f"http://127.0.0.1:{viewer.port}"
    st = json.loads(urllib.request.urlopen(base + "/status.json",
                                           timeout=10).read())
    assert st["frames_seen"] == len(poses)
    assert st["keyframes"] >= 1
    fp = urllib.request.urlopen(base + "/frame.png", timeout=10).read()
    assert fp[:8] == b"\x89PNG\r\n\x1a\n" and len(fp) > 1000
    mp = urllib.request.urlopen(base + "/map.png", timeout=10).read()
    assert mp[:8] == b"\x89PNG\r\n\x1a\n"
    html = urllib.request.urlopen(base + "/", timeout=10).read()
    assert b"live viewer" in html
    # file surface for browserless watching
    assert os.path.exists(tmp_path / "frame.png")
    viewer.close()
