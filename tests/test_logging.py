"""Structured logging + stage timers."""
import logging

import numpy as np
import pytest

from orb_slam2_tpu.utils.logging import StageTimer, enable, get_logger


def test_stage_timer():
    t = StageTimer()
    with t.time("a"):
        pass
    with t.time("a"):
        pass
    with t.time("b"):
        pass
    rep = t.report()
    assert rep["a"][0] == 2 and rep["b"][0] == 1
    assert "a" in t.summary() and "ms/call" in t.summary()
    t.reset()
    assert t.report() == {}


def test_logger_emits_when_enabled(caplog):
    enable("INFO")
    log = get_logger("testmod")
    with caplog.at_level(logging.INFO, logger="orb_slam2_tpu.testmod"):
        log.info("frame %d: state=%s", 3, "OK")
    assert any("state=OK" in r.message for r in caplog.records)


def test_pipeline_emits_events(caplog):
    cv2 = pytest.importorskip("cv2")
    from orb_slam2_tpu.geom.camera import Intrinsics
    from orb_slam2_tpu.ops.extractor import OrbParams
    from orb_slam2_tpu.pipeline import SlamConfig, System
    from orb_slam2_tpu.utils import synth

    enable("INFO")
    cam = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                     width=640, height=480)
    cfg = SlamConfig(cam=cam, orb=OrbParams(n_features=600, n_levels=4),
                     pose_prior=True, init_min_matches=60,
                     init_min_triangulated=40, init_min_tracked_after_ba=60)
    world = synth.make_world(seed=3)
    poses = synth.aerial_trajectory(6, speed=0.4)
    sys_ = System(cfg, enable_loop_closing=False)
    with caplog.at_level(logging.INFO, logger="orb_slam2_tpu"):
        for i, T in enumerate(poses):
            sys_.track_monocular_with_pose(synth.render(world, cam, T),
                                           i * 0.1, T)
    msgs = [r.message for r in caplog.records]
    assert any("state=OK" in m for m in msgs)
    assert any("map points" in m for m in msgs)
    rep = sys_.timing_report()
    assert "track/extract" in rep and "mapping/triangulate" in rep
