"""Descriptor fidelity study: seeded-random BRIEF pattern vs OpenCV's
learned bit_pattern_31_ (VERDICT r1 task 7).

Measures, on the synthetic world at test scale:
  - two-view initialization match count + inlier ratio,
  - tracked-OK frames / total over a 30-frame pose-prior run,
  - final map size and planarity (median |z|).

Run on CPU:  python tools/pattern_study.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from orb_slam2_tpu.geom.camera import Intrinsics
from orb_slam2_tpu.ops.extractor import OrbParams
from orb_slam2_tpu.pipeline import SlamConfig, System, TrackState
from orb_slam2_tpu.utils import synth

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                 width=640, height=480)


def run(pattern: str):
    cfg = SlamConfig(
        cam=CAM, orb=OrbParams(n_features=800, n_levels=4,
                               pattern=pattern),
        fps=10.0, pose_prior=True, init_min_matches=60,
        init_min_triangulated=40, init_min_tracked_after_ba=60)
    world = synth.make_world(seed=3)
    poses = synth.aerial_trajectory(30, speed=0.3)
    sys_ = System(cfg, enable_loop_closing=False)
    states, inliers = [], []
    for i, T in enumerate(poses):
        sys_.track_monocular_with_pose(synth.render(world, CAM, T),
                                       i * 0.1, T)
        states.append(sys_.state)
        inliers.append(sys_.tracker.matches_inliers)
    pts = sys_.map_points()
    return dict(
        pattern=pattern,
        ok=sum(s == TrackState.OK for s in states),
        total=len(states),
        mean_inliers=float(np.mean([x for x, s in zip(inliers, states)
                                    if s == TrackState.OK] or [0])),
        n_points=len(pts),
        med_abs_z=float(np.median(np.abs(pts[:, 2]))) if len(pts) else -1,
    )


if __name__ == "__main__":
    for pat in ("random", "orb_learned"):
        r = run(pat)
        print(f"{r['pattern']:12s} ok={r['ok']}/{r['total']} "
              f"mean_inliers={r['mean_inliers']:.0f} "
              f"points={r['n_points']} med|z|={r['med_abs_z']:.4f}",
              flush=True)
