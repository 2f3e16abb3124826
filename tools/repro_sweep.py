"""Repro: straight-sweep tracking must pick up freshly triangulated
points (bench r3c decayed 2371 -> 31 inliers over 55 frames).

CPU-scale version of the bench workload: small camera, strip world,
straight aerial sweep into NEW terrain.  Prints per-frame inliers and
how many of the frame's bound points were created recently.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from orb_slam2_tpu.geom.camera import Intrinsics
    from orb_slam2_tpu.ops.extractor import OrbParams
    from orb_slam2_tpu.pipeline import SlamConfig, System, TrackState
    from orb_slam2_tpu.utils import synth

    asyncm = os.environ.get("REPRO_ASYNC", "0") == "1"
    pipelined = os.environ.get("REPRO_PIPE", "0") == "1"
    n_frames = int(os.environ.get("REPRO_FRAMES", "80"))
    n_levels = int(os.environ.get("REPRO_LEVELS", "4"))
    n_feat = int(os.environ.get("REPRO_NFEAT", "1000"))
    floors = os.environ.get("REPRO_FLOORS", "0") == "1"
    loop = os.environ.get("REPRO_LOOP", "0") == "1"
    n_warm = int(os.environ.get("REPRO_WARM", "0"))

    cam = Intrinsics(fx=320.0, fy=320.0, cx=320.0, cy=240.0,
                     width=640, height=480)
    cfg = SlamConfig(
        cam=cam,
        orb=OrbParams(n_features=n_feat, n_levels=n_levels,
                      scale_factor=1.2),
        fps=10.0, pose_prior=True,
        init_min_matches=60, init_min_triangulated=40,
        init_min_tracked_after_ba=60,
        pipelined_tracking=pipelined,
        **(dict(pad_min_bound=1024, pad_min_cand=4096,
                pad_min_obs=16384, pad_min_pts=4096) if floors else {}),
    )
    # same geometry as the bench: height 12, speed 0.5/frame, footprint
    # half-width = 12 * (320/320) = 12 units; strip covers the sweep
    world = synth.make_world(seed=7, tex_size=4096, scale=120.0,
                             tex_shape=(3072, 10240),
                             origin_px=(1560.0, 1536.0))
    poses = synth.aerial_trajectory(n_frames, height=12.0, speed=0.5)
    frames_np = [np.clip(synth.render(world, cam, T), 0, 255)
                 .astype(np.uint8) for T in poses]

    sys_ = System(cfg, enable_loop_closing=loop, async_mapping=asyncm)
    tr = sys_.tracker
    store = tr.store
    created_at = np.full(10 ** 6, -1, np.int64)  # pid -> creation frame

    for i in range(n_frames):
        t0 = time.perf_counter()
        sys_.track_monocular_with_pose(frames_np[i], i * 0.1, poses[i])
        if not asyncm or i < n_warm:
            sys_.flush_mapping()
        f = tr.last_frame
        alloc = len(store.mp_valid)
        created_at[(created_at[:alloc] < 0).nonzero()[0]] = i
        bound = f.mp_ids[(f.mp_ids >= 0)].astype(np.int64)
        fresh = int((created_at[bound] >= i - 10).sum()) if len(bound) else 0
        print(f"frame {i:3d}: {time.perf_counter()-t0:5.2f}s "
              f"state={sys_.state.name:4.4s} inl={tr.matches_inliers:5d} "
              f"bound={len(bound):5d} fresh10={fresh:5d} "
              f"pts={store.n_valid_points():6d} "
              f"kfs={store.n_valid_keyframes():3d}",
              flush=True)
    # post-mortem: late-created points (after frame 30) — were they
    # ever seen by the tracker's frustum pass (n_visible) or matched
    # (n_found)?  Distinguishes "never a candidate" from "candidate but
    # never matched".
    alloc = len(store.mp_valid)
    late = np.where(np.asarray(store.mp_first_frame[:alloc]) >= 30)[0]
    if len(late):
        vis = np.asarray(store.mp_n_visible[late])
        fnd = np.asarray(store.mp_n_found[late])
        alive = np.asarray(store.mp_valid[late], bool)
        print(f"late points (first_frame>=30): n={len(late)} "
              f"alive={int(alive.sum())} "
              f"visible>1: {int((vis > 1).sum())} "
              f"found>1: {int((fnd > 1).sum())} "
              f"max_vis={int(vis.max())} max_fnd={int(fnd.max())}",
              flush=True)
    sys_.shutdown()
    print("done")


if __name__ == "__main__":
    main()
