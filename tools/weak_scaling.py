"""Weak-scaling measurement for the memory-sharded distributed GBA
(parallel/dist_ba.distributed_bundle_adjust_sharded_points): constant
observations PER DEVICE while the mesh grows 1 -> 2 -> 4 -> 8, so
ideal scaling holds obs/s per device flat (BASELINE's "near-linear
weak scaling" goal).

Runs on the virtual CPU mesh (xla_force_host_platform_device_count) —
collective structure and sharding identical to a real TPU pod; absolute
numbers are CPU-bound.  Emits a markdown table for NOTES_r3.
"""
import os
import sys
import time

N_DEV = int(os.environ.get("WEAK_SCALE_MAX_DEV", "8"))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={N_DEV}")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from orb_slam2_tpu.parallel.dist_ba import (  # noqa: E402
    distributed_bundle_adjust_sharded_points, make_mesh)


def make_problem(n_pts, n_cams, obs_per_pt, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-8, 8, n_pts), rng.uniform(-6, 6, n_pts),
                    rng.uniform(8, 16, n_pts)], 1).astype(np.float32)
    cams = []
    for i in range(n_cams):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.3 * i, 0.02 * i, 0.0]
        cams.append(T)
    cams = np.stack(cams)
    obs_pt = np.repeat(np.arange(n_pts, dtype=np.int32), obs_per_pt)
    obs_cam = rng.integers(0, n_cams, len(obs_pt)).astype(np.int32)
    fx = fy = 450.0
    cx, cy = 320.0, 240.0
    pc = np.einsum("oij,oj->oi", cams[obs_cam, :3, :3], pts[obs_pt]) \
        + cams[obs_cam, :3, 3]
    uv = pc[:, :2] / pc[:, 2:3] * [fx, fy] + [cx, cy]
    uv = (uv + rng.normal(0, 0.5, uv.shape)).astype(np.float32)
    pts_noisy = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    return (cams, pts_noisy.astype(np.float32), obs_cam, obs_pt, uv,
            np.ones(len(obs_pt), np.float32), np.ones(len(obs_pt), bool),
            fx, fy, cx, cy)


def run(n_dev, obs_per_dev=40_000, iters=8):
    n_pts = obs_per_dev * n_dev // 4          # 4 obs per point
    n_cams = 8 * n_dev
    (cams, pts, ocam, opt, uv, sig, valid,
     fx, fy, cx, cy) = make_problem(n_pts, n_cams, 4, seed=n_dev)
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True
    mesh = make_mesh(n_dev)
    t_c0 = time.perf_counter()
    res = distributed_bundle_adjust_sharded_points(
        mesh, cams, pts, ocam, opt, uv, sig, valid, fixed,
        fx, fy, cx, cy, iters=iters, cg_iters=15, use_huber=False)
    np.asarray(res.cam_Tcw)
    t_compile = time.perf_counter() - t_c0
    # timed run (cached executable)
    t0 = time.perf_counter()
    res = distributed_bundle_adjust_sharded_points(
        mesh, cams, pts, ocam, opt, uv, sig, valid, fixed,
        fx, fy, cx, cy, iters=iters, cg_iters=15, use_huber=False)
    np.asarray(res.cam_Tcw)
    dt = time.perf_counter() - t0
    n_obs = len(ocam)
    return n_obs, dt, t_compile, float(np.asarray(res.final_cost))


def main():
    devs = [d for d in (1, 2, 4, 8) if d <= N_DEV]
    print(f"devices available: {len(jax.devices())}", flush=True)
    rows = []
    for d in devs:
        n_obs, dt, t_comp, cost = run(d)
        rows.append((d, n_obs, dt, n_obs / dt, n_obs / dt / d, cost))
        print(f"n_dev={d}: obs={n_obs} t={dt:.3f}s "
              f"obs/s={n_obs/dt:,.0f} obs/s/dev={n_obs/dt/d:,.0f} "
              f"(compile {t_comp:.1f}s, final cost {cost:.1f})", flush=True)
    print("\n| devices | observations | solve s | obs/s | obs/s/device |")
    print("|---|---|---|---|---|")
    base = rows[0][4]
    for d, n_obs, dt, rate, per_dev, _ in rows:
        print(f"| {d} | {n_obs:,} | {dt:.3f} | {rate:,.0f} | "
              f"{per_dev:,.0f} ({100*per_dev/base:.0f}%) |")


if __name__ == "__main__":
    main()
