"""Batched Sim3 RANSAC — the TPU-native Sim3Solver.

Replaces src/Sim3Solver.cc:200-294 (sequential adaptive RANSAC) with a
fixed-batch hypothesis sweep: H minimal 3-point samples are solved in
ONE batched Horn closed form (geom.horn), all H x N bidirectional
reprojection checks run as one dense masked kernel, and the best
hypothesis is an argmax.  Semantics preserved:

- minimal sample size 3 (src/Sim3Solver.cc:200-294),
- per-point chi2 thresholds 9.210 * sigma2 of the keypoint octave
  (src/Sim3Solver.cc:43-150, mvnMaxError1/2),
- bidirectional inlier test: p2 projected into image 1 through S12 AND
  p1 projected into image 2 through S21 (CheckInliers,
  src/Sim3Solver.cc:458-489),
- acceptance iff best inlier count >= min_inliers.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import horn, sim3

CHI2_SIM3 = 9.210  # 2-DoF chi2 at 0.01 (src/Sim3Solver.cc:139-143)


class Sim3RansacResult(NamedTuple):
    S12: jnp.ndarray        # (8,) best similarity mapping frame2 -> frame1
    inliers: jnp.ndarray    # (N,) bool for the best hypothesis
    n_inliers: jnp.ndarray  # ()
    ok: jnp.ndarray         # () bool — n_inliers >= min_inliers


def _project(pc, fx, fy, cx, cy):
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
    return jnp.stack([fx * pc[..., 0] / z + cx,
                      fy * pc[..., 1] / z + cy], -1)


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy",
                                             "min_inliers", "fix_scale"))
def sim3_ransac(
    pts1_cam: jnp.ndarray,   # (N, 3) matched MPs in KF1 camera frame
    pts2_cam: jnp.ndarray,   # (N, 3) matched MPs in KF2 camera frame
    uv1: jnp.ndarray,        # (N, 2) observed keypoints in image 1
    uv2: jnp.ndarray,        # (N, 2)
    max_err1: jnp.ndarray,   # (N,) 9.210*sigma2(octave1) px^2 thresholds
    max_err2: jnp.ndarray,   # (N,)
    valid: jnp.ndarray,      # (N,) bool
    samples: jnp.ndarray,    # (H, 3) int32 indices into the N axis
    fx: float, fy: float, cx: float, cy: float,
    min_inliers: int = 20,
    fix_scale: bool = False,
) -> Sim3RansacResult:
    # --- solve all H minimal problems in one batched Horn call ---
    p1s = pts1_cam[samples]                     # (H, 3, 3)
    p2s = pts2_cam[samples]
    sims = horn.horn_sim3(p1s, p2s, fix_scale=fix_scale)  # (H, 8)

    # a hypothesis whose sample hit an invalid (padded) point is dead
    hyp_ok = jnp.all(valid[samples], axis=-1)   # (H,)
    # reject negative/degenerate scales (Horn can return s<=0 on
    # degenerate samples; the reference never encounters this because it
    # samples real points, we mask instead)
    hyp_ok &= sim3.scale(sims) > 1e-6

    # --- score: bidirectional reprojection over all N points ---
    sims_inv = jax.vmap(sim3.inv)(sims)                      # (H, 8)
    p2_in_1 = jax.vmap(sim3.apply, in_axes=(0, None))(sims, pts2_cam)
    p1_in_2 = jax.vmap(sim3.apply, in_axes=(0, None))(sims_inv, pts1_cam)
    e1 = _project(p2_in_1, fx, fy, cx, cy) - uv1[None]       # (H, N, 2)
    e2 = _project(p1_in_2, fx, fy, cx, cy) - uv2[None]
    inl = (valid[None]
           & (jnp.sum(e1 * e1, -1) < max_err1[None])
           & (jnp.sum(e2 * e2, -1) < max_err2[None]))        # (H, N)
    counts = jnp.where(hyp_ok, jnp.sum(inl, axis=-1), -1)

    best = jnp.argmax(counts)
    n_best = counts[best]
    return Sim3RansacResult(
        S12=sims[best],
        inliers=inl[best],
        n_inliers=jnp.maximum(n_best, 0),
        ok=n_best >= min_inliers,
    )
