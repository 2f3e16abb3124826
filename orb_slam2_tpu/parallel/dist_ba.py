"""Distributed bundle adjustment over a device mesh.

Shards the observation list across the mesh's 'obs' axis (data-parallel
over reprojection edges — the natural decomposition of BA: cameras and
points are the small replicated state, observations are the big one).
All segment-sum reductions inside optim.ba's assembly and PCG matvecs
are closed with psum over the axis, so the reduced camera system is
solved identically on every device.  On hardware the psums ride ICI;
across hosts jax.distributed extends the same mesh over DCN
(BASELINE.json configs 4-5).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..optim import ba


def make_mesh(n_devices: int | None = None, axis: str = "obs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def pad_obs_to(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def distributed_bundle_adjust(
    mesh: Mesh,
    cam_Tcw: np.ndarray,
    points: np.ndarray,
    obs_cam: np.ndarray,
    obs_pt: np.ndarray,
    obs_uv: np.ndarray,
    obs_isig2: np.ndarray,
    obs_valid: np.ndarray,
    fixed_cam: np.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    iters: int = 10,
    cg_iters: int = 20,
    use_huber: bool = True,
) -> ba.BAResult:
    """Same contract as optim.ba.bundle_adjust, executed sharded.

    The observation arrays are padded to a multiple of the mesh size and
    split along axis 0; camera/point state is replicated.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    O = len(obs_cam)
    Opad = pad_obs_to(max(O, n_dev), n_dev)
    pad = Opad - O

    obs_cam = np.pad(np.asarray(obs_cam, np.int32), (0, pad))
    obs_pt = np.pad(np.asarray(obs_pt, np.int32), (0, pad))
    obs_uv = np.pad(np.asarray(obs_uv, np.float32), ((0, pad), (0, 0)))
    obs_isig2 = np.pad(np.asarray(obs_isig2, np.float32), (0, pad),
                       constant_values=1.0)
    obs_valid = np.pad(np.asarray(obs_valid, bool), (0, pad))

    psum = partial(jax.lax.psum, axis_name=axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=ba.BAResult(cam_Tcw=P(), points=P(),
                              obs_inlier=P(axis), final_cost=P()),
        check_vma=False,
    )
    def _run(cam, pts, ocam, opt, ouv, osig, ovalid, fixed):
        return ba.bundle_adjust_core(
            cam, pts, ocam, opt, ouv, osig, ovalid, fixed,
            fx, fy, cx, cy, iters=iters, cg_iters=cg_iters,
            use_huber=use_huber, psum=psum)

    res = jax.jit(_run)(
        jnp.asarray(cam_Tcw), jnp.asarray(points),
        jnp.asarray(obs_cam), jnp.asarray(obs_pt), jnp.asarray(obs_uv),
        jnp.asarray(obs_isig2), jnp.asarray(obs_valid),
        jnp.asarray(fixed_cam))
    return ba.BAResult(
        cam_Tcw=res.cam_Tcw,
        points=res.points,
        obs_inlier=res.obs_inlier[:O],
        final_cost=res.final_cost,
    )


# ----------------------------------------------------------------------
# Memory-scaling GBA: POINT state sharded across the mesh
# (BASELINE config 4 / SURVEY §7.2.8).  Each device owns a contiguous
# block of points AND all of their observations, so every point-indexed
# array — points (P,3), Hpp (P,3,3), gp, Hpp^-1, delta_p — exists only
# as a 1/n_dev shard in device memory; only the small camera system
# (K,6,6) is psum-reduced over the interconnect.  Map size can then
# grow past a single chip's HBM.
# ----------------------------------------------------------------------

def shard_points_problem(points, obs_cam, obs_pt, obs_uv, obs_isig2,
                         obs_valid, n_dev):
    """Partition points into n_dev contiguous blocks balanced by
    observation count; colocate each observation with its point's
    shard.  Returns per-shard padded arrays flattened along axis 0
    (split evenly by P(axis)) plus the scatter map back to global
    point rows."""
    P = len(points)
    O = len(obs_cam)
    counts = np.bincount(np.asarray(obs_pt, np.int64), minlength=P)
    csum = np.cumsum(counts)
    # block boundaries at equal observation mass
    cuts = [0]
    for d in range(1, n_dev):
        cuts.append(int(np.searchsorted(csum, csum[-1] * d / n_dev)))
    cuts.append(P)
    starts = np.asarray(cuts[:-1])
    ends = np.asarray(cuts[1:])
    Pmax = max(1, int((ends - starts).max()))
    shard_of_pt = np.zeros(P, np.int32)
    for d in range(n_dev):
        shard_of_pt[starts[d]:ends[d]] = d

    obs_shard = shard_of_pt[np.asarray(obs_pt, np.int64)]
    Omax = max(1, int(np.bincount(obs_shard, minlength=n_dev).max()))

    pts_sh = np.zeros((n_dev, Pmax, 3), np.float32)
    pt_map = np.full((n_dev, Pmax), -1, np.int64)   # global row per slot
    ocam = np.zeros((n_dev, Omax), np.int32)
    opt = np.zeros((n_dev, Omax), np.int32)
    ouv = np.zeros((n_dev, Omax, 2), np.float32)
    osig = np.ones((n_dev, Omax), np.float32)
    ovalid = np.zeros((n_dev, Omax), bool)
    obs_slot = np.zeros(O, np.int64)                # for inlier writeback
    for d in range(n_dev):
        s, e = starts[d], ends[d]
        n_p = e - s
        pts_sh[d, :n_p] = points[s:e]
        pt_map[d, :n_p] = np.arange(s, e)
        sel = np.where(obs_shard == d)[0]
        m = len(sel)
        ocam[d, :m] = obs_cam[sel]
        opt[d, :m] = np.asarray(obs_pt)[sel] - s    # local point index
        ouv[d, :m] = obs_uv[sel]
        osig[d, :m] = obs_isig2[sel]
        ovalid[d, :m] = np.asarray(obs_valid)[sel]
        obs_slot[sel] = d * Omax + np.arange(m)
    flat = lambda a: a.reshape((n_dev * a.shape[1],) + a.shape[2:])
    return (flat(pts_sh), flat(ocam), flat(opt), flat(ouv), flat(osig),
            flat(ovalid), pt_map.reshape(-1), obs_slot, Pmax)


def distributed_bundle_adjust_sharded_points(
    mesh: Mesh,
    cam_Tcw: np.ndarray,
    points: np.ndarray,
    obs_cam: np.ndarray,
    obs_pt: np.ndarray,
    obs_uv: np.ndarray,
    obs_isig2: np.ndarray,
    obs_valid: np.ndarray,
    fixed_cam: np.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    iters: int = 10,
    cg_iters: int = 20,
    use_huber: bool = True,
) -> ba.BAResult:
    """Same contract as optim.ba.bundle_adjust with the point state
    sharded over the mesh (cameras replicated, observations colocated
    with their point's shard)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    (pts_f, ocam_f, opt_f, ouv_f, osig_f, ovalid_f,
     pt_map, obs_slot, Pmax) = shard_points_problem(
        np.asarray(points, np.float32), np.asarray(obs_cam, np.int32),
        np.asarray(obs_pt, np.int32), np.asarray(obs_uv, np.float32),
        np.asarray(obs_isig2, np.float32), np.asarray(obs_valid, bool),
        n_dev)

    psum = partial(jax.lax.psum, axis_name=axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P()),
        out_specs=ba.BAResult(cam_Tcw=P(), points=P(axis),
                              obs_inlier=P(axis), final_cost=P()),
        check_vma=False,
    )
    def _run(cam, pts, ocam, opt, ouv, osig, ovalid, fixed):
        return ba.bundle_adjust_core(
            cam, pts, ocam, opt, ouv, osig, ovalid, fixed,
            fx, fy, cx, cy, iters=iters, cg_iters=cg_iters,
            use_huber=use_huber, psum=psum, psum_pt=ba._identity_psum)

    res = jax.jit(_run)(
        jnp.asarray(cam_Tcw), jnp.asarray(pts_f),
        jnp.asarray(ocam_f), jnp.asarray(opt_f), jnp.asarray(ouv_f),
        jnp.asarray(osig_f), jnp.asarray(ovalid_f),
        jnp.asarray(np.asarray(fixed_cam, bool)))

    # un-shard: scatter padded rows back to the global layout
    pts_flat = np.asarray(res.points)
    out_pts = np.array(points, np.float32)
    live = pt_map >= 0
    out_pts[pt_map[live]] = pts_flat[live]
    inl_flat = np.asarray(res.obs_inlier)
    return ba.BAResult(
        cam_Tcw=res.cam_Tcw,
        points=jnp.asarray(out_pts),
        obs_inlier=jnp.asarray(inl_flat[obs_slot]),
        final_cost=res.final_cost,
    )
