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
