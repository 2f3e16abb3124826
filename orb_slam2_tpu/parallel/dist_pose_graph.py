"""Distributed essential-graph (Sim3 pose-graph) optimization.

Shards the EDGE list across the mesh (edges are the big state in a pose
graph — loop closures over long trajectories produce O(K) spanning-tree
+ covisibility + loop edges); the Sim3 vertex array is replicated.  The
gradient / block-diagonal / Hessian-matvec segment sums inside
optim.pose_graph are closed with psum, so every device solves the same
reduced system — same pattern as dist_ba, collectives ride ICI within a
slice and DCN across hosts.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..optim import pose_graph
from .dist_ba import make_mesh, pad_obs_to  # noqa: F401 (re-export mesh helper)


def distributed_pose_graph(
    mesh: Mesh,
    sims0: np.ndarray,       # (K, 8)
    edge_i: np.ndarray,      # (E,)
    edge_j: np.ndarray,
    edge_meas: np.ndarray,   # (E, 8)
    edge_weight: np.ndarray,  # (E,)
    fixed: np.ndarray,       # (K,) bool
    iters: int = 20,
    cg_iters: int = 30,
) -> pose_graph.PoseGraphResult:
    """Same contract as optim.pose_graph.optimize_pose_graph, edges
    sharded over the mesh (padded with zero-weight edges)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    E = len(edge_i)
    Epad = pad_obs_to(max(E, n_dev), n_dev)
    pad = Epad - E

    from ..geom import sim3 as sim3_mod
    ident = np.asarray(sim3_mod.identity())
    edge_i = np.pad(np.asarray(edge_i, np.int32), (0, pad))
    edge_j = np.pad(np.asarray(edge_j, np.int32), (0, pad))
    edge_meas = np.concatenate(
        [np.asarray(edge_meas, np.float32),
         np.tile(ident, (pad, 1))]).astype(np.float32)
    edge_weight = np.pad(np.asarray(edge_weight, np.float32), (0, pad))

    psum = partial(jax.lax.psum, axis_name=axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=pose_graph.PoseGraphResult(sims=P(), final_cost=P()),
        check_vma=False,
    )
    def _run(s0, ei, ej, em, ew, fx):
        return pose_graph.optimize_pose_graph_core(
            s0, ei, ej, em, ew, fx, iters=iters, cg_iters=cg_iters,
            psum=psum)

    return jax.jit(_run)(
        jnp.asarray(sims0, jnp.float32), jnp.asarray(edge_i),
        jnp.asarray(edge_j), jnp.asarray(edge_meas),
        jnp.asarray(edge_weight), jnp.asarray(fixed))
