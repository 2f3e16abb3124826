"""Multi-host launch helpers.

BASELINE configs 4-5 call for distributed BA over >= 2 hosts: within a
slice the collectives ride ICI; across hosts jax.distributed extends
the same mesh over DCN.  This module wraps the launch boilerplate —
the solver code (dist_ba / dist_pose_graph) is identical at any scale
because every reduction already closes with psum over the mesh axis.

Single-host multi-chip needs nothing from here; call
``parallel.make_mesh()`` directly.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID; on Cloud TPU
    pods jax.distributed auto-detects and all three may be None)."""
    kw = {}
    if coordinator or os.environ.get("COORDINATOR_ADDRESS"):
        kw["coordinator_address"] = (coordinator
                                     or os.environ["COORDINATOR_ADDRESS"])
    if num_processes or os.environ.get("NUM_PROCESSES"):
        kw["num_processes"] = int(num_processes
                                  or os.environ["NUM_PROCESSES"])
    if process_id is not None or os.environ.get("PROCESS_ID"):
        kw["process_id"] = int(process_id
                               if process_id is not None
                               else os.environ["PROCESS_ID"])
    jax.distributed.initialize(**kw)


def make_global_mesh(axis: str = "obs") -> Mesh:
    """One mesh over ALL devices of all participating hosts.  With
    jax.distributed initialized, jax.devices() is the global device
    list; dist_ba/dist_pose_graph shard over it unchanged — psum rides
    ICI within each slice and DCN between hosts."""
    return Mesh(np.array(jax.devices()), (axis,))
