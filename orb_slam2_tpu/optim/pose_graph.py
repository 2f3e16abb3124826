"""Essential-graph Sim3 pose-graph optimization.

Replaces Optimizer::OptimizeEssentialGraph (src/Optimizer.cc:654-983):
7-DoF Sim3 vertices per keyframe, edges from loop connections (weight
>= 100), the spanning tree, past loop edges, and strong covisibility
edges, identity information matrices, LM.

Edge residual (g2o EdgeSim3 semantics): for edge (i -> j) with
measurement Sji,  r = log(Sji * Si * Sj^-1), zero when Sj = Sji * Si.
Jacobians by forward-mode autodiff on the exp chart of both endpoints,
vmapped over all edges; the sparse normal equations are solved by
block-Jacobi PCG with edge-list segment-sum matvecs (same pattern as
the BA Schur solve — shards over a mesh the same way).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import sim3


class PoseGraphResult(NamedTuple):
    sims: jnp.ndarray       # (K, 8) optimized Sim3 world->kf
    final_cost: jnp.ndarray


def _edge_residual(xi_i, xi_j, Si, Sj, Sji):
    Si_new = sim3.compose(sim3.exp(xi_i), Si)
    Sj_new = sim3.compose(sim3.exp(xi_j), Sj)
    return sim3.log(sim3.compose(Sji, sim3.compose(Si_new, sim3.inv(Sj_new))))


_res0 = jax.vmap(lambda Si, Sj, Sji: _edge_residual(
    jnp.zeros(7), jnp.zeros(7), Si, Sj, Sji))
_jac_i = jax.vmap(lambda Si, Sj, Sji: jax.jacfwd(
    lambda xi: _edge_residual(xi, jnp.zeros(7), Si, Sj, Sji))(jnp.zeros(7)))
_jac_j = jax.vmap(lambda Si, Sj, Sji: jax.jacfwd(
    lambda xj: _edge_residual(jnp.zeros(7), xj, Si, Sj, Sji))(jnp.zeros(7)))


def _identity_psum(x):
    return x


def optimize_pose_graph_core(
    sims0: jnp.ndarray,      # (K, 8) initial Sim3 (world -> kf)
    edge_i: jnp.ndarray,     # (E,) int32 — may be a shard of the edges
    edge_j: jnp.ndarray,     # (E,) int32
    edge_meas: jnp.ndarray,  # (E, 8) measurement Sji
    edge_weight: jnp.ndarray,  # (E,) float — 0 masks a padded edge
    fixed: jnp.ndarray,      # (K,) bool — e.g. the loop keyframe
    iters: int = 20,
    cg_iters: int = 30,
    psum=_identity_psum,
) -> PoseGraphResult:
    """LM over the Sim3 pose graph.  All edge-segment reductions are
    closed with ``psum`` so the edge list can be sharded across a device
    mesh (parallel/dist_pose_graph.py); vertex state is replicated."""
    K = sims0.shape[0]
    free = ~fixed

    def cost(sims):
        Si = sims[edge_i]
        Sj = sims[edge_j]
        r = _res0(Si, Sj, edge_meas)
        return psum(jnp.sum(edge_weight * jnp.sum(r * r, -1)))

    def body(_, st):
        sims, lam = st
        Si = sims[edge_i]
        Sj = sims[edge_j]
        r = _res0(Si, Sj, edge_meas)                  # (E, 7)
        Ji = _jac_i(Si, Sj, edge_meas)                # (E, 7, 7)
        Jj = _jac_j(Si, Sj, edge_meas)
        w = edge_weight[:, None, None]

        # gradient: g_k = sum_e J^T r (psum closes sharded edges)
        g = jnp.zeros((K, 7))
        g = g.at[edge_i].add(jnp.einsum("eab,ea->eb", Ji * w, r))
        g = g.at[edge_j].add(jnp.einsum("eab,ea->eb", Jj * w, r))
        g = psum(g)
        g = jnp.where(free[:, None], g, 0.0)

        # block-diagonal preconditioner + damping
        diag = jnp.zeros((K, 7, 7))
        diag = diag.at[edge_i].add(jnp.einsum("eab,eac->ebc", Ji * w, Ji))
        diag = diag.at[edge_j].add(jnp.einsum("eab,eac->ebc", Jj * w, Jj))
        diag = psum(diag)
        damp = lam * jnp.eye(7) * jnp.maximum(
            jnp.trace(diag, axis1=-2, axis2=-1)[:, None, None] / 7.0, 1e-6)
        diag_d = diag + damp + 1e-8 * jnp.eye(7)
        M_inv = jnp.linalg.inv(jnp.where(
            free[:, None, None], diag_d,
            jnp.broadcast_to(jnp.eye(7), diag_d.shape)))

        def H_matvec(x):
            xm = jnp.where(free[:, None], x, 0.0)
            ri = jnp.einsum("eab,eb->ea", Ji, xm[edge_i]) \
                + jnp.einsum("eab,eb->ea", Jj, xm[edge_j])    # J x per edge
            out = jnp.zeros((K, 7))
            out = out.at[edge_i].add(jnp.einsum("eab,ea->eb", Ji * w, ri))
            out = out.at[edge_j].add(jnp.einsum("eab,ea->eb", Jj * w, ri))
            out = psum(out)
            out = out + (damp @ xm[..., None])[..., 0]
            return jnp.where(free[:, None], out, x)

        b = -g
        x0 = jnp.zeros((K, 7))
        r0 = b - H_matvec(x0)
        z0 = jnp.einsum("kab,kb->ka", M_inv, r0)
        p0 = z0

        def cg(_, st):
            x, rr, z, p = st
            Hp = H_matvec(p)
            rz = jnp.sum(rr * z)
            alpha = rz / jnp.maximum(jnp.sum(p * Hp), 1e-20)
            x = x + alpha * p
            r_new = rr - alpha * Hp
            z_new = jnp.einsum("kab,kb->ka", M_inv, r_new)
            beta = jnp.sum(r_new * z_new) / jnp.maximum(rz, 1e-20)
            return x, r_new, z_new, z_new + beta * p

        dx, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg, (x0, r0, z0, p0))
        dx = jnp.where(free[:, None], dx, 0.0)
        cand = sim3.compose(sim3.exp(dx), sims)
        ok = cost(cand) < cost(sims)
        sims = jnp.where(ok, cand, sims)
        lam = jnp.where(ok, lam * 0.5, lam * 4.0)
        return sims, lam

    sims, _ = jax.lax.fori_loop(0, iters, body,
                                (sims0, jnp.float32(1e-3)))
    return PoseGraphResult(sims=sims, final_cost=cost(sims))


@functools.partial(jax.jit, static_argnames=("iters", "cg_iters"))
def optimize_pose_graph(
    sims0: jnp.ndarray,
    edge_i: jnp.ndarray,
    edge_j: jnp.ndarray,
    edge_meas: jnp.ndarray,
    edge_weight: jnp.ndarray,
    fixed: jnp.ndarray,
    iters: int = 20,
    cg_iters: int = 30,
) -> PoseGraphResult:
    """Single-device entry point (see optimize_pose_graph_core)."""
    return optimize_pose_graph_core(
        sims0, edge_i, edge_j, edge_meas, edge_weight, fixed,
        iters=iters, cg_iters=cg_iters)
