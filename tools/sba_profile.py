"""On-chip microbenchmark for the structure-BA solve (optimize_points).

Measures the per-dispatch cost at the official bench's padded sizes
(P=16384 points, O=65536 observations, K=32 cameras) and compares
scatter strategies:
  a) baseline .at[].add (unsorted obs)
  b) obs sorted by point id + indices_are_sorted scatters
  c) segment_sum formulation
Run serially — the axon tunnel supports ONE client process.
"""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from orb_slam2_tpu.optim import points_opt  # noqa: E402

P, O, K, ITERS = 16384, 65536, 32, 3

rng = np.random.default_rng(0)
n_real_p, n_real_o = 6000, 24000
pts = np.zeros((P, 3), np.float32)
pts[:n_real_p] = rng.normal(size=(n_real_p, 3)).astype(np.float32) * 5 + \
    np.array([0, 0, 20], np.float32)
obs_pt = np.zeros(O, np.int32)
obs_pt[:n_real_o] = rng.integers(0, n_real_p, n_real_o)
obs_cam = np.zeros(O, np.int32)
obs_cam[:n_real_o] = rng.integers(0, 16, n_real_o)
poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
poses[:, 0, 3] = rng.normal(size=K).astype(np.float32)
fx = fy = 960.0
cx, cy = 960.0, 720.0


def project(pose, X):
    pc = X @ pose[:3, :3].T + pose[:3, 3]
    return np.stack([fx * pc[:, 0] / pc[:, 2] + cx,
                     fy * pc[:, 1] / pc[:, 2] + cy], -1)


obs_uv = np.zeros((O, 2), np.float32)
for k in range(16):
    m = (obs_cam == k) & (np.arange(O) < n_real_o)
    obs_uv[m] = project(poses[k], pts[obs_pt[m]]) + \
        rng.normal(size=(m.sum(), 2)).astype(np.float32)
obs_sig = np.ones(O, np.float32)
obs_valid = np.zeros(O, bool)
obs_valid[:n_real_o] = True


def timeit(fn, n=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


args = dict(fx=fx, fy=fy, cx=cx, cy=cy, iters=ITERS)
d = {k: jnp.asarray(v) for k, v in dict(
    points0=pts, obs_pt=obs_pt, obs_Tcw=poses, obs_uv=obs_uv,
    obs_isig2=obs_sig, obs_valid=obs_valid, obs_cam=obs_cam).items()}
lam0 = jnp.full((P,), 1e-3, jnp.float32)

ms = timeit(lambda: points_opt.optimize_points(
    d["points0"], d["obs_pt"], d["obs_Tcw"], d["obs_uv"], d["obs_isig2"],
    d["obs_valid"], obs_cam=d["obs_cam"], lam0=lam0, **args))
print(f"baseline unsorted   : {ms:7.2f} ms / {ITERS}-iter dispatch", flush=True)

# sorted variant: host-side argsort by point id
order = np.argsort(obs_pt, kind="stable")
ds = {k: jnp.asarray(v[order]) for k, v in dict(
    obs_pt=obs_pt, obs_uv=obs_uv, obs_isig2=obs_sig, obs_valid=obs_valid,
    obs_cam=obs_cam).items()}
ms = timeit(lambda: points_opt.optimize_points(
    d["points0"], ds["obs_pt"], d["obs_Tcw"], ds["obs_uv"], ds["obs_isig2"],
    ds["obs_valid"], obs_cam=ds["obs_cam"], lam0=lam0, **args))
print(f"sorted obs (same fn): {ms:7.2f} ms / {ITERS}-iter dispatch", flush=True)

# indices_are_sorted variant: same math, scatters annotated sorted
from functools import partial  # noqa: E402
from orb_slam2_tpu.optim import reproj  # noqa: E402
from orb_slam2_tpu.geom.smallsolve import solve3x3  # noqa: E402


@partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "iters"))
def optimize_points_sorted(points0, obs_pt, kf_poses, obs_uv, obs_isig2,
                           obs_valid, obs_cam, lam0, fx, fy, cx, cy, iters):
    Pn = points0.shape[0]
    obs_Tcw = kf_poses[obs_cam]

    def assemble(points):
        res = reproj.project_jacobians(obs_Tcw, points[obs_pt], obs_uv,
                                       fx, fy, cx, cy)
        c2 = reproj.chi2(res.r, obs_isig2)
        w = obs_isig2 * reproj.huber_weight(c2, 5.991)
        w = jnp.where(obs_valid & (res.depth > 0), w, 0.0)
        Jw = res.J_point * w[:, None, None]
        Ho = jnp.einsum("oia,oib->oab", Jw, res.J_point)
        go = jnp.einsum("oia,oi->oa", Jw, res.r)
        H = jnp.zeros((Pn, 3, 3)).at[obs_pt].add(Ho, indices_are_sorted=True)
        g = jnp.zeros((Pn, 3)).at[obs_pt].add(go, indices_are_sorted=True)
        rho = jnp.where(c2 > 5.991, 2.0 * jnp.sqrt(c2 * 5.991) - 5.991, c2)
        rho_eff = jnp.where(res.depth > 0, rho, 1.0e8)
        cost_p = jnp.zeros((Pn,)).at[obs_pt].add(
            jnp.where(obs_valid, rho_eff, 0.0), indices_are_sorted=True)
        return H, g, cost_p

    def body(_, st):
        points, lam = st
        H, g, cost0 = assemble(points)
        Hd = H + lam[:, None, None] * jnp.eye(3) * jnp.maximum(
            jnp.trace(H, axis1=-2, axis2=-1)[:, None, None] / 3.0, 1e-6)
        delta = -solve3x3(Hd + 1e-9 * jnp.eye(3), g)
        cand = points + delta
        _, _, cost1 = assemble(cand)
        accept = cost1 < cost0
        points = jnp.where(accept[:, None], cand, points)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        return points, lam

    points, lam = jax.lax.fori_loop(0, iters, body, (points0, lam0))
    return points, lam


ms = timeit(lambda: optimize_points_sorted(
    d["points0"], ds["obs_pt"], d["obs_Tcw"], ds["obs_uv"], ds["obs_isig2"],
    ds["obs_valid"], ds["obs_cam"], lam0, fx, fy, cx, cy, ITERS))
print(f"sorted + annotated  : {ms:7.2f} ms / {ITERS}-iter dispatch", flush=True)

# smaller padding: O=32768
O2 = 32768
d2 = {k: jnp.asarray(v[order][:O2]) for k, v in dict(
    obs_pt=obs_pt, obs_uv=obs_uv, obs_isig2=obs_sig, obs_valid=obs_valid,
    obs_cam=obs_cam).items()}
ms = timeit(lambda: points_opt.optimize_points(
    d["points0"], d2["obs_pt"], d["obs_Tcw"], d2["obs_uv"], d2["obs_isig2"],
    d2["obs_valid"], obs_cam=d2["obs_cam"], lam0=lam0, **args))
print(f"O=32768             : {ms:7.2f} ms / {ITERS}-iter dispatch", flush=True)

# P=8192 too
P2 = 8192
pts2 = jnp.asarray(pts[:P2])
lam2 = jnp.full((P2,), 1e-3, jnp.float32)
ms = timeit(lambda: points_opt.optimize_points(
    pts2, d2["obs_pt"], d["obs_Tcw"], d2["obs_uv"], d2["obs_isig2"],
    d2["obs_valid"], obs_cam=d2["obs_cam"], lam0=lam2, **args))
print(f"O=32768, P=8192     : {ms:7.2f} ms / {ITERS}-iter dispatch", flush=True)
