"""Verify drive: exercise the geometry hot path on the real chip.

Per .claude/skills/verify: synthetic two-view scene -> project ->
triangulate_dlt -> check_triangulation -> horn_sim3; plus the fixed
Pallas masked_top2_mutual kernel (non-interpret, on-TPU) against its
XLA oracle.  Expect: triangulation max err < 1e-3 m, horn alignment
< 1e-4, gate pass rate 1.0, kernel outputs bit-equal to the oracle.
"""
import sys
import time

import numpy as np

t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:6.1f}s] {msg}", flush=True)


log("importing jax...")
import jax
import jax.numpy as jnp

log(f"devices: {jax.devices()}")

sys.path.insert(0, "/root/repo")
from orb_slam2_tpu.geom import se3, triangulate
from orb_slam2_tpu.geom.horn import horn_sim3

rng = np.random.default_rng(42)
N = 512
pts = np.stack([rng.uniform(-4, 4, N), rng.uniform(-3, 3, N),
                rng.uniform(6, 14, N)], axis=1).astype(np.float32)
K = np.array([[960.0, 0, 960.0], [0, 960.0, 720.0], [0, 0, 1]], np.float32)
T1 = np.eye(4, dtype=np.float32)
rvec = np.array([0.02, -0.03, 0.01], np.float32)
T2 = np.asarray(se3.exp(jnp.concatenate(
    [jnp.asarray([0.6, 0.05, -0.1]), jnp.asarray(rvec)])), np.float32)


def proj(T, X):
    Xc = X @ T[:3, :3].T + T[:3, 3]
    uv = Xc[:, :2] / Xc[:, 2:3]
    return (uv * [960.0, 960.0] + [960.0, 720.0]).astype(np.float32)


uv1, uv2 = proj(T1, pts), proj(T2, pts)
P1 = triangulate.projection_matrix(jnp.asarray(K), jnp.asarray(T1))
P2 = triangulate.projection_matrix(jnp.asarray(K), jnp.asarray(T2))
log("triangulating (first compile is slow through the relay)...")
X = triangulate.triangulate_dlt(P1, P2, jnp.asarray(uv1), jnp.asarray(uv2))
err = np.abs(np.asarray(X) - pts).max()
log(f"triangulation max err = {err:.2e}  (expect < 1e-3)")
chk = triangulate.check_triangulation(
    X, jnp.asarray(T1), jnp.asarray(T2), jnp.asarray(uv1), jnp.asarray(uv2),
    960.0, 960.0, 960.0, 720.0, jnp.ones(N), jnp.ones(N))
rate = float(np.asarray(chk.good).mean())
log(f"gate pass rate = {rate:.3f}  (expect 1.0)")

s_true = 1.7
Rt = np.asarray(se3.exp(jnp.asarray([0.3, -0.2, 0.5, 0.1, 0.2, -0.05])))
pts_b = (s_true * pts @ Rt[:3, :3].T + Rt[:3, 3]).astype(np.float32)
log("horn_sim3...")
s, R, tt = [np.asarray(a) for a in horn_sim3(
    jnp.asarray(pts[:64]), jnp.asarray(pts_b[:64]))]
horn_err = max(abs(float(s) - s_true) / s_true,
               float(np.abs(R - Rt[:3, :3]).max()))
log(f"horn err = {horn_err:.2e}  (expect < 1e-4)")

# --- fixed Pallas kernel, non-interpret, on TPU, vs XLA oracle ---
from orb_slam2_tpu.matching import pallas_hamming as ph

rng2 = np.random.default_rng(0)
for (n, m) in [(256, 256), (512, 384), (1024, 512)]:
    d1 = jnp.asarray(rng2.integers(0, 2**32, (n, 8), dtype=np.uint64)
                     .astype(np.uint32))
    d2 = jnp.asarray(rng2.integers(0, 2**32, (m, 8), dtype=np.uint64)
                     .astype(np.uint32))
    ra = jnp.asarray(np.stack([
        rng2.uniform(0, 600, n), rng2.uniform(0, 400, n),
        rng2.uniform(20, 120, n), rng2.integers(0, 3, n).astype(float),
        rng2.integers(2, 5, n).astype(float),
        (rng2.random(n) < 0.9).astype(float)], axis=1).astype(np.float32))
    ca = jnp.asarray(np.stack([
        rng2.uniform(0, 600, m), rng2.uniform(0, 400, m),
        rng2.integers(0, 5, m).astype(float),
        (rng2.random(m) < 0.9).astype(float)], axis=1).astype(np.float32))
    log(f"masked_top2_mutual N={n} M={m} (compiling)...")
    bk, sk, ck = [np.asarray(a) for a in ph.masked_top2_mutual(d1, d2, ra, ca)]
    bx, sx, cx = [np.asarray(a)
                  for a in ph.masked_top2_mutual_xla(d1, d2, ra, ca)]
    ok = (np.array_equal(bk, bx) and np.array_equal(sk, sx)
          and np.array_equal(ck, cx))
    log(f"  kernel vs oracle: bkey={np.array_equal(bk, bx)} "
        f"skey={np.array_equal(sk, sx)} ckey={np.array_equal(ck, cx)}")
    if not ok:
        bad = np.where(ck != cx)[0][:10]
        log(f"  FIRST ckey mismatches at cols {bad}: {ck[bad]} vs {cx[bad]}")

log("DONE")
