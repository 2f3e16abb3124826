"""Verify drive: two-view geometry on the real chip.

project -> triangulate_dlt -> check_triangulation -> horn_sim3.
Expect: triangulation max err < 1e-3 m, horn alignment < 1e-4,
gate pass rate 1.0.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_tpu.geom import triangulate, horn, se3


def main():
    print(f"platform: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(3)
    N = 512
    X = rng.uniform(-5, 5, (N, 3)).astype(np.float32)
    X[:, 2] += 20.0
    K = np.array([[960, 0, 960], [0, 960, 720], [0, 0, 1]], np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.eye(4, dtype=np.float32)
    ang = 0.05
    T2[:3, :3] = np.array([[np.cos(ang), 0, np.sin(ang)],
                           [0, 1, 0],
                           [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    T2[:3, 3] = [1.5, 0.1, 0.2]

    def project(T, X):
        pc = X @ T[:3, :3].T + T[:3, 3]
        return (pc[:, :2] / pc[:, 2:3]) * 960 + np.array([960, 720]), pc[:, 2]

    uv1, z1 = project(T1, X)
    uv2, z2 = project(T2, X)

    P1 = triangulate.projection_matrix(jnp.asarray(K), jnp.asarray(T1))
    P2 = triangulate.projection_matrix(jnp.asarray(K), jnp.asarray(T2))
    Xh = np.asarray(triangulate.triangulate_dlt(
        P1, P2, jnp.asarray(uv1), jnp.asarray(uv2)))
    err = np.linalg.norm(Xh - X, axis=1).max()
    print(f"triangulation max err: {err:.2e} m", flush=True)

    sig = jnp.ones(N, jnp.float32)
    chk = triangulate.check_triangulation(
        jnp.asarray(Xh), jnp.asarray(T1), jnp.asarray(T2),
        jnp.asarray(uv1), jnp.asarray(uv2),
        960.0, 960.0, 960.0, 720.0, sig, sig)
    rate = float(np.asarray(chk.good).mean())
    print(f"gate pass rate: {rate:.3f}", flush=True)

    # horn alignment: random sim3 (horn maps set-2 into set-1)
    from orb_slam2_tpu.geom import sim3 as sim3_mod
    s = 1.3
    Rh = np.asarray(se3.exp(jnp.asarray([0.1, -0.2, 0.3, 0, 0, 0],
                                        jnp.float32)))[:3, :3]
    t = np.array([1.0, -2.0, 0.5], np.float32)
    Y = s * X @ Rh.T + t
    g = horn.horn_sim3(jnp.asarray(Y), jnp.asarray(X))
    align = np.asarray(sim3_mod.apply(g[None], jnp.asarray(X)[None]))[0]
    herr = np.abs(align - Y).max()
    print(f"horn alignment err: {herr:.2e}", flush=True)

    ok = err < 1e-3 and rate == 1.0 and herr < 1e-4
    print("VERIFY " + ("PASS" if ok else "FAIL"), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
