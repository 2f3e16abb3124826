"""Round-2 profiling, part C: host->device upload behavior through the
axon tunnel.  Determines whether per-argument jnp.asarray uploads
serialize (the suspected cause of 0.5-2s frames despite ~100ms device
compute)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print(f"platform: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    small = [rng.normal(size=(1024,)).astype(np.float32) for _ in range(16)]
    med = [rng.normal(size=(4096, 8)).astype(np.float32) for _ in range(16)]
    big = rng.normal(size=(1440, 1920)).astype(np.float32)

    # warm any upload paths
    jax.block_until_ready(jnp.asarray(small[0]))
    jax.block_until_ready(jnp.asarray(med[0]))
    jax.block_until_ready(jnp.asarray(big))

    # 16 small uploads, then block
    t0 = time.perf_counter()
    outs = [jnp.asarray(a) for a in small]
    t_disp = (time.perf_counter() - t0) * 1e3
    jax.block_until_ready(outs)
    t_all = (time.perf_counter() - t0) * 1e3
    print(f"16 small uploads (4KB): dispatch {t_disp:.1f} ms, total {t_all:.1f} ms", flush=True)

    t0 = time.perf_counter()
    outs = [jnp.asarray(a) for a in med]
    t_disp = (time.perf_counter() - t0) * 1e3
    jax.block_until_ready(outs)
    t_all = (time.perf_counter() - t0) * 1e3
    print(f"16 med uploads (128KB): dispatch {t_disp:.1f} ms, total {t_all:.1f} ms", flush=True)

    t0 = time.perf_counter()
    out = jnp.asarray(big)
    jax.block_until_ready(out)
    t_all = (time.perf_counter() - t0) * 1e3
    print(f"1 big upload (11MB): total {t_all:.1f} ms", flush=True)

    # single small upload, blocked
    for lbl, a in (("1 small upload", small[0]), ("1 med upload", med[0])):
        t0 = time.perf_counter()
        for _ in range(10):
            jax.block_until_ready(jnp.asarray(a + 0))  # +0 to defeat caching
        print(f"{lbl} blocked x10: {(time.perf_counter()-t0)*1e2:.1f} ms each", flush=True)

    # jitted fn over numpy args (implicit uploads) vs device args
    f = jax.jit(lambda *xs: sum(jnp.sum(x) for x in xs))
    dev_args = [jnp.asarray(a) for a in med]
    jax.block_until_ready(f(*dev_args))
    t0 = time.perf_counter()
    for _ in range(5):
        r = f(*[a + 0 for a in med])  # numpy args, fresh buffers
        jax.block_until_ready(r)
    print(f"jit(16 numpy args) x5: {(time.perf_counter()-t0)*200:.1f} ms each", flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        r = f(*dev_args)
        jax.block_until_ready(r)
    print(f"jit(16 device args) x5: {(time.perf_counter()-t0)*200:.1f} ms each", flush=True)

    # upload while compute in flight: does upload overlap?
    g = jax.jit(lambda x: jnp.tanh(x @ x))
    m = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
    jax.block_until_ready(g(m))
    t0 = time.perf_counter()
    r = g(m)  # ~tens of ms of compute
    up = jnp.asarray(med[0] + 0)
    jax.block_until_ready(up)
    t_up = (time.perf_counter() - t0) * 1e3
    jax.block_until_ready(r)
    t_both = (time.perf_counter() - t0) * 1e3
    print(f"upload while matmul in flight: upload done {t_up:.1f} ms, both {t_both:.1f} ms", flush=True)

    # mimic one steady tracking frame's host->device traffic
    from orb_slam2_tpu.pipeline.tracking import _match_last_fused, _frustum_search_fused
    NF, NP = 4000, 1024
    kp_xy = jnp.asarray(rng.uniform(0, 1900, (NF, 2)).astype(np.float32))
    kp_oct = jnp.asarray(rng.integers(0, 8, NF).astype(np.int32))
    kp_desc = jnp.asarray(rng.integers(0, 2**31, (NF, 8)).astype(np.uint32))
    kp_valid = jnp.ones(NF, bool)
    kp_ang = jnp.zeros(NF, jnp.float32)
    sf = jnp.asarray([1.2**i for i in range(8)], jnp.float32)
    isig = 1.0 / (sf * sf)
    bounds = (0.0, 1920.0, 0.0, 1440.0)
    pos_np = rng.uniform(-10, 10, (NP, 3)).astype(np.float32) + np.array([0, 0, 20], np.float32)
    Tcw_np = np.eye(4, dtype=np.float32)

    def one_frame():
        # uploads exactly like _match_against_last + _track_local_map
        res, gate = _match_last_fused(
            jnp.asarray(Tcw_np), jnp.asarray(pos_np),
            jnp.asarray(np.ones(NP, bool)),
            jnp.asarray(np.zeros(NP, np.int32)),
            kp_oct, kp_desc, kp_ang,
            kp_xy, kp_oct, kp_desc, kp_valid, kp_ang,
            sf, isig, 960.0, 960.0, 960.0, 720.0, bounds, 7.0, 5.991)
        rvalid, ridx, g = jax.device_get((res.valid, res.idx, gate))
        vis, r2, ng, og = _frustum_search_fused(
            jnp.asarray(pos_np), jnp.asarray(np.ones((NP, 3), np.float32)),
            jnp.asarray(np.full(NP, 0.1, np.float32)),
            jnp.asarray(np.full(NP, 100.0, np.float32)),
            jnp.asarray(np.ones(NP, bool)),
            jnp.asarray(rng.integers(0, 2**31, (NP, 8)).astype(np.uint32)),
            jnp.asarray(Tcw_np), kp_xy, kp_oct, kp_desc, kp_valid,
            jnp.asarray(np.zeros(NF, bool)),
            jnp.asarray(np.zeros((256, 3), np.float32)),
            jnp.asarray(np.zeros(256, np.int32)),
            jnp.asarray(np.zeros(256, bool)), sf, isig,
            960.0, 960.0, 960.0, 720.0, bounds, 8, float(np.log(1.2)),
            1.0, 5.991)
        return jax.device_get((vis, r2.idx, r2.valid, ng, og))

    one_frame()
    t0 = time.perf_counter()
    for _ in range(5):
        one_frame()
    print(f"steady-frame traffic sim x5: {(time.perf_counter()-t0)*200:.1f} ms each", flush=True)


if __name__ == "__main__":
    main()
