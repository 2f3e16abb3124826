"""Chip microbench of the fuse kernels at bench shapes.

Separates compile time from steady-state compute for
_fuse_stack_rows (forward, 8-target chunks) and _fuse_reverse_rows
(16384 candidates into one frame) — bench r3c showed fuse/device at
3.6 s/call and this tells us whether that's compile or compute.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def t(label, fn, n=3):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    steady = (time.perf_counter() - t0) / n
    print(f"{label:44s} first={first*1e3:9.1f} ms steady={steady*1e3:9.1f} ms",
          flush=True)


def main():
    from orb_slam2_tpu.pipeline.local_mapping import (
        _fuse_stack_rows, _fuse_reverse_rows)
    from orb_slam2_tpu.geom.camera import Intrinsics, undistorted_bounds

    print(f"platform: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    CAPP = 65536   # device point store capacity
    N2 = 4096      # frame feature rows (4000 padded is 4096? frame.n=4000)
    N2 = 4000
    CH = 8
    P1 = 4096      # own rows bucket
    P2 = 16384     # cand rows bucket

    pt_pos = jnp.asarray(rng.uniform(-20, 20, (CAPP, 3)).astype(np.float32))
    pt_desc = jnp.asarray(rng.integers(0, 2**32, (CAPP, 8), dtype=np.uint64).astype(np.uint32))
    pt_normal = jnp.asarray(np.tile(np.array([0, 0, 1], np.float32), (CAPP, 1)))
    pt_min = jnp.asarray(np.full(CAPP, 0.1, np.float32))
    pt_max = jnp.asarray(np.full(CAPP, 100.0, np.float32))
    pt_alive = jnp.asarray(np.ones(CAPP, bool))

    cam = Intrinsics(fx=960.0, fy=960.0, cx=960.0, cy=720.0,
                     width=1920, height=1440)
    bounds = undistorted_bounds(cam)
    scale_factors = jnp.asarray((1.2 ** np.arange(8)).astype(np.float32))

    Tcw_s = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (CH, 1, 1)))
    kxy = jnp.asarray(rng.uniform(0, 1440, (CH, N2, 2)).astype(np.float32))
    koct = jnp.asarray(rng.integers(0, 8, (CH, N2)).astype(np.int32))
    kdesc = jnp.asarray(rng.integers(0, 2**32, (CH, N2, 8), dtype=np.uint64).astype(np.uint32))
    kvalid = jnp.asarray(np.packbits(np.ones((CH, N2), bool), axis=1))

    own_rows = jnp.asarray(np.arange(P1, dtype=np.int32))
    cand_rows = jnp.asarray(np.arange(P2, dtype=np.int32))

    args = (pt_pos, pt_desc, pt_normal, pt_min, pt_max, pt_alive)

    t("fuse fwd chunk (8 tgt x 4096 pts x 4000 f)", lambda: _fuse_stack_rows(
        *args, own_rows, Tcw_s, kxy, koct, kdesc, kvalid,
        scale_factors, 960.0, 960.0, 960.0, 720.0, bounds, 8,
        float(np.log(1.2)), th=3.0, ratio=1.0))

    fxy = kxy[0]
    foct = koct[0]
    fdesc = kdesc[0]
    fvalid = jnp.asarray(np.ones(N2, bool))
    eye4 = jnp.asarray(np.eye(4, dtype=np.float32))
    t("fuse rev (16384 cand x 4000 f)", lambda: _fuse_reverse_rows(
        *args, cand_rows, eye4,
        fxy, foct, fdesc, fvalid,
        scale_factors, 960.0, 960.0, 960.0, 720.0, bounds, 8,
        float(np.log(1.2)), th=3.0, ratio=1.0))

    # 3 forward chunks + 1 reverse, one batched read — the real call
    def full():
        parts = [_fuse_stack_rows(
            *args, own_rows, Tcw_s, kxy, koct, kdesc, kvalid,
            scale_factors, 960.0, 960.0, 960.0, 720.0, bounds, 8,
            float(np.log(1.2)), th=3.0, ratio=1.0) for _ in range(3)]
        rev = _fuse_reverse_rows(
            *args, cand_rows, eye4,
            fxy, foct, fdesc, fvalid,
            scale_factors, 960.0, 960.0, 960.0, 720.0, bounds, 8,
            float(np.log(1.2)), th=3.0, ratio=1.0)
        return jax.device_get((parts, rev))
    t("FULL fuse (3 fwd chunks + rev + readback)", full)


if __name__ == "__main__":
    main()
