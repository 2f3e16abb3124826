"""Round-2 profiling: per-op device times + tunnel pipelining behavior.

Run on the real chip:  python tools/profile_r2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def bench(label, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:42s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    from orb_slam2_tpu.ops import pyramid, fast, distribute, orientation, brief
    from orb_slam2_tpu.ops import extractor as ex

    print(f"platform: {jax.devices()[0]}", flush=True)
    H, W = 1440, 1920
    rng = np.random.default_rng(0)
    img_np = rng.uniform(0, 255, (H, W)).astype(np.float32)
    img = jnp.asarray(img_np)
    params = ex.OrbParams(n_features=4000, n_levels=8, scale_factor=1.2)

    # --- tunnel RTT ---
    tiny = jnp.zeros((8,), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1)
    jax.block_until_ready(f_tiny(tiny))
    t0 = time.perf_counter()
    for _ in range(10):
        r = f_tiny(tiny)
        _ = jax.device_get(r)
    rtt = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{'tunnel RTT (dispatch+get tiny)':42s} {rtt:9.2f} ms", flush=True)

    # --- full extractor ---
    run = ex.make_extractor(H, W, params)
    print("compiling extractor (may take minutes)...", flush=True)
    bench("extractor full (4000f/8lvl 1920x1440)", run, img)

    # --- dispatch pipelining: K extracts in flight ---
    imgs = [jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
            for _ in range(4)]
    for im in imgs:
        jax.block_until_ready(run(im))
    t0 = time.perf_counter()
    outs = [run(im) for im in imgs]
    t_dispatch = (time.perf_counter() - t0) * 1e3
    jax.block_until_ready(outs)
    t_total = (time.perf_counter() - t0) * 1e3
    print(f"{'4 extracts: dispatch time':42s} {t_dispatch:9.2f} ms", flush=True)
    print(f"{'4 extracts: total (per-extract)':42s} {t_total/4:9.2f} ms", flush=True)

    # --- per-stage (level 0 only) ---
    f_pyr = jax.jit(lambda x: pyramid.build_pyramid(x, 8, 1.2))
    bench("pyramid 8 levels", f_pyr, img)
    f_fast = jax.jit(lambda x: fast.detect(x))
    bench("fast.detect level0", f_fast, img)
    keep, score = f_fast(img)
    f_topk = jax.jit(lambda k, s: distribute.grid_topk(k, s, 1084))
    bench("grid_topk level0 (1084)", f_topk, keep, score)
    ys, xs, resp, valid = f_topk(keep, score)
    f_ang = jax.jit(lambda im, y, x: orientation.ic_angle(im, y, x))
    bench("ic_angle 1084 kps level0", f_ang, img, ys, xs)
    ang = f_ang(img, ys, xs)
    f_blur = jax.jit(pyramid.gaussian_blur_7x7)
    bench("gaussian_blur level0", f_blur, img)
    blurred = f_blur(img)
    f_brief = jax.jit(brief.compute_descriptors)
    bench("brief 1084 kps level0", f_brief, blurred, ys, xs, ang)

    # --- matching kernels at bench shapes ---
    from orb_slam2_tpu.matching import search
    from orb_slam2_tpu.pipeline.tracking import (_match_last_fused,
                                                 _frustum_search_fused)
    NF = 4000
    NP = 1024
    kp_xy = jnp.asarray(rng.uniform(0, 1900, (NF, 2)).astype(np.float32))
    kp_oct = jnp.asarray(rng.integers(0, 8, NF).astype(np.int32))
    kp_desc = jnp.asarray(rng.integers(0, 2**31, (NF, 8)).astype(np.uint32))
    kp_valid = jnp.ones(NF, bool)
    kp_ang = jnp.zeros(NF, jnp.float32)
    pos = jnp.asarray(rng.uniform(-10, 10, (NP, 3)).astype(np.float32) + np.array([0, 0, 20], np.float32))
    Tcw = jnp.eye(4)
    sf = jnp.asarray([1.2**i for i in range(8)], jnp.float32)
    isig = 1.0 / (sf * sf)
    bounds = (0.0, 1920.0, 0.0, 1440.0)

    def mlf():
        return _match_last_fused(Tcw, pos, jnp.ones(NP, bool),
                                 jnp.zeros(NP, jnp.int32),
                                 kp_oct, kp_desc, kp_ang,
                                 kp_xy, kp_oct, kp_desc, kp_valid, kp_ang,
                                 sf, isig, 960.0, 960.0, 960.0, 720.0,
                                 bounds, 7.0, 5.991)
    bench("match_last_fused 1024x4000", mlf)

    def fsf():
        return _frustum_search_fused(
            pos, jnp.ones((NP, 3), jnp.float32) / jnp.sqrt(3.0),
            jnp.full(NP, 0.1, jnp.float32), jnp.full(NP, 100.0, jnp.float32),
            jnp.ones(NP, bool), kp_desc[:NP],
            Tcw, kp_xy, kp_oct, kp_desc, kp_valid,
            jnp.zeros(NF, bool),
            jnp.zeros((256, 3), jnp.float32), jnp.zeros(256, jnp.int32),
            jnp.zeros(256, bool), sf, isig,
            960.0, 960.0, 960.0, 720.0, bounds, 8, float(np.log(1.2)), 1.0,
            5.991)
    bench("frustum_search_fused 1024x4000", fsf)

    # --- read-while-compute overlap test ---
    r0 = run(imgs[0])
    jax.block_until_ready(r0)
    t0 = time.perf_counter()
    r1 = run(imgs[1])          # dispatch next
    got = jax.device_get(r0.xy)  # read previous while next computes
    t_get_prev = (time.perf_counter() - t0) * 1e3
    jax.block_until_ready(r1)
    t_both = (time.perf_counter() - t0) * 1e3
    print(f"{'get(prev) while extract(next) in flight':42s} {t_get_prev:9.2f} ms", flush=True)
    print(f"{'... both done':42s} {t_both:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
