"""Chip microbench of extractor stages with in-jit repetition: each
stage runs R times over DIFFERENT inputs inside one jit and returns one
tiny reduction, so the tunnel round trip is paid once per R executions.
Per-exec = (wall - rt) / R."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

print("platform:", jax.devices()[0], flush=True)

from orb_slam2_tpu.ops import pyramid, fast, distribute, orientation, brief
from orb_slam2_tpu.ops.extractor import (OrbParams, extract,
                                         features_per_level)

P = OrbParams(n_features=4000, n_levels=8, scale_factor=1.2)
R = 8
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(0, 255, (R, 1440, 1920)).astype(np.float32))

f_tiny = jax.jit(lambda x: x + 1.0)
jax.device_get(f_tiny(jnp.zeros(8)))
t0 = time.perf_counter()
for _ in range(10):
    jax.device_get(f_tiny(jnp.zeros(8)))
RT = 100.0 * (time.perf_counter() - t0)
print(f"tunnel rt: {RT:.1f} ms", flush=True)

budgets = features_per_level(P.n_features, P.n_levels, P.scale_factor)


def bench(label, make_fn, n=3):
    """make_fn() -> jitted callable over imgs returning a tiny array."""
    fn = make_fn
    out = fn(imgs)
    jax.device_get(out)  # compile + land
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_get(fn(imgs))
        best = min(best, time.perf_counter() - t0)
    per = (best * 1e3 - RT) / R
    print(f"{label:40s} {per:8.2f} ms/exec", flush=True)


def reduce_tree(t):
    leaves = jax.tree_util.tree_leaves(t)
    return sum(jnp.sum(l.astype(jnp.float32).ravel()[:4]) for l in leaves)


@jax.jit
def do_pyramid(ims):
    return jnp.stack([reduce_tree(
        pyramid.build_pyramid(ims[i], P.n_levels, P.scale_factor))
        for i in range(R)])


@jax.jit
def do_fast_all(ims):
    out = []
    for i in range(R):
        lv = pyramid.build_pyramid(ims[i], P.n_levels, P.scale_factor)
        out.append(reduce_tree([fast.detect(im_l, th_hi=P.th_fast_hi,
                                            th_lo=P.th_fast_lo)
                                for im_l in lv]))
    return jnp.stack(out)


@jax.jit
def do_fast_topk(ims):
    out = []
    for i in range(R):
        lv = pyramid.build_pyramid(ims[i], P.n_levels, P.scale_factor)
        parts = []
        for l, (im_l, n_l) in enumerate(zip(lv, budgets)):
            if n_l == 0:
                continue
            k, s = fast.detect(im_l, th_hi=P.th_fast_hi, th_lo=P.th_fast_lo)
            parts.append(distribute.grid_topk(k, s, n_l))
        out.append(reduce_tree(parts))
    return jnp.stack(out)


@jax.jit
def do_blur_all(ims):
    out = []
    for i in range(R):
        lv = pyramid.build_pyramid(ims[i], P.n_levels, P.scale_factor)
        out.append(reduce_tree([pyramid.gaussian_blur_7x7(im_l)
                                for im_l in lv]))
    return jnp.stack(out)


@jax.jit
def do_full(ims):
    return jnp.stack([reduce_tree(extract(ims[i], P)) for i in range(R)])


bench("pyramid (8 levels)", do_pyramid)
bench("pyramid+fast ALL", do_fast_all)
bench("pyramid+fast+topk ALL", do_fast_topk)
bench("pyramid+blur ALL", do_blur_all)
bench("FULL extract", do_full)
