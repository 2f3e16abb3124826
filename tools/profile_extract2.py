"""Chip microbench of extractor stages with queued repetition: each
stage is dispatched N times back-to-back (async through the tunnel) and
ONE tiny read closes the batch — per-exec = (wall - rt) / N.  One
compile per stage (unlike in-jit replication, which made the relay
compile an 8x graph for ~30+ min)."""
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
N = 10
rng = np.random.default_rng(0)
imgs = [jnp.asarray(rng.uniform(0, 255, (1440, 1920)).astype(np.float32))
        for _ in range(3)]

f_tiny = jax.jit(lambda x: x + 1.0)
jax.device_get(f_tiny(jnp.zeros(8)))
t0 = time.perf_counter()
for _ in range(10):
    jax.device_get(f_tiny(jnp.zeros(8)))
RT = 100.0 * (time.perf_counter() - t0)
print(f"tunnel rt: {RT:.1f} ms", flush=True)

budgets = features_per_level(P.n_features, P.n_levels, P.scale_factor)


def first_leaf(out):
    return jax.tree_util.tree_leaves(out)[0]


def bench(label, fn, reps=3):
    out = fn(imgs[0])
    jax.device_get(first_leaf(out).ravel()[:1])  # compile + land
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(N):
            out = fn(imgs[i % len(imgs)])
        jax.device_get(first_leaf(out).ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    per = (best * 1e3 - RT) / N
    print(f"{label:40s} {per:8.2f} ms/exec", flush=True)
    return out


pyr_fn = jax.jit(lambda im: pyramid.build_pyramid(im, P.n_levels,
                                                  P.scale_factor))


@jax.jit
def fast_all(im):
    lv = pyramid.build_pyramid(im, P.n_levels, P.scale_factor)
    return [fast.detect(im_l, th_hi=P.th_fast_hi, th_lo=P.th_fast_lo)
            for im_l in lv]


@jax.jit
def fast_topk_all(im):
    lv = pyramid.build_pyramid(im, P.n_levels, P.scale_factor)
    outs = []
    for l, (im_l, n_l) in enumerate(zip(lv, budgets)):
        if n_l == 0:
            continue
        k, s = fast.detect(im_l, th_hi=P.th_fast_hi, th_lo=P.th_fast_lo)
        outs.append(distribute.grid_topk(k, s, n_l))
    return outs


@jax.jit
def blur_all(im):
    lv = pyramid.build_pyramid(im, P.n_levels, P.scale_factor)
    return [pyramid.gaussian_blur_7x7(im_l) for im_l in lv]


@jax.jit
def no_brief(im):
    """Everything except descriptors (angle still included)."""
    lv = pyramid.build_pyramid(im, P.n_levels, P.scale_factor)
    outs = []
    for l, (im_l, n_l) in enumerate(zip(lv, budgets)):
        if n_l == 0:
            continue
        k, s = fast.detect(im_l, th_hi=P.th_fast_hi, th_lo=P.th_fast_lo)
        ys, xs, resp, valid = distribute.grid_topk(k, s, n_l)
        ang = orientation.ic_angle(im_l, ys, xs)
        b = pyramid.gaussian_blur_7x7(im_l)
        outs.append((ys, xs, resp, valid, ang, b[:8, :8]))
    return outs


full_fn = jax.jit(lambda im: extract(im, P))

bench("pyramid (8 levels)", pyr_fn)
bench("pyramid+fast ALL", fast_all)
bench("pyramid+fast+topk ALL", fast_topk_all)
bench("pyramid+blur ALL", blur_all)
bench("ALL except brief", no_brief)
bench("FULL extract", full_fn)
