"""Chip microbench of extractor internals at bench shape (1920x1440,
8 levels, 4000 features) — which stage owns the 64.7 ms?"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

print("platform:", jax.devices()[0], flush=True)

from orb_slam2_tpu.ops import pyramid, fast, distribute, orientation, brief
from orb_slam2_tpu.ops.extractor import (OrbParams, extract,
                                         features_per_level)

P = OrbParams(n_features=4000, n_levels=8, scale_factor=1.2)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (1440, 1920)).astype(np.float32))


def _first_leaf(out):
    return jax.tree_util.tree_leaves(out)[0]


def bench(label, fn, n=5):
    """block_until_ready through the axon tunnel acks the DISPATCH, not
    completion — force completion with a device_get of the first output
    leaf's first element and subtract the measured round trip."""
    out = fn()
    jax.device_get(_first_leaf(out).ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
        jax.device_get(_first_leaf(out).ravel()[:1])
    per = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:44s} {per:8.1f} ms (incl {RT:.0f} ms rt)", flush=True)
    return out


f_tiny = jax.jit(lambda x: x + 1.0)
jax.device_get(f_tiny(jnp.zeros(8)))
t0 = time.perf_counter()
for _ in range(10):
    jax.device_get(f_tiny(jnp.zeros(8)))
RT = 100.0 * (time.perf_counter() - t0)
print(f"tunnel rt: {RT:.1f} ms", flush=True)


levels_fn = jax.jit(lambda im: pyramid.build_pyramid(im, P.n_levels,
                                                     P.scale_factor))
levels = bench("pyramid (8 levels)", lambda: levels_fn(img))

lvl0 = levels[0]
detect_fn = jax.jit(lambda im: fast.detect(im, th_hi=P.th_fast_hi,
                                           th_lo=P.th_fast_lo))
keep, score = bench("fast.detect level0", lambda: detect_fn(lvl0))

budgets = features_per_level(P.n_features, P.n_levels, P.scale_factor)
topk_fn = jax.jit(lambda k, s: distribute.grid_topk(k, s, budgets[0]))
ys, xs, resp, valid = bench("grid_topk level0", lambda: topk_fn(keep, score))

ang_fn = jax.jit(lambda im, y, x: orientation.ic_angle(im, y, x))
ang = bench("ic_angle level0", lambda: ang_fn(lvl0, ys, xs))

blur_fn = jax.jit(pyramid.gaussian_blur_7x7)
blurred = bench("gaussian_blur level0", lambda: blur_fn(lvl0))

desc_fn = jax.jit(lambda b, y, x, a: brief.compute_descriptors(
    b, y, x, a, pattern=P.pattern))
bench("brief level0", lambda: desc_fn(blurred, ys, xs, ang))

# all-levels detect+topk chain (without brief/angle) vs full
def chain_all(im):
    lv = pyramid.build_pyramid(im, P.n_levels, P.scale_factor)
    outs = []
    for l, (im_l, n_l) in enumerate(zip(lv, budgets)):
        if n_l == 0:
            continue
        k, s = fast.detect(im_l, th_hi=P.th_fast_hi, th_lo=P.th_fast_lo)
        outs.append(distribute.grid_topk(k, s, n_l))
    return outs

bench("pyramid+fast+topk ALL levels", lambda: jax.jit(chain_all)(img))
full_fn = jax.jit(lambda im: extract(im, P))
bench("FULL extract", lambda: full_fn(img))
