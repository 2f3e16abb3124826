"""Chip check: Pallas FAST score map vs the XLA roll-stack twin, plus
a detect() equivalence check on the interior, plus timing."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

print("platform:", jax.devices()[0], flush=True)

from orb_slam2_tpu.ops import fast

rng = np.random.default_rng(0)
for (h, w) in [(1440, 1920), (480, 640), (100, 180)]:
    img = rng.integers(0, 256, (h, w)).astype(np.float32)
    s_x = jax.jit(fast.fast_score_map)(jnp.asarray(img))
    s_p = jax.jit(lambda im: fast._score_map_pallas(h, w)(im))(jnp.asarray(img))
    sx = np.asarray(s_x)[3:-3, 3:-3]
    sp = np.asarray(s_p)[3:-3, 3:-3]
    diff = np.abs(sx - sp)
    print(f"{h}x{w}: interior max diff {diff.max()}", flush=True)
    assert diff.max() == 0.0, diff.max()

# timing at bench shape
img = jnp.asarray(rng.integers(0, 256, (1440, 1920)).astype(np.float32))
f_tiny = jax.jit(lambda x: x + 1.0)
jax.device_get(f_tiny(jnp.zeros(8)))
t0 = time.perf_counter()
for _ in range(10):
    jax.device_get(f_tiny(jnp.zeros(8)))
RT = 100.0 * (time.perf_counter() - t0)
print(f"tunnel rt {RT:.1f} ms", flush=True)

for label, fn in [("XLA roll-stack", jax.jit(fast.fast_score_map)),
                  ("Pallas", jax.jit(lambda im: fast._score_map_pallas(
                      1440, 1920)(im)))]:
    out = fn(img)
    jax.device_get(out.ravel()[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(img)
        jax.device_get(out.ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:20s} {(best * 1e3 - RT) / 10:.2f} ms", flush=True)
print("OK", flush=True)
