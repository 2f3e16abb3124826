import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
print("platform:", jax.devices()[0], flush=True)
from orb_slam2_tpu.matching import pallas_hamming as ph
from orb_slam2_tpu.matching import core

rng = np.random.default_rng(0)
n = m = 4096
d1 = jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32))
d2 = jnp.asarray(rng.integers(0, 2**32, (m, 8), dtype=np.uint64).astype(np.uint32))
v2 = jnp.ones(m, bool)

b, i, s = ph.hamming_top2(d1, d2, v2)
b.block_until_ready()
t0 = time.perf_counter()
for _ in range(20):
    b, i, s = ph.hamming_top2(d1, d2, v2)
b.block_until_ready()
t_pallas = (time.perf_counter() - t0) / 20

br, ir, sr = ph.hamming_top2_xla(d1, d2, v2)
br.block_until_ready()
xla2 = jax.jit(ph.hamming_top2_xla)
br, ir, sr = xla2(d1, d2, v2); br.block_until_ready()
t0 = time.perf_counter()
for _ in range(20):
    br, ir, sr = xla2(d1, d2, v2)
br.block_until_ready()
t_xla = (time.perf_counter() - t0) / 20

print(f"pallas: {t_pallas*1e3:.2f} ms   xla: {t_xla*1e3:.2f} ms   speedup {t_xla/t_pallas:.2f}x", flush=True)
ok_b = np.array_equal(np.asarray(b), np.asarray(br))
ok_s = np.array_equal(np.asarray(s), np.asarray(sr))
print("best equal:", ok_b, "second equal:", ok_s, flush=True)
assert ok_b and ok_s
print("PALLAS CHIP OK", flush=True)
