"""Measure host->device transfer patterns through the axon tunnel.

Question: do N separate jnp.asarray uploads pipeline, or does each pay
a tunnel round trip?  And does a single device_put of a pytree batch
them the way device_get does (verified fact: pytree device_get is ONE
round trip)?
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def t(fn, n=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3


arrs = [np.random.default_rng(i).integers(0, 100, 65536).astype(np.int32)
        for i in range(7)]  # 7 x 256 KB — the sba upload shape


def sep():
    out = [jnp.asarray(a) for a in arrs]
    jax.block_until_ready(out)


def tree():
    out = jax.device_put(tuple(arrs))
    jax.block_until_ready(out)


def one_concat():
    out = jnp.asarray(np.concatenate(arrs))
    jax.block_until_ready(out)


print(f"7 x 256KB separate jnp.asarray : {t(sep):7.1f} ms", flush=True)
print(f"7 x 256KB one device_put pytree: {t(tree):7.1f} ms", flush=True)
print(f"1 x 1.75MB concat jnp.asarray  : {t(one_concat):7.1f} ms", flush=True)

small = [np.zeros(128, np.float32) for _ in range(7)]


def sep_small():
    out = [jnp.asarray(a) for a in small]
    jax.block_until_ready(out)


def tree_small():
    out = jax.device_put(tuple(small))
    jax.block_until_ready(out)


print(f"7 x 512B separate jnp.asarray  : {t(sep_small):7.1f} ms", flush=True)
print(f"7 x 512B one device_put pytree : {t(tree_small):7.1f} ms", flush=True)

# dispatch+read pattern: does a dispatch whose operands are still
# uploading overlap with the uploads?
f = jax.jit(lambda xs: sum(x.sum() for x in xs))
_ = f(tuple(jnp.asarray(a) for a in arrs)).block_until_ready()


def upload_dispatch_read():
    xs = tuple(jnp.asarray(a) for a in arrs)
    return float(f(xs))


print(f"upload+dispatch+read (sep)     : {t(upload_dispatch_read):7.1f} ms",
      flush=True)


def upload_dispatch_read_tree():
    xs = jax.device_put(tuple(arrs))
    return float(f(xs))


print(f"upload+dispatch+read (pytree)  : {t(upload_dispatch_read_tree):7.1f} ms",
      flush=True)
