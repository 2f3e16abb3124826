"""Worker for the 2-process jax.distributed test (test_multihost.py).

Each process owns 2 virtual CPU devices; the global mesh spans 4
devices across both processes.  Runs a psum sanity check and a small
distributed BA, then prints MULTIHOST_OK.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    coord, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from orb_slam2_tpu.parallel.multihost import (init_multihost,
                                                  make_global_mesh)
    init_multihost(coordinator=coord, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    n_dev = len(jax.devices())
    assert n_dev == 2 * nproc, n_dev
    mesh = make_global_mesh()

    # 1. psum across the whole mesh (ICI-equivalent collective)
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    @jax.jit
    def total(x):
        f = shard_map(lambda s: jax.lax.psum(jnp.sum(s), "obs"),
                      mesh=mesh, in_specs=P("obs"), out_specs=P())
        return f(x)

    x = np.arange(8, dtype=np.float32)
    assert float(jax.device_get(total(x))) == 28.0

    # 2. distributed BA over the global mesh — every process computes
    # the identical replicated camera solution
    from orb_slam2_tpu.parallel import distributed_bundle_adjust

    rng = np.random.default_rng(0)
    K_, P_ = 3, 48
    cams = np.tile(np.eye(4, dtype=np.float32), (K_, 1, 1))
    cams[:, 0, 3] = -0.3 * np.arange(K_)
    pts = rng.uniform([-2, -2, 5], [2, 2, 9], (P_, 3)).astype(np.float32)
    oc = np.repeat(np.arange(K_, dtype=np.int32), P_)
    op = np.tile(np.arange(P_, dtype=np.int32), K_)
    pc = np.einsum("oij,oj->oi", cams[oc][:, :3, :3], pts[op]) \
        + cams[oc][:, :3, 3]
    uv = np.stack([450 * pc[:, 0] / pc[:, 2] + 320,
                   450 * pc[:, 1] / pc[:, 2] + 240], -1).astype(np.float32)
    fixed = np.zeros(K_, bool)
    fixed[0] = True
    res = distributed_bundle_adjust(
        mesh, cams, pts + rng.normal(0, 0.03, pts.shape).astype(np.float32),
        oc, op, uv, np.ones(len(oc), np.float32), np.ones(len(oc), bool),
        fixed, 450.0, 450.0, 320.0, 240.0, iters=3, cg_iters=8)
    cost = float(jax.device_get(res.final_cost))
    assert np.isfinite(cost), cost
    print(f"MULTIHOST_OK pid={pid} devices={n_dev} cost={cost:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
