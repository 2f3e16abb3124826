"""Chip microbench of the steady-state tracking critical path.

Splits the ~81 ms bench frame period into:
  (a) extractor device compute (1920x1440, 8 levels, 4000 features)
  (b) fused tracking step device compute (_track_prior_step at bench
      shapes: L=4096 bound, C=16384 candidates)
  (c) output transfer (device_get of the step's outputs)
so the next optimization targets the real limiter (the pipelined read
costs 51 ms/frame at consume time even though a background reader
overlaps it — is that transfer wait or device compute?).
"""
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

from orb_slam2_tpu.geom.camera import Intrinsics
from orb_slam2_tpu.ops.extractor import OrbParams
from orb_slam2_tpu.pipeline import SlamConfig, System
from orb_slam2_tpu.utils import synth


def bench(label, fn, n=5):
    fn()  # ensure compiled
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{label:40s} {(time.perf_counter()-t0)/n*1e3:8.1f} ms",
          flush=True)
    return out


cam = Intrinsics(fx=960.0, fy=960.0, cx=960.0, cy=720.0,
                 width=1920, height=1440)
cfg = SlamConfig(cam=cam,
                 orb=OrbParams(n_features=4000, n_levels=8,
                               scale_factor=1.2),
                 fps=10.0, pose_prior=True, init_min_matches=80,
                 init_min_triangulated=50, init_min_tracked_after_ba=80,
                 pad_min_bound=4096, pad_min_cand=16384,
                 pad_min_obs=65536, pad_min_pts=16384,
                 device_point_capacity=262144)
world = synth.make_world(seed=7, tex_size=4096, scale=120.0,
                         tex_shape=(3072, 10240),
                         origin_px=(1560.0, 1536.0))
poses = synth.aerial_trajectory(24, height=12.0, speed=0.5)
frames = [jax.device_put(np.clip(synth.render(world, cam, T), 0, 255)
                         .astype(np.uint8)) for T in poses]
sys_ = System(cfg, enable_loop_closing=False, async_mapping=False)
for i in range(20):
    t0 = time.perf_counter()
    sys_.track_monocular_with_pose(frames[i], i * 0.1, poses[i])
    sys_.flush_mapping()
    print(f"warm {i}: {time.perf_counter()-t0:.1f}s {sys_.state.name}",
          flush=True)

tr = sys_.tracker
fac = sys_.factory

# (a) extractor device compute only (image already in HBM)
ex_fn = fac._extract_fn if hasattr(fac, "_extract_fn") else None
f20 = fac.make(frames[20], 2.0, Tcw=poses[20], init_mode=False)
bench("extract (dispatch+block)",
      lambda: jax.block_until_ready(
          fac.make(frames[21], 2.1, Tcw=poses[21],
                   init_mode=False).dev("desc")))

# (b) fused step compute at real prep state
frame = fac.make(frames[21], 2.1, Tcw=poses[21], init_mode=False)
tr._prepare_next(tr.last_frame)
out = tr._fused_dispatch(frame)
jax.block_until_ready(out)
bench("fused step (dispatch+block)",
      lambda: jax.block_until_ready(tr._fused_dispatch(frame)))

# (c) transfer of the outputs alone
bench("device_get(outputs)", lambda: jax.device_get(out))

# (d) dispatch + read, serialized (the non-overlapped critical path)
bench("fused step + device_get",
      lambda: jax.device_get(tr._fused_dispatch(frame)))

sizes = [int(np.prod(o.shape)) * o.dtype.itemsize for o in out]
print("output bytes:", sizes, "total", sum(sizes), flush=True)
sys_.shutdown()
