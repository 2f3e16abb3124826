"""Chip microbench of the per-frame critical path with FORCED
completion (block_until_ready through the axon tunnel acks dispatch
only — every measurement here ends in a device_get).

Measures, at bench shapes with real pipeline state:
  rt                      tunnel round trip
  extract                 extractor compute (+rt)
  fused                   _track_prior_step compute (+rt)
  frame-serial            fused(t) + extract(t+1) + full 46 KB read —
                          the actual per-frame device+tunnel budget
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

f_tiny = jax.jit(lambda x: x + 1.0)
jax.device_get(f_tiny(jnp.zeros(8)))
t0 = time.perf_counter()
for _ in range(10):
    jax.device_get(f_tiny(jnp.zeros(8)))
RT = 100.0 * (time.perf_counter() - t0)
print(f"tunnel rt: {RT:.1f} ms", flush=True)


def bench(label, fn, n=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    per = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:40s} {per:8.1f} ms  (net ~{per-RT:6.1f})", flush=True)


# extract: dispatch + force first desc element
def do_extract():
    st = fac.start(frames[21])
    jax.device_get(st[0].desc.ravel()[:1])

bench("extract (+rt)", do_extract)

# fused step with real prep
frame = fac.make(frames[21], 2.1, Tcw=poses[21], init_mode=False)
tr._prepare_next(tr.last_frame)

def do_fused():
    out = tr._fused_dispatch(frame)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])

bench("fused step (+rt)", do_fused)

# host dispatch cost alone
t0 = time.perf_counter()
for _ in range(10):
    out = tr._fused_dispatch(frame)
print(f"fused dispatch host-only: {(time.perf_counter()-t0)*100:.1f} ms",
      flush=True)

# the real frame: fused(t) dispatch, extract(t+1) dispatch, read all
# of fused's outputs (46 KB)
def do_frame():
    out = tr._fused_dispatch(frame)
    st = fac.start(frames[22])
    jax.device_get(out)

bench("frame-serial: fused+extract+46KB read", do_frame)

# reversed order read (no extract in between)
def do_frame2():
    out = tr._fused_dispatch(frame)
    jax.device_get(out)

bench("fused + 46KB read (no extract)", do_frame2)
sys_.shutdown()
