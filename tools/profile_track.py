import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import jax
print("platform:", jax.devices()[0], flush=True)

from orb_slam2_tpu.geom.camera import Intrinsics
from orb_slam2_tpu.ops.extractor import OrbParams
from orb_slam2_tpu.pipeline import SlamConfig, System, TrackState
from orb_slam2_tpu.utils import synth

cam = Intrinsics(fx=960.0, fy=960.0, cx=960.0, cy=720.0, width=1920, height=1440)
cfg = SlamConfig(cam=cam, orb=OrbParams(n_features=4000, n_levels=8, scale_factor=1.2),
                 fps=10.0, pose_prior=True, init_min_matches=80,
                 init_min_triangulated=50, init_min_tracked_after_ba=80)
world = synth.make_world(seed=7, tex_size=4096, scale=120.0)
poses = synth.aerial_trajectory(16, height=12.0, speed=0.5)
frames = [synth.render(world, cam, T) for T in poses]
sys_ = System(cfg, enable_loop_closing=False)
for i in range(10):
    t0=time.perf_counter()
    sys_.track_monocular_with_pose(frames[i], i*0.1, poses[i])
    print(f"warm {i}: {time.perf_counter()-t0:.1f}s {sys_.state.name}", flush=True)

# --- stage timing ---
import jax.numpy as jnp
tr = sys_.tracker
fac = sys_.factory

# extraction alone
img = frames[10]
t0=time.perf_counter()
for _ in range(5):
    f = fac.make(img, 0.0, Tcw=poses[10], init_mode=False)
print(f"extract+transfer per frame: {(time.perf_counter()-t0)/5*1000:.0f} ms", flush=True)

# pure device extract (no host conversion)
pipe = fac._pipeline(1440, 1920, False)
jimg = jnp.asarray(img)
feats, und = pipe(jimg); feats.xy.block_until_ready()
t0=time.perf_counter()
for _ in range(5):
    feats, und = pipe(jimg)
    und.block_until_ready()
print(f"extract device-only: {(time.perf_counter()-t0)/5*1000:.0f} ms", flush=True)

# full track step (frame 11-15)
import cProfile, pstats
t0=time.perf_counter()
sys_.track_monocular_with_pose(frames[11], 1.1, poses[11])
print(f"track frame 11: {time.perf_counter()-t0:.2f}s", flush=True)

pr = cProfile.Profile()
pr.enable()
for i in (12, 13, 14):
    sys_.track_monocular_with_pose(frames[i], i*0.1, poses[i])
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative")
st.print_stats(22)
