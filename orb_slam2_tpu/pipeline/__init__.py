"""The SLAM pipeline: tracking, local mapping, loop closing, system.

Replaces src/{Tracking,LocalMapping,LoopClosing,System}.cc.  The
reference runs these as 4 threads over a mutex-guarded map; here they
are deterministic sequential stages over the MapStore, each stage
dispatching its heavy compute as jitted device functions.  Determinism
is a feature the reference cannot offer (its results depend on thread
scheduling); throughput comes from the device kernels, not from
host-thread overlap.
"""
from .config import SlamConfig  # noqa: F401
from .system import System, TrackState  # noqa: F401
