"""Multi-device / multi-host execution: meshes and distributed BA.

The reference has no distributed backend (single-process, 5 threads,
SURVEY.md §2.3); the TPU-native equivalent shards the *observation*
list of bundle adjustment over a jax.sharding.Mesh: every device
assembles Gauss-Newton blocks from its observation shard, psum closes
the segment sums over keyframes/points, and the Schur-reduced PCG runs
replicated (its matvecs are obs-parallel too, riding ICI collectives).
"""
from .dist_ba import distributed_bundle_adjust, make_mesh  # noqa: F401
from .dist_pose_graph import distributed_pose_graph  # noqa: F401
from .multihost import init_multihost, make_global_mesh  # noqa: F401
