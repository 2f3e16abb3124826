"""orb_slam2_tpu — a TPU-native monocular SLAM engine.

A from-scratch re-design of the capabilities of zhangshaos/ORB_SLAM2 (a
heavily modified ORB-SLAM2 fork for monocular imagery with optional
per-frame pose priors) as an idiomatic JAX / XLA / Pallas framework:

- ``geom``     : SE3 / Sim3 Lie groups, pinhole cameras, triangulation,
                 Horn's closed-form Sim3 (replaces Sophus + g2o types +
                 src/Initializer.cc + src/Sim3Solver.cc math).
- ``ops``      : the ORB feature pipeline as batched device kernels —
                 image pyramid, FAST-16, grid top-k distribution,
                 intensity-centroid orientation, Gaussian blur, rBRIEF
                 (replaces src/ORBextractor.cc).
- ``matching`` : Hamming-distance search ops (replaces src/ORBmatcher.cc).
- ``models``   : the map data model — frames, keyframes, map points,
                 covisibility graph, BoW vocabulary + inverted file
                 (replaces src/{Frame,KeyFrame,MapPoint,Map,
                 KeyFrameDatabase}.cc and DBoW2).
- ``optim``    : Levenberg-Marquardt on SE3/Sim3 manifolds with Schur
                 complement — pose optimization, local/global bundle
                 adjustment, Sim3 optimization, essential-graph pose
                 graph, EPnP+RANSAC (replaces g2o + src/Optimizer.cc +
                 src/PnPsolver.cc).
- ``pipeline`` : tracking / local mapping / loop closing stages and the
                 System facade (replaces src/{Tracking,LocalMapping,
                 LoopClosing,System}.cc).
- ``parallel`` : device meshes and distributed bundle adjustment via
                 jax.sharding + collectives.
- ``utils``    : config (TOML/YAML), datasets, PLY export, logging.

Unlike the reference's 5-thread mutex architecture, the pipeline is a
deterministic sequence of functionally pure jitted stages over
fixed-shape device arrays; the map lives as SoA arrays with validity
masks, and graph bookkeeping runs on host.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry / BA math needs true float32 matmuls; kernels that are happy
# with bf16 request it explicitly via `precision=` / dtypes.  Without
# this, TPU matmul defaults to bf16 inputs and SE3/LM solves lose ~3
# decimal digits.
_jax.config.update("jax_default_matmul_precision", "highest")
