"""Geometry core: Lie groups, cameras, triangulation, closed-form solvers.

Replaces the reference's Sophus (Thirdparty/Sophus), g2o se3quat/sim3
types (Thirdparty/g2o/g2o/types/{se3quat,sim3}.h), Converter
(src/Converter.cc), the DLT triangulation of src/Initializer.cc:56-105,
and the Horn closed-form Sim3 of src/Sim3Solver.cc:327-453.

All functions are pure jnp, batched over leading axes, float32.
"""
from . import se3, sim3, camera, triangulate, horn  # noqa: F401
