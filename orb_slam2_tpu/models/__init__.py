"""The map data model (L2 of the reference): frames, keyframes, map
points, covisibility graph, spanning tree, BoW database.

Replaces src/{Frame,KeyFrame,MapPoint,Map,KeyFrameDatabase}.cc.  Design
split: bulk per-feature / per-point data lives in numpy SoA arrays
(moved to device per jitted stage); graph bookkeeping (covisibility,
spanning tree, observation maps) is host-side integer work, exactly the
part of the reference that is pointer-chasing and lock-protected and
has no business on a TPU.
"""
from .frame import Frame, FrameFactory  # noqa: F401
from .mapstore import MapStore  # noqa: F401
