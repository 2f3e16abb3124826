"""Device kernels for the ORB feature pipeline.

Replaces src/ORBextractor.cc (1.4k LoC of sequential C++) with batched
XLA/Pallas compute over fixed shapes:

- ``pyramid``     : image pyramid (ComputePyramid, ORBextractor.cc:1345).
- ``fast``        : FAST-9/16 score map + NMS + dual-threshold cells
                    (ComputeKeyPointsOctTree, ORBextractor.cc:1040-1198).
- ``distribute``  : spatially-uniform top-N selection, the functional
                    equivalent of DistributeOctTree (ORBextractor.cc:690).
- ``orientation`` : intensity-centroid angle (IC_Angle, ORBextractor.cc:96).
- ``brief``       : steered 256-bit BRIEF descriptors packed to uint32[8]
                    (computeOrbDescriptor, ORBextractor.cc:155-207).
- ``extractor``   : the fused end-to-end extractor (operator(),
                    ORBextractor.cc:1223-1340).
"""
