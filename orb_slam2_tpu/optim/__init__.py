"""Nonlinear least squares on SE3/Sim3 manifolds — replaces g2o
(Thirdparty/g2o, 16k LoC) and src/Optimizer.cc.

- ``reproj``     : batched reprojection residuals + analytic Jacobians
                   (the EdgeSE3ProjectXYZ math).
- ``lm``         : Levenberg-Marquardt helpers (Huber, damping loop).
- ``pose_opt``   : motion-only optimization (upstream ORB-SLAM2's
                   PoseOptimization — deleted in the reference fork but
                   required for the no-pose-prior datasets).
- ``points_opt`` : structure-only LM (the fork's fixed-pose local BA,
                   src/Optimizer.cc:328-637 with fixedPose=true) — P
                   independent damped 3x3 solves.
- ``ba``         : full bundle adjustment with Schur complement and
                   matrix-free PCG on the reduced camera system
                   (Optimizer::BundleAdjustment / GlobalBundleAdjustemnt).
- ``sim3_opt``   : relative Sim3 optimization (Optimizer::OptimizeSim3).
- ``pose_graph`` : essential-graph Sim3 pose-graph LM
                   (Optimizer::OptimizeEssentialGraph).
- ``pnp``        : EPnP + batched RANSAC (src/PnPsolver.cc).
"""
