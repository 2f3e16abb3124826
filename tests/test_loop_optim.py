"""Tests for Sim3 optimization and the essential-graph pose graph."""
import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from orb_slam2_tpu.geom import sim3, se3
from orb_slam2_tpu.optim import sim3_opt, pose_graph

FX = FY = 500.0
CX, CY = 320.0, 240.0


class TestOptimizeSim3:
    def make_problem(self, seed=0, noise=0.2, n=80):
        rng = np.random.default_rng(seed)
        # true similarity mapping cam2 coords -> cam1 coords
        g_true = sim3.make(
            jnp.asarray(Rotation.from_rotvec([0.05, -0.1, 0.08]).as_matrix().astype(np.float32)),
            jnp.asarray(np.array([0.4, -0.2, 0.3], np.float32)), 1.3)
        pts2 = rng.uniform([-2, -2, 4], [2, 2, 9], (n, 3)).astype(np.float32)
        pts1 = np.asarray(sim3.apply(g_true[None], jnp.asarray(pts2)[None]))[0]

        def proj(p):
            return np.stack([FX * p[:, 0] / p[:, 2] + CX,
                             FY * p[:, 1] / p[:, 2] + CY], -1)

        uv1 = proj(pts1) + rng.normal(0, noise, (n, 2))
        uv2 = proj(pts2) + rng.normal(0, noise, (n, 2))
        return g_true, pts1, pts2, uv1.astype(np.float32), uv2.astype(np.float32)

    def test_converges(self):
        g_true, pts1, pts2, uv1, uv2 = self.make_problem()
        g0 = sim3.compose(sim3.exp(jnp.asarray(
            np.array([0.05, -0.02, 0.04, 0.01, 0.02, -0.01, 0.05], np.float32))), g_true)
        n = len(pts1)
        res = sim3_opt.optimize_sim3(
            g0, jnp.asarray(pts1), jnp.asarray(pts2),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(n), jnp.ones(n), jnp.ones(n, bool),
            FX, FY, CX, CY)
        assert int(res.n_inliers) > 0.9 * n
        err = np.asarray(sim3.log(sim3.compose(res.S12, sim3.inv(g_true))))
        assert np.abs(err).max() < 5e-3, err

    def test_outlier_pruning(self):
        g_true, pts1, pts2, uv1, uv2 = self.make_problem(seed=1)
        n = len(pts1)
        uv1 = uv1.copy()
        uv1[:15] += 40.0  # corrupt 15 matches
        res = sim3_opt.optimize_sim3(
            g_true, jnp.asarray(pts1), jnp.asarray(pts2),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(n), jnp.ones(n), jnp.ones(n, bool),
            FX, FY, CX, CY)
        inl = np.asarray(res.inliers1 & res.inliers2)
        assert inl[:15].sum() == 0
        assert inl[15:].mean() > 0.9
        err = np.asarray(sim3.log(sim3.compose(res.S12, sim3.inv(g_true))))
        assert np.abs(err).max() < 5e-3, err


class TestPoseGraph:
    def test_loop_drift_correction(self):
        """Classic scenario: odometry chain with accumulated drift +
        scale drift, one loop-closure edge back to the start.  The pose
        graph must distribute the error and recover the trajectory."""
        rng = np.random.default_rng(2)
        K = 30
        # ground-truth: circle trajectory
        gt = []
        for i in range(K):
            th = 2 * np.pi * i / K
            R = Rotation.from_euler("z", th).as_matrix().astype(np.float32)
            c = np.array([np.cos(th) * 5, np.sin(th) * 5, 0], np.float32)
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R.T
            T[:3, 3] = -R.T @ c
            gt.append(sim3.from_se3(jnp.asarray(T)))
        gt = jnp.stack(gt)

        # odometry measurements with noise + scale drift
        edges_i, edges_j, meas = [], [], []
        drift = np.float32(1.025)  # 2.5% scale drift per step
        noisy = [gt[0]]
        for i in range(K - 1):
            Sji_true = sim3.compose(gt[i + 1], sim3.inv(gt[i]))
            xi = np.zeros(7, np.float32)
            xi[:6] = rng.normal(0, 0.005, 6)
            xi[6] = np.log(drift)
            Sji_noisy = sim3.compose(sim3.exp(jnp.asarray(xi)), Sji_true)
            edges_i.append(i)
            edges_j.append(i + 1)
            meas.append(Sji_noisy)
            noisy.append(sim3.compose(Sji_noisy, noisy[-1]))
        # loop edge: last keyframe -> first, exact measurement
        edges_i.append(K - 1)
        edges_j.append(0)
        meas.append(sim3.compose(gt[0], sim3.inv(gt[K - 1])))

        sims0 = jnp.stack(noisy)
        fixed = np.zeros(K, bool)
        fixed[0] = True

        # check the drift is actually large before optimization
        drift_before = float(jnp.linalg.norm(
            sim3.trans(sims0[K - 1]) - sim3.trans(gt[K - 1])))
        assert drift_before > 0.5, drift_before

        res = pose_graph.optimize_pose_graph(
            sims0,
            jnp.asarray(np.array(edges_i, np.int32)),
            jnp.asarray(np.array(edges_j, np.int32)),
            jnp.stack(meas),
            jnp.ones(len(meas)),
            jnp.asarray(fixed),
            iters=30, cg_iters=40)

        # after optimization every pose should be close to GT (the exact
        # value is the ML compromise between the noisy odometry edges
        # and the single loop edge, so the bound is the noise floor)
        max_err = 0.0
        for i in range(K):
            e = np.asarray(sim3.log(sim3.compose(res.sims[i], sim3.inv(gt[i]))))
            max_err = max(max_err, np.abs(e).max())
        assert max_err < 0.15, max_err
        assert float(res.final_cost) < 0.05
        # scale recovered ~1 everywhere
        scales = np.asarray(sim3.scale(res.sims))
        assert np.abs(np.log(scales)).max() < 0.05

    def test_fixed_vertex_untouched(self):
        K = 5
        sims0 = jnp.tile(sim3.identity(), (K, 1))
        meas = jnp.tile(sim3.exp(jnp.asarray(
            np.array([1, 0, 0, 0, 0, 0, 0], np.float32))), (K - 1, 1))
        ei = jnp.arange(K - 1, dtype=jnp.int32)
        ej = ei + 1
        fixed = np.zeros(K, bool)
        fixed[0] = True
        res = pose_graph.optimize_pose_graph(
            sims0, ei, ej, meas, jnp.ones(K - 1), jnp.asarray(fixed),
            iters=15, cg_iters=20)
        np.testing.assert_allclose(
            np.asarray(res.sims[0]), np.asarray(sim3.identity()), atol=1e-6)
        # chain should spread out along x
        t = np.asarray(sim3.trans(res.sims))
        assert t[-1, 0] > 3.0
