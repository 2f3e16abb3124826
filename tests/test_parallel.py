"""Distributed BA on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orb_slam2_tpu.geom import se3
from orb_slam2_tpu.optim import ba
from orb_slam2_tpu.parallel import distributed_bundle_adjust, make_mesh

from test_optim import make_scene, FX, FY, CX, CY


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
class TestDistributedBA:
    def test_matches_single_device(self):
        cams, pts, (oc, op, ouv) = make_scene(n_cams=6, n_pts=300, noise=0.2, seed=8)
        rng = np.random.default_rng(9)
        cams0 = cams.copy()
        for c in range(2, len(cams)):
            xi = rng.normal(0, 0.02, 6).astype(np.float32)
            cams0[c] = np.asarray(se3.exp(jnp.asarray(xi))) @ cams[c]
        pts0 = pts + rng.normal(0, 0.1, pts.shape).astype(np.float32)
        fixed = np.zeros(len(cams), bool)
        fixed[:2] = True

        mesh = make_mesh()
        dist = distributed_bundle_adjust(
            mesh, cams0, pts0, oc, op, ouv,
            np.ones(len(oc), np.float32), np.ones(len(oc), bool), fixed,
            FX, FY, CX, CY, iters=10, cg_iters=30)

        single = ba.bundle_adjust(
            jnp.asarray(cams0), jnp.asarray(pts0),
            jnp.asarray(oc), jnp.asarray(op), jnp.asarray(ouv),
            jnp.ones(len(oc)), jnp.ones(len(oc), bool), jnp.asarray(fixed),
            FX, FY, CX, CY, iters=10, cg_iters=30)

        # same problem, same algorithm -> near-identical results
        np.testing.assert_allclose(np.asarray(dist.cam_Tcw),
                                   np.asarray(single.cam_Tcw), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dist.final_cost),
                                   np.asarray(single.final_cost), rtol=1e-3)
        # and the distributed solve actually converged to GT neighborhood
        for c in range(2, len(cams)):
            err = np.asarray(se3.log(jnp.asarray(cams[c]) @ se3.inv(dist.cam_Tcw[c])))
            assert np.abs(err).max() < 2e-2

    def test_uneven_obs_padding(self):
        cams, pts, (oc, op, ouv) = make_scene(n_cams=3, n_pts=50, noise=0.1, seed=10)
        # deliberately odd observation count
        n = (len(oc) // 8) * 8 + 3
        oc, op, ouv = oc[:n], op[:n], ouv[:n]
        fixed = np.zeros(len(cams), bool)
        fixed[0] = True
        mesh = make_mesh()
        res = distributed_bundle_adjust(
            mesh, cams, pts, oc, op, ouv,
            np.ones(n, np.float32), np.ones(n, bool), fixed,
            FX, FY, CX, CY, iters=3, cg_iters=10)
        assert res.obs_inlier.shape == (n,)
        assert np.isfinite(float(res.final_cost))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
class TestDistributedPoseGraph:
    def test_matches_single_device(self):
        """Edge-sharded essential-graph solve == single-device solve."""
        from scipy.spatial.transform import Rotation
        from orb_slam2_tpu.geom import sim3
        from orb_slam2_tpu.optim import pose_graph
        from orb_slam2_tpu.parallel import distributed_pose_graph

        rng = np.random.default_rng(2)
        K = 30
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

        edges_i, edges_j, meas = [], [], []
        noisy = [gt[0]]
        for i in range(K - 1):
            Sji_true = sim3.compose(gt[i + 1], sim3.inv(gt[i]))
            xi = np.zeros(7, np.float32)
            xi[:6] = rng.normal(0, 0.005, 6)
            xi[6] = np.log(1.025)
            Sji_noisy = sim3.compose(sim3.exp(jnp.asarray(xi)), Sji_true)
            edges_i.append(i)
            edges_j.append(i + 1)
            meas.append(Sji_noisy)
            noisy.append(sim3.compose(Sji_noisy, noisy[-1]))
        edges_i.append(K - 1)
        edges_j.append(0)
        meas.append(sim3.compose(gt[0], sim3.inv(gt[K - 1])))

        sims0 = np.asarray(jnp.stack(noisy))
        fixed = np.zeros(K, bool)
        fixed[0] = True
        ei = np.array(edges_i, np.int32)
        ej = np.array(edges_j, np.int32)
        em = np.asarray(jnp.stack(meas))
        ew = np.ones(len(meas), np.float32)

        mesh = make_mesh()
        dist = distributed_pose_graph(mesh, sims0, ei, ej, em, ew, fixed,
                                      iters=30, cg_iters=40)
        single = pose_graph.optimize_pose_graph(
            jnp.asarray(sims0), jnp.asarray(ei), jnp.asarray(ej),
            jnp.asarray(em), jnp.asarray(ew), jnp.asarray(fixed),
            iters=30, cg_iters=40)
        np.testing.assert_allclose(np.asarray(dist.sims),
                                   np.asarray(single.sims), atol=2e-4)
        np.testing.assert_allclose(float(dist.final_cost),
                                   float(single.final_cost), rtol=1e-3,
                                   atol=1e-5)
        # and it genuinely corrected the drift
        from orb_slam2_tpu.geom import sim3 as s3
        err = np.asarray(s3.log(s3.compose(
            dist.sims[K - 1], s3.inv(gt[K - 1]))))
        assert np.abs(err).max() < 0.15


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
class TestShardedPointsBA:
    """Memory-scaling GBA (BASELINE config 4): point state + Hpp blocks
    sharded over the mesh, cameras replicated, observations colocated
    with their point's shard."""

    def test_matches_single_device(self):
        from orb_slam2_tpu.parallel.dist_ba import (
            distributed_bundle_adjust_sharded_points)
        cams, pts, (oc, op, ouv) = make_scene(n_cams=6, n_pts=300,
                                              noise=0.2, seed=8)
        rng = np.random.default_rng(9)
        cams0 = cams.copy()
        for c in range(2, len(cams)):
            xi = rng.normal(0, 0.02, 6).astype(np.float32)
            cams0[c] = np.asarray(se3.exp(jnp.asarray(xi))) @ cams[c]
        pts0 = pts + rng.normal(0, 0.1, pts.shape).astype(np.float32)
        fixed = np.zeros(len(cams), bool)
        fixed[:2] = True

        mesh = make_mesh()
        dist = distributed_bundle_adjust_sharded_points(
            mesh, cams0, pts0, oc, op, ouv,
            np.ones(len(oc), np.float32), np.ones(len(oc), bool), fixed,
            FX, FY, CX, CY, iters=10, cg_iters=30)

        single = ba.bundle_adjust(
            jnp.asarray(cams0), jnp.asarray(pts0),
            jnp.asarray(oc), jnp.asarray(op), jnp.asarray(ouv),
            jnp.ones(len(oc)), jnp.ones(len(oc), bool), jnp.asarray(fixed),
            FX, FY, CX, CY, iters=10, cg_iters=30)

        np.testing.assert_allclose(np.asarray(dist.cam_Tcw),
                                   np.asarray(single.cam_Tcw), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dist.points),
                                   np.asarray(single.points), atol=2e-3)
        np.testing.assert_allclose(np.asarray(dist.obs_inlier),
                                   np.asarray(single.obs_inlier))
        np.testing.assert_allclose(np.asarray(dist.final_cost),
                                   np.asarray(single.final_cost), rtol=1e-3)

    def test_point_state_is_actually_sharded(self):
        """Every device's addressable point shard is ~P/n_dev — the
        memory-scaling property (no device holds the full point set)."""
        from orb_slam2_tpu.parallel.dist_ba import shard_points_problem
        rng = np.random.default_rng(0)
        P, O, n_dev = 1000, 8000, 8
        pts = rng.normal(0, 1, (P, 3)).astype(np.float32)
        op = rng.integers(0, P, O).astype(np.int32)
        oc = rng.integers(0, 5, O).astype(np.int32)
        ouv = rng.normal(0, 1, (O, 2)).astype(np.float32)
        (pts_f, ocam_f, opt_f, ouv_f, osig_f, ovalid_f, pt_map,
         obs_slot, Pmax) = shard_points_problem(
            pts, oc, op, ouv, np.ones(O, np.float32), np.ones(O, bool),
            n_dev)
        # per-device shard is a balanced fraction, not the whole set
        assert Pmax < P // n_dev + P // (2 * n_dev) + 2
        assert pts_f.shape[0] == n_dev * Pmax
        # every observation's point is colocated with its shard
        d_of_slot = obs_slot // (len(ocam_f) // n_dev)
        for d in range(n_dev):
            rows = pt_map.reshape(n_dev, Pmax)[d]
            rows = set(rows[rows >= 0].tolist())
            sel = np.where(d_of_slot == d)[0]
            assert set(op[sel].tolist()) <= rows
