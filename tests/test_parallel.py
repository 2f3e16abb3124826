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
