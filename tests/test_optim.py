"""Tests for the LM optimizers against synthetic ground truth."""
import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from orb_slam2_tpu.geom import se3
from orb_slam2_tpu.optim import pose_opt, points_opt, ba

FX = FY = 500.0
CX, CY = 320.0, 240.0


def project_np(Tcw, X):
    pc = (Tcw[:3, :3] @ X.T).T + Tcw[:3, 3]
    return np.stack([FX * pc[:, 0] / pc[:, 2] + CX,
                     FY * pc[:, 1] / pc[:, 2] + CY], -1), pc[:, 2]


def make_scene(n_cams=6, n_pts=300, seed=0, noise=0.3):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-3, -3, 6], [3, 3, 14], size=(n_pts, 3)).astype(np.float32)
    cams = []
    for i in range(n_cams):
        rv = rng.normal(0, 0.03, 3)
        R = Rotation.from_rotvec(rv).as_matrix()
        t = np.array([-0.4 * i, 0.02 * i, 0.01 * i])
        T = np.eye(4, dtype=np.float32)
        T[:3, :3], T[:3, 3] = R, t
        cams.append(T)
    cams = np.stack(cams)
    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(n_cams):
        uv, z = project_np(cams[c], pts)
        vis = (z > 0) & (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        idx = np.where(vis)[0]
        obs_cam.extend([c] * len(idx))
        obs_pt.extend(idx.tolist())
        obs_uv.extend((uv[idx] + rng.normal(0, noise, (len(idx), 2))).tolist())
    return cams, pts, (np.array(obs_cam, np.int32), np.array(obs_pt, np.int32),
                       np.array(obs_uv, np.float32))


class TestPoseOpt:
    def test_converges_from_perturbed(self):
        cams, pts, (oc, op, ouv) = make_scene(n_cams=1, noise=0.2)
        uv = ouv[oc == 0]
        X = pts[op[oc == 0]]
        xi = np.array([0.08, -0.05, 0.1, 0.02, -0.015, 0.01], np.float32)
        T0 = np.asarray(se3.exp(jnp.asarray(xi))) @ cams[0]
        res = pose_opt.optimize_pose(
            jnp.asarray(T0), jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(len(X)), jnp.ones(len(X), bool), FX, FY, CX, CY)
        err = np.asarray(se3.log(jnp.asarray(cams[0]) @ se3.inv(res.Tcw)))
        assert np.abs(err).max() < 2e-3, err
        assert int(res.n_inliers) > 0.95 * len(X)

    def test_rejects_outliers(self):
        cams, pts, (oc, op, ouv) = make_scene(n_cams=1, noise=0.2, seed=1)
        uv = ouv[oc == 0].copy()
        X = pts[op[oc == 0]]
        n_out = len(uv) // 5
        uv[:n_out] += 40.0  # gross outliers
        xi = np.array([0.05, 0.02, -0.04, 0.01, 0.01, -0.01], np.float32)
        T0 = np.asarray(se3.exp(jnp.asarray(xi))) @ cams[0]
        res = pose_opt.optimize_pose(
            jnp.asarray(T0), jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(len(X)), jnp.ones(len(X), bool), FX, FY, CX, CY)
        err = np.asarray(se3.log(jnp.asarray(cams[0]) @ se3.inv(res.Tcw)))
        assert np.abs(err).max() < 5e-3, err
        inl = np.asarray(res.inliers)
        assert inl[:n_out].mean() < 0.1
        assert inl[n_out:].mean() > 0.9


class TestPointsOpt:
    def test_structure_only_convergence(self):
        cams, pts, (oc, op, ouv) = make_scene(noise=0.2, seed=2)
        rng = np.random.default_rng(3)
        pts0 = pts + rng.normal(0, 0.15, pts.shape).astype(np.float32)
        res = points_opt.optimize_points(
            jnp.asarray(pts0), jnp.asarray(op), jnp.asarray(cams[oc]),
            jnp.asarray(ouv), jnp.ones(len(oc)), jnp.ones(len(oc), bool),
            FX, FY, CX, CY, iters=15)
        err = np.linalg.norm(np.asarray(res.points) - pts, axis=-1)
        assert np.median(err) < 0.02, np.median(err)
        assert np.asarray(res.obs_inlier).mean() > 0.9

    def test_chunked_matches_single_call(self):
        """Chunked LM (lam threaded between calls, as run_structure_ba
        dispatches it) converges like one long call — the one-assemble
        LM carries H/g inside a dispatch only, so chunk boundaries
        re-linearize; the result must still land on the same optimum."""
        cams, pts, (oc, op, ouv) = make_scene(noise=0.2, seed=6)
        rng = np.random.default_rng(7)
        pts0 = pts + rng.normal(0, 0.15, pts.shape).astype(np.float32)
        res_one = points_opt.optimize_points(
            jnp.asarray(pts0), jnp.asarray(op), jnp.asarray(cams[oc]),
            jnp.asarray(ouv), jnp.ones(len(oc)), jnp.ones(len(oc), bool),
            FX, FY, CX, CY, iters=10)
        p = jnp.asarray(pts0)
        lam = jnp.full((len(pts),), 1e-3)
        for it in (5, 5):
            r = points_opt.optimize_points(
                p, jnp.asarray(op), jnp.asarray(cams[oc]),
                jnp.asarray(ouv), jnp.ones(len(oc)), jnp.ones(len(oc), bool),
                FX, FY, CX, CY, iters=it, lam0=lam)
            p, lam = r.points, r.lam
        d = np.linalg.norm(np.asarray(p) - np.asarray(res_one.points), axis=-1)
        assert np.median(d) < 5e-3, np.median(d)
        err = np.linalg.norm(np.asarray(p) - pts, axis=-1)
        assert np.median(err) < 0.02, np.median(err)


class TestBundleAdjust:
    def test_full_ba_convergence(self):
        cams, pts, (oc, op, ouv) = make_scene(n_cams=6, n_pts=300, noise=0.2, seed=4)
        rng = np.random.default_rng(5)
        cams0 = cams.copy()
        for c in range(2, len(cams)):  # perturb all but the 2 fixed ones
            xi = rng.normal(0, 0.02, 6).astype(np.float32)
            cams0[c] = np.asarray(se3.exp(jnp.asarray(xi))) @ cams[c]
        pts0 = pts + rng.normal(0, 0.1, pts.shape).astype(np.float32)
        fixed = np.zeros(len(cams), bool)
        fixed[:2] = True
        res = ba.bundle_adjust(
            jnp.asarray(cams0), jnp.asarray(pts0),
            jnp.asarray(oc), jnp.asarray(op), jnp.asarray(ouv),
            jnp.ones(len(oc)), jnp.ones(len(oc), bool), jnp.asarray(fixed),
            FX, FY, CX, CY, iters=15, cg_iters=30)
        # fixed cams untouched
        np.testing.assert_allclose(np.asarray(res.cam_Tcw)[:2], cams[:2], atol=1e-6)
        # free cams recovered (up to the ML deviation allowed by noise)
        for c in range(2, len(cams)):
            err = np.asarray(se3.log(jnp.asarray(cams[c]) @ se3.inv(res.cam_Tcw[c])))
            assert np.abs(err).max() < 2e-2, (c, err)
        # true convergence check: cost at solution <= cost at ground truth
        gt = ba.bundle_adjust(
            jnp.asarray(cams), jnp.asarray(pts),
            jnp.asarray(oc), jnp.asarray(op), jnp.asarray(ouv),
            jnp.ones(len(oc)), jnp.ones(len(oc), bool),
            jnp.asarray(np.ones(len(cams), bool)),
            FX, FY, CX, CY, iters=1, cg_iters=1)
        assert float(res.final_cost) <= float(gt.final_cost) * 1.001
        perr = np.linalg.norm(np.asarray(res.points) - pts, axis=-1)
        assert np.median(perr) < 0.02, np.median(perr)
        assert np.asarray(res.obs_inlier).mean() > 0.95

    def test_ba_reduces_cost_with_outliers(self):
        cams, pts, (oc, op, ouv) = make_scene(n_cams=4, n_pts=200, noise=0.3, seed=6)
        ouv = ouv.copy()
        rng = np.random.default_rng(7)
        # corrupt scattered observations, at most one per point, so the
        # corruption is a genuine outlier (not a consistent re-position)
        seen = set()
        bad = []
        for i in rng.permutation(len(ouv)):
            p = int(op[i])
            if p not in seen:
                seen.add(p)
                bad.append(i)
            if len(bad) >= len(ouv) // 10:
                break
        bad = np.array(bad)
        ouv[bad] += rng.normal(25, 5, (len(bad), 2))
        pts0 = pts + rng.normal(0, 0.1, pts.shape).astype(np.float32)
        fixed = np.zeros(len(cams), bool)
        fixed[0] = True
        res = ba.bundle_adjust(
            jnp.asarray(cams), jnp.asarray(pts0),
            jnp.asarray(oc), jnp.asarray(op), jnp.asarray(ouv),
            jnp.ones(len(oc)), jnp.ones(len(oc), bool), jnp.asarray(fixed),
            FX, FY, CX, CY, iters=10, cg_iters=20)
        inl = np.asarray(res.obs_inlier)
        assert inl[bad].mean() < 0.25     # outliers rejected
        good = np.ones(len(inl), bool)
        good[bad] = False
        assert inl[good].mean() > 0.85
