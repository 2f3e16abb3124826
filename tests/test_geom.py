"""Unit tests for the geometry core against numpy/scipy oracles."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from orb_slam2_tpu.geom import se3, sim3, camera, triangulate, horn


def rand_rotvecs(n, rng, max_angle=np.pi - 0.05):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    ang = rng.uniform(1e-6, max_angle, size=(n, 1))
    return (v * ang).astype(np.float32)


class TestSO3:
    def test_exp_matches_scipy(self):
        rng = np.random.default_rng(0)
        w = rand_rotvecs(64, rng)
        R = np.asarray(se3.so3_exp(jnp.asarray(w)))
        R_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_log_roundtrip(self):
        rng = np.random.default_rng(1)
        w = rand_rotvecs(64, rng)
        w2 = np.asarray(se3.so3_log(se3.so3_exp(jnp.asarray(w))))
        np.testing.assert_allclose(w2, w, atol=2e-4)

    def test_log_small_angle(self):
        w = np.array([[1e-7, -2e-7, 3e-8], [0, 0, 0]], dtype=np.float32)
        w2 = np.asarray(se3.so3_log(se3.so3_exp(jnp.asarray(w))))
        np.testing.assert_allclose(w2, w, atol=1e-6)

    def test_log_near_pi(self):
        rng = np.random.default_rng(2)
        w = rand_rotvecs(32, rng)
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * (np.pi - 1e-4)
        R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
        w2 = np.asarray(se3.so3_log(jnp.asarray(R)))
        R2 = Rotation.from_rotvec(w2).as_matrix()
        np.testing.assert_allclose(R2, R, atol=1e-3)

    def test_quat_roundtrip(self):
        rng = np.random.default_rng(3)
        w = rand_rotvecs(64, rng)
        R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
        q = np.asarray(se3.rot_to_quat(jnp.asarray(R)))
        q_ref = Rotation.from_matrix(R).as_quat()  # xyzw, same order
        # quaternions are sign-ambiguous
        sign = np.sign(np.sum(q * q_ref, axis=-1, keepdims=True))
        np.testing.assert_allclose(q * sign, q_ref, atol=1e-5)
        R2 = np.asarray(se3.quat_to_rot(jnp.asarray(q)))
        np.testing.assert_allclose(R2, R, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(4)
        xi = np.concatenate(
            [rng.normal(size=(64, 3)).astype(np.float32),
             rand_rotvecs(64, rng, max_angle=3.0)], axis=-1)
        T = se3.exp(jnp.asarray(xi))
        xi2 = np.asarray(se3.log(T))
        np.testing.assert_allclose(xi2, xi, atol=3e-4)

    def test_inverse_compose(self):
        rng = np.random.default_rng(5)
        xi = rng.normal(size=(16, 6)).astype(np.float32)
        T = se3.exp(jnp.asarray(xi))
        eye = np.asarray(se3.compose(T, se3.inv(T)))
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-5)

    def test_transform_matches_matmul(self):
        rng = np.random.default_rng(6)
        xi = rng.normal(size=(6,)).astype(np.float32)
        T = np.asarray(se3.exp(jnp.asarray(xi)))
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        out = np.asarray(se3.transform_points(jnp.asarray(T), jnp.asarray(pts)))
        ref = (T[:3, :3] @ pts.T).T + T[:3, 3]
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestSim3:
    def test_compose_apply(self):
        rng = np.random.default_rng(7)
        xi = rng.normal(size=(8, 7)).astype(np.float32) * 0.5
        g1 = sim3.exp(jnp.asarray(xi))
        g2 = sim3.exp(jnp.asarray(rng.normal(size=(8, 7)).astype(np.float32) * 0.5))
        pts = jnp.asarray(rng.normal(size=(8, 5, 3)).astype(np.float32))
        lhs = sim3.apply(sim3.compose(g1, g2), pts)
        rhs = sim3.apply(g1, sim3.apply(g2, pts))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)

    def test_inverse(self):
        rng = np.random.default_rng(8)
        xi = rng.normal(size=(8, 7)).astype(np.float32) * 0.5
        g = sim3.exp(jnp.asarray(xi))
        gi = sim3.inv(g)
        pts = jnp.asarray(rng.normal(size=(8, 5, 3)).astype(np.float32))
        back = sim3.apply(gi, sim3.apply(g, pts))
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)

    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(9)
        xi = rng.normal(size=(32, 7)).astype(np.float32) * 0.7
        xi2 = np.asarray(sim3.log(sim3.exp(jnp.asarray(xi))))
        np.testing.assert_allclose(xi2, xi, atol=1e-3)

    def test_exp_zero_is_identity(self):
        g = sim3.exp(jnp.zeros((7,)))
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(sim3.identity()), atol=1e-6)

    def test_to_se3_scale_fold(self):
        rng = np.random.default_rng(10)
        R = Rotation.random(1, random_state=0).as_matrix().astype(np.float32)[0]
        t = rng.normal(size=(3,)).astype(np.float32)
        g = sim3.make(jnp.asarray(R), jnp.asarray(t), 2.0)
        T = np.asarray(sim3.to_se3(g))
        np.testing.assert_allclose(T[:3, :3], R, atol=1e-5)
        np.testing.assert_allclose(T[:3, 3], t / 2.0, atol=1e-5)


class TestCamera:
    CAM = camera.Intrinsics(fx=520.9, fy=521.0, cx=325.1, cy=249.7,
                            dist=(0.2312, -0.7849, -0.0033, -0.0001, 0.9172),
                            width=640, height=480)

    def test_project_unproject(self):
        rng = np.random.default_rng(11)
        uv = rng.uniform([50, 50], [600, 430], size=(100, 2)).astype(np.float32)
        depth = rng.uniform(0.5, 5.0, size=(100,)).astype(np.float32)
        pts = camera.unproject(self.CAM, jnp.asarray(uv), jnp.asarray(depth))
        uv2 = np.asarray(camera.project(self.CAM, pts))
        np.testing.assert_allclose(uv2, uv, atol=1e-3)

    def test_undistort_matches_opencv(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(12)
        uv = rng.uniform([100, 100], [540, 380], size=(200, 2)).astype(np.float32)
        ours = np.asarray(camera.undistort_points(self.CAM, jnp.asarray(uv), iters=20))
        K = np.asarray(self.CAM.K)
        D = np.asarray(self.CAM.dist, dtype=np.float32)
        ref = cv2.undistortPoints(uv.reshape(-1, 1, 2), K, D, P=K).reshape(-1, 2)
        np.testing.assert_allclose(ours, ref, atol=0.1)


class TestTriangulate:
    def make_two_view(self, rng, n=200, noise=0.0):
        K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
        pts = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n, 3)).astype(np.float32)
        T1 = np.eye(4, dtype=np.float32)
        rv = np.array([0.02, -0.03, 0.01], np.float32)
        R2 = Rotation.from_rotvec(rv).as_matrix().astype(np.float32)
        t2 = np.array([-1.0, 0.1, 0.05], np.float32)
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, :3], T2[:3, 3] = R2, t2

        def proj(T):
            pc = (T[:3, :3] @ pts.T).T + T[:3, 3]
            uv = (K @ pc.T).T
            return (uv[:, :2] / uv[:, 2:3]).astype(np.float32)

        uv1 = proj(T1) + noise * rng.normal(size=(n, 2)).astype(np.float32)
        uv2 = proj(T2) + noise * rng.normal(size=(n, 2)).astype(np.float32)
        return K, T1, T2, pts, uv1, uv2

    def test_dlt_exact(self):
        rng = np.random.default_rng(13)
        K, T1, T2, pts, uv1, uv2 = self.make_two_view(rng)
        P1 = triangulate.projection_matrix(jnp.asarray(K), jnp.asarray(T1))
        P2 = triangulate.projection_matrix(jnp.asarray(K), jnp.asarray(T2))
        X = np.asarray(triangulate.triangulate_dlt(
            P1, P2, jnp.asarray(uv1), jnp.asarray(uv2)))
        np.testing.assert_allclose(X, pts, atol=2e-2, rtol=1e-3)

    def test_gates(self):
        rng = np.random.default_rng(14)
        K, T1, T2, pts, uv1, uv2 = self.make_two_view(rng, n=100)
        P1 = triangulate.projection_matrix(jnp.asarray(K), jnp.asarray(T1))
        P2 = triangulate.projection_matrix(jnp.asarray(K), jnp.asarray(T2))
        X = triangulate.triangulate_dlt(P1, P2, jnp.asarray(uv1), jnp.asarray(uv2))
        sig = jnp.ones((100,), jnp.float32)
        chk = triangulate.check_triangulation(
            X, jnp.asarray(T1), jnp.asarray(T2), jnp.asarray(uv1),
            jnp.asarray(uv2), 500.0, 500.0, 320.0, 240.0, sig, sig)
        assert np.asarray(chk.good).mean() > 0.95
        # corrupt half the matches -> those points must fail the gates
        uv2_bad = uv2.copy()
        uv2_bad[:50] += 50.0
        Xb = triangulate.triangulate_dlt(P1, P2, jnp.asarray(uv1), jnp.asarray(uv2_bad))
        chk_b = triangulate.check_triangulation(
            Xb, jnp.asarray(T1), jnp.asarray(T2), jnp.asarray(uv1),
            jnp.asarray(uv2_bad), 500.0, 500.0, 320.0, 240.0, sig, sig)
        good_b = np.asarray(chk_b.good)
        assert good_b[:50].mean() < 0.1
        assert good_b[50:].mean() > 0.9


class TestHorn:
    def test_recovers_similarity(self):
        rng = np.random.default_rng(15)
        R = Rotation.random(random_state=1).as_matrix().astype(np.float32)
        t = rng.normal(size=(3,)).astype(np.float32)
        s = 1.7
        p2 = rng.normal(size=(30, 3)).astype(np.float32)
        p1 = (s * (R @ p2.T)).T + t
        g = horn.horn_sim3(jnp.asarray(p1), jnp.asarray(p2))
        np.testing.assert_allclose(float(sim3.scale(g)), s, atol=1e-3)
        np.testing.assert_allclose(np.asarray(sim3.rot(g)), R, atol=1e-3)
        np.testing.assert_allclose(np.asarray(sim3.trans(g)), t, atol=5e-3)

    def test_batched_minimal_sets(self):
        rng = np.random.default_rng(16)
        R = Rotation.random(random_state=2).as_matrix().astype(np.float32)
        t = np.array([0.3, -0.2, 0.9], np.float32)
        s = 0.8
        p2 = rng.normal(size=(64, 3, 3)).astype(np.float32)  # 64 hypotheses, 3 pts
        p1 = (s * np.einsum("ij,bnj->bni", R, p2)) + t
        g = horn.horn_sim3(jnp.asarray(p1), jnp.asarray(p2))
        err = np.asarray(sim3.apply(g, jnp.asarray(p2))) - p1
        assert np.abs(err).max() < 1e-3

    def test_weights_ignore_outliers(self):
        rng = np.random.default_rng(17)
        R = Rotation.random(random_state=3).as_matrix().astype(np.float32)
        t = np.zeros(3, np.float32)
        p2 = rng.normal(size=(20, 3)).astype(np.float32)
        p1 = (R @ p2.T).T + t
        p1_corrupt = p1.copy()
        p1_corrupt[:5] += 10.0
        w = np.ones(20, np.float32)
        w[:5] = 0.0
        g = horn.horn_sim3(jnp.asarray(p1_corrupt), jnp.asarray(p2), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(sim3.rot(g)), R, atol=1e-3)
