"""RANSAC engine + solver tests: the reference's synthetic known-transform
protocol (``ransac/ransac_test.cpp:84-205``): generate random items, apply a
ground-truth transform + noise, plant outliers, recover, compare."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g2o_frontend_tpu.ransac import solvers as S
from g2o_frontend_tpu.ransac.engine import ransac
from g2o_frontend_tpu.utils import lie

rng = np.random.default_rng(3)


def _se3_gt():
    xi = np.array([0.3, -0.2, 0.5, 0.2, -0.1, 0.3], np.float32)
    return np.asarray(lie.se3_exp(jnp.asarray(xi)))


class TestSolversExact:
    def test_horn2d_exact(self):
        x_gt = jnp.array([1.0, -2.0, 0.7])
        p2 = jnp.asarray(rng.normal(size=(10, 2)), jnp.float32)
        p1 = lie.se2_apply(x_gt, p2)
        w = jnp.ones(10)
        x = S.fit_se2_points(p1, p2, w)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_gt), atol=1e-5)

    def test_horn3d_exact(self):
        T_gt = _se3_gt()
        p2 = rng.normal(size=(12, 3)).astype(np.float32)
        p1 = p2 @ T_gt[:3, :3].T + T_gt[:3, 3]
        T = S.fit_se3_points(jnp.asarray(p1), jnp.asarray(p2), jnp.ones(12))
        np.testing.assert_allclose(np.asarray(T), T_gt, atol=1e-4)

    def test_se2_poses_exact(self):
        x_gt = jnp.array([0.5, 1.0, -0.4])
        x2 = jnp.asarray(rng.normal(size=(6, 3)), jnp.float32)
        x1 = jax.vmap(lambda b: lie.se2_compose(x_gt, b))(x2)
        x = S.fit_se2_poses(x1, x2, jnp.ones(6))
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_gt), atol=1e-5)

    def test_se3_poses_exact(self):
        T_gt = jnp.asarray(_se3_gt())
        T2 = jax.vmap(lie.se3_exp)(
            jnp.asarray(rng.normal(size=(5, 6)) * 0.4, jnp.float32)
        )
        T1 = jnp.einsum("ij,njk->nik", T_gt, T2)
        T = S.fit_se3_poses(T1, T2, jnp.ones(5))
        np.testing.assert_allclose(np.asarray(T), np.asarray(T_gt), atol=1e-4)

    def test_lines2d_exact(self):
        x_gt = jnp.array([0.8, -0.3, 0.6])
        angles = rng.uniform(0, 2 * np.pi, 8).astype(np.float32)
        rhos = rng.uniform(-2, 2, 8).astype(np.float32)
        l2 = np.stack([np.cos(angles), np.sin(angles), rhos], -1)
        c, s = np.cos(float(x_gt[2])), np.sin(float(x_gt[2]))
        R = np.array([[c, -s], [s, c]], np.float32)
        n1 = l2[:, :2] @ R.T
        rho1 = l2[:, 2] + n1 @ np.asarray(x_gt[:2])
        l1 = np.concatenate([n1, rho1[:, None]], -1)
        x = S.fit_se2_lines(jnp.asarray(l1), jnp.asarray(l2), jnp.ones(8))
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_gt), atol=1e-5)

    def test_planes_exact(self):
        T_gt = _se3_gt()
        n2 = rng.normal(size=(6, 3)).astype(np.float32)
        n2 /= np.linalg.norm(n2, axis=1, keepdims=True)
        d2 = rng.uniform(-2, 2, 6).astype(np.float32)
        n1 = n2 @ T_gt[:3, :3].T
        d1 = d2 + n1 @ T_gt[:3, 3]
        pl1 = np.concatenate([n1, d1[:, None]], -1)
        pl2 = np.concatenate([n2, d2[:, None]], -1)
        T = S.fit_se3_planes(jnp.asarray(pl1), jnp.asarray(pl2), jnp.ones(6))
        np.testing.assert_allclose(np.asarray(T), T_gt, atol=1e-4)

    def test_lines3d_exact(self):
        T_gt = _se3_gt()
        d2 = rng.normal(size=(6, 3)).astype(np.float32)
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
        p2 = rng.normal(size=(6, 3)).astype(np.float32)
        d1 = d2 @ T_gt[:3, :3].T
        p1 = p2 @ T_gt[:3, :3].T + T_gt[:3, 3]
        l1 = np.concatenate([d1, p1], -1)
        l2 = np.concatenate([d2, p2], -1)
        T = S.fit_se3_lines(jnp.asarray(l1), jnp.asarray(l2), jnp.ones(6))
        # translation along line directions is unobservable per-line; compare
        # by direction map + point-to-line errors instead of raw T
        err = np.asarray(S.err_se3_lines(T, jnp.asarray(l1), jnp.asarray(l2)))
        assert err.max() < 1e-6


class TestRansacWithOutliers:
    """ransac_test.cpp pattern: noise on inliers + planted gross outliers."""

    def test_horn2d_outliers(self):
        N = 100
        x_gt = jnp.array([1.2, -0.5, 0.9])
        p2 = rng.uniform(-5, 5, (N, 2)).astype(np.float32)
        p1 = np.array(lie.se2_apply(x_gt, jnp.asarray(p2)))
        p1 += rng.normal(0, 0.01, p1.shape)
        out = rng.random(N) < 0.4  # 40% outliers
        p1[out] = rng.uniform(-5, 5, (out.sum(), 2))
        res = ransac(
            jax.random.PRNGKey(0),
            jnp.asarray(p1),
            jnp.asarray(p2),
            jnp.ones(N, bool),
            fit_fn=S.fit_se2_points,
            err_fn=S.err_se2_points,
            minimal_size=2,
            inlier_threshold=0.05**2,
            n_hypotheses=256,
        )
        assert bool(res.ok)
        assert int(res.n_inliers) > 0.9 * (N - out.sum())
        np.testing.assert_allclose(np.asarray(res.transform), np.asarray(x_gt), atol=0.02)
        # planted outliers must be excluded
        assert not np.asarray(res.inliers)[out].any() or np.asarray(res.inliers)[out].mean() < 0.1

    def test_horn3d_outliers(self):
        N = 120
        T_gt = _se3_gt()
        p2 = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
        p1 = p2 @ T_gt[:3, :3].T + T_gt[:3, 3] + rng.normal(0, 0.01, (N, 3))
        out = rng.random(N) < 0.3
        p1[out] = rng.uniform(-3, 3, (out.sum(), 3))
        res = ransac(
            jax.random.PRNGKey(1),
            jnp.asarray(p1, jnp.float32),
            jnp.asarray(p2),
            jnp.ones(N, bool),
            fit_fn=S.fit_se3_points,
            err_fn=S.err_se3_points,
            minimal_size=3,
            inlier_threshold=0.05**2,
            n_hypotheses=512,
        )
        assert bool(res.ok)
        T = np.asarray(res.transform)
        err = np.linalg.inv(T_gt) @ T
        assert np.linalg.norm(err[:3, 3]) < 0.02
        ang = np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1))
        assert ang < 0.01

    def test_planes_outliers(self):
        N = 40
        T_gt = _se3_gt()
        n2 = rng.normal(size=(N, 3)).astype(np.float32)
        n2 /= np.linalg.norm(n2, axis=1, keepdims=True)
        d2 = rng.uniform(-2, 2, N).astype(np.float32)
        n1 = n2 @ T_gt[:3, :3].T + rng.normal(0, 0.005, (N, 3))
        n1 /= np.linalg.norm(n1, axis=1, keepdims=True)
        d1 = d2 + n1 @ T_gt[:3, 3] + rng.normal(0, 0.005, N)
        out = rng.random(N) < 0.25
        rn = rng.normal(size=(out.sum(), 3))
        n1[out] = rn / np.linalg.norm(rn, axis=1, keepdims=True)
        d1[out] = rng.uniform(-2, 2, out.sum())
        pl1 = np.concatenate([n1, d1[:, None]], -1).astype(np.float32)
        pl2 = np.concatenate([n2, d2[:, None]], -1).astype(np.float32)
        res = ransac(
            jax.random.PRNGKey(2),
            jnp.asarray(pl1),
            jnp.asarray(pl2),
            jnp.ones(N, bool),
            fit_fn=S.fit_se3_planes,
            err_fn=S.err_se3_planes,
            minimal_size=3,
            inlier_threshold=0.03,
            n_hypotheses=512,
            min_inliers=3,
        )
        assert bool(res.ok)
        T = np.asarray(res.transform)
        err = np.linalg.inv(T_gt) @ T
        assert np.linalg.norm(err[:3, 3]) < 0.05, err
        ang = np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1))
        assert ang < 0.02

    def test_masked_correspondences_ignored(self):
        # entries outside the mask must never contaminate the fit
        N = 50
        x_gt = jnp.array([0.4, 0.2, -0.3])
        p2 = rng.uniform(-4, 4, (N, 2)).astype(np.float32)
        p1 = np.array(lie.se2_apply(x_gt, jnp.asarray(p2)))
        mask = np.ones(N, bool)
        mask[30:] = False
        p1[30:] = 1e3  # garbage in masked region
        res = ransac(
            jax.random.PRNGKey(3),
            jnp.asarray(p1, jnp.float32),
            jnp.asarray(p2),
            jnp.asarray(mask),
            fit_fn=S.fit_se2_points,
            err_fn=S.err_se2_points,
            minimal_size=2,
            inlier_threshold=1e-4,
            n_hypotheses=128,
        )
        assert bool(res.ok)
        assert int(res.n_inliers) == 30
        np.testing.assert_allclose(np.asarray(res.transform), np.asarray(x_gt), atol=1e-3)
