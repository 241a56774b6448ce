"""Schur-complement BA tests: synthetic worlds, single and multi-device."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from g2o_frontend_tpu.parallel.mesh import make_mesh
from g2o_frontend_tpu.parallel.sharded_ba import optimize_ba_sharded
from g2o_frontend_tpu.solvers.ba import make_ba_problem, optimize_ba
from g2o_frontend_tpu.utils import lie

rng = np.random.default_rng(13)


def make_problem(n_poses=8, n_points=60, noise=0.01, init_noise=0.08):
    points_gt = rng.uniform(-3, 3, (n_points, 3))
    poses_gt = []
    for k in range(n_poses):
        xi = np.concatenate(
            [rng.uniform(-1, 1, 3), rng.uniform(-0.3, 0.3, 3)]
        ).astype(np.float32)
        poses_gt.append(np.asarray(lie.se3_exp(jnp.asarray(xi)), np.float64))

    obs = []
    info = np.eye(3) * 100
    for i, T in enumerate(poses_gt):
        Ti = np.linalg.inv(T)
        for l, p in enumerate(points_gt):
            z = Ti[:3, :3] @ p + Ti[:3, 3] + rng.normal(0, noise, 3)
            obs.append((i, l, z, info))

    poses7 = []
    for i, T in enumerate(poses_gt):
        Tn = T if i == 0 else T @ np.asarray(
            lie.se3_exp(jnp.asarray(rng.normal(0, init_noise, 6), jnp.float32))
        )
        q = np.asarray(lie.mat2quat_full(jnp.asarray(Tn[:3, :3], jnp.float32)))
        poses7.append(np.concatenate([Tn[:3, 3], q[1:], q[:1]]))
    points_init = points_gt + rng.normal(0, init_noise, points_gt.shape)
    return poses_gt, points_gt, poses7, points_init, obs


class TestBA:
    def test_convergence(self):
        poses_gt, points_gt, poses7, points_init, obs = make_problem()
        ba = make_ba_problem(poses7, points_init, obs)
        ba_opt, trace = optimize_ba(ba, iters=12, cg_iters=40)
        tr = np.asarray(trace)
        assert tr[-1] < tr[0] * 0.01, tr
        pts = np.asarray(ba_opt.points)[: len(points_gt)]
        err = np.linalg.norm(pts - points_gt, axis=1)
        assert np.sqrt((err**2).mean()) < 0.02, err.max()
        # pose positions
        est_t = np.asarray(ba_opt.poses)[: len(poses_gt), :3]
        gt_t = np.stack([T[:3, 3] for T in poses_gt])
        assert np.abs(est_t - gt_t).max() < 0.03

    def test_fixed_pose_unmoved(self):
        _, _, poses7, points_init, obs = make_problem(n_poses=4, n_points=20)
        ba = make_ba_problem(poses7, points_init, obs)
        p0 = np.asarray(ba.poses)[0].copy()
        ba_opt, _ = optimize_ba(ba, iters=5, cg_iters=20)
        np.testing.assert_allclose(np.asarray(ba_opt.poses)[0], p0, atol=1e-6)

    def test_sharded_matches_single(self):
        assert len(jax.devices()) >= 8
        poses_gt, points_gt, poses7, points_init, obs = make_problem()
        ba = make_ba_problem(poses7, points_init, obs)
        ba_ref, tr_ref = optimize_ba(ba, iters=8, cg_iters=40)
        mesh = make_mesh(8)
        ba_sh, tr_sh = optimize_ba_sharded(ba, mesh, iters=8, cg_iters=40)
        r = float(np.asarray(tr_ref)[-1])
        s = float(np.asarray(tr_sh)[-1])
        assert abs(s - r) / max(r, 1e-9) < 0.05, (r, s)
        np.testing.assert_allclose(
            np.asarray(ba_sh.points), np.asarray(ba_ref.points), atol=5e-3
        )
