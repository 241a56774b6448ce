"""Hierarchical/gradient matcher + graph merge tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from g2o_frontend_tpu.graph.store import graph2d_from_log
from g2o_frontend_tpu.laser.matcher_refine import (
    gradient_refine,
    hierarchical_match,
    score_pose,
)
from g2o_frontend_tpu.laser.scan_matcher import GridSpec, build_likelihood_map
from g2o_frontend_tpu.slam.graph_merge import match_graphs, merge_graphs, overlap_score
from g2o_frontend_tpu.slam.simulator import SimulatorConfig, simulate
from g2o_frontend_tpu.solvers import pose_graph as pg

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_laser import square_room_scan  # noqa: E402

rng = np.random.default_rng(23)


def _scan_pts(pose=(0, 0, 0), n=360):
    r, a = square_room_scan(n_beams=n, pose=pose)
    r, a = np.asarray(r), np.asarray(a)
    return np.stack([r * np.cos(a), r * np.sin(a)], -1).astype(np.float32)


class TestRefinement:
    def setup_method(self):
        self.spec = GridSpec(rows=256, cols=256, resolution=0.05,
                             origin_x=-6.4, origin_y=-6.4)
        pts0 = _scan_pts()
        self.lmap = build_likelihood_map(
            jnp.asarray(pts0), jnp.ones(len(pts0), bool), self.spec, sigma_cells=2.0
        )

    def test_gradient_refine_improves_score(self):
        pose_gt = (0.12, -0.08, np.deg2rad(3.0))
        pts1 = _scan_pts(pose=pose_gt)
        pose0 = jnp.zeros(3)
        s0 = float(score_pose(self.lmap, jnp.asarray(pts1), jnp.ones(len(pts1), bool),
                              self.spec, pose0))
        pose, s1 = gradient_refine(
            self.lmap, jnp.asarray(pts1), jnp.ones(len(pts1), bool), self.spec,
            pose0, steps=80,
        )
        assert float(s1) > s0
        pose = np.asarray(pose)
        assert abs(pose[0] - pose_gt[0]) < 0.06, pose
        assert abs(pose[1] - pose_gt[1]) < 0.06, pose

    def test_hierarchical_match(self):
        pose_gt = (0.4, -0.25, np.deg2rad(9.0))
        pts1 = _scan_pts(pose=pose_gt)
        thetas = jnp.asarray(np.deg2rad(np.arange(-15, 16, 3.0)), jnp.float32)
        pose, score, res_c = hierarchical_match(
            self.lmap, jnp.asarray(pts1), jnp.ones(len(pts1), bool), self.spec,
            thetas, levels=2,
        )
        pose = np.asarray(pose)
        assert abs(pose[0] - pose_gt[0]) < 0.1, pose
        assert abs(pose[1] - pose_gt[1]) < 0.1, pose
        assert abs(pose[2] - pose_gt[2]) < np.deg2rad(3), pose


class TestGraphMerge:
    def test_match_and_merge_simulated_worlds(self):
        # one world, two overlapping halves as separate "robot sessions"
        world = simulate(SimulatorConfig(n_poses=160, n_landmarks=0, seed=11))
        gt = world.gt_poses
        a_idx = np.arange(0, 100)
        b_idx = np.arange(60, 160)
        import jax.numpy as jnp
        from g2o_frontend_tpu.utils import lie

        # graph B lives in its own frame (first pose = origin)
        Tb0 = gt[b_idx[0]]
        inv = np.asarray(lie.se2_inverse(jnp.asarray(Tb0, jnp.float32)))
        poses_b = np.asarray(
            [np.asarray(lie.se2_compose(jnp.asarray(inv), jnp.asarray(p, jnp.float32)))
             for p in gt[b_idx]]
        )
        res = match_graphs(gt[a_idx], poses_b, initial_guess=Tb0, gate=1.5)
        assert res.ok
        assert len(res.pairs) >= 20
        # recovered transform ~ Tb0
        np.testing.assert_allclose(res.transform[:2], Tb0[:2], atol=0.1)
        score = overlap_score(gt[a_idx], poses_b, res.transform, radius=0.8)
        assert score > 0.35, score

        # merge into one optimizable graph
        from g2o_frontend_tpu.io.g2o import G2OLog

        def sub_log(idx, poses):
            e_ij, e_z, e_w = [], [], []
            idx_set = {v: k for k, v in enumerate(idx)}
            for (i, j, z, w) in world.odom_edges:
                if i in idx_set and j in idx_set:
                    e_ij.append([idx_set[i], idx_set[j]])
                    e_z.append(z)
                    e_w.append(w)
            return G2OLog(
                se2_ids=np.arange(len(idx)),
                se2_poses=np.asarray(poses, float),
                edge_se2_ij=np.asarray(e_ij),
                edge_se2_meas=np.asarray(e_z),
                edge_se2_info=np.asarray(e_w),
                fixed_ids=np.array([0]),
            )

        log_a = sub_log(a_idx, gt[a_idx])
        log_b = sub_log(b_idx, poses_b)
        merged = merge_graphs(log_a, log_b, res)
        g, _ = graph2d_from_log(merged)
        g_opt, stats = pg.optimize_se2(g, iters=8, cg_iters=80)
        chi2 = np.asarray(stats.chi2)
        assert np.isfinite(chi2[-1])
        assert chi2[-1] <= chi2[0] + 1e-3

