"""Line-landmark SLAM tests: solver convergence + end-to-end laser loop."""
import numpy as np
import jax.numpy as jnp
import pytest

from g2o_frontend_tpu.slam.line_slam import LineSlam2D, LineSlam2DConfig, transform_line
from g2o_frontend_tpu.solvers.line_slam import (
    line_observation,
    make_line_graph,
    optimize_line_graph,
)

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_laser import square_room_scan  # noqa: E402

rng = np.random.default_rng(17)


class TestLineGraphSolver:
    def test_converges(self):
        # world: 4 lines (square room walls), 6 poses
        lines_gt = np.array(
            [[0.0, 4.0], [np.pi / 2, 4.0], [np.pi, 4.0], [-np.pi / 2, 4.0]]
        )
        poses_gt = [np.zeros(3)]
        for k in range(5):
            poses_gt.append(poses_gt[-1] + np.array([0.4, 0.1, 0.2]))
        pl, pp = [], []
        info2 = np.diag([400.0, 100.0])
        info3 = np.diag([100.0, 100.0, 400.0])
        for i, x in enumerate(poses_gt):
            for l, ln in enumerate(lines_gt):
                z = np.array(
                    line_observation(jnp.asarray(x, jnp.float32), jnp.asarray(ln, jnp.float32))
                )
                z = z + rng.normal(0, 0.01, 2)
                pl.append((i, l, z, info2))
        for i in range(len(poses_gt) - 1):
            d = poses_gt[i + 1] - poses_gt[i]
            c, s = np.cos(poses_gt[i][2]), np.sin(poses_gt[i][2])
            z = np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1], d[2]])
            pp.append((i, i + 1, z, info3))

        poses_init = [poses_gt[0]] + [
            p + rng.normal(0, 0.08, 3) for p in poses_gt[1:]
        ]
        lines_init = lines_gt + rng.normal(0, 0.05, lines_gt.shape)
        g = make_line_graph(np.asarray(poses_init), lines_init, pp, pl)
        g_opt, trace = optimize_line_graph(g, iters=15, cg_iters=50)
        tr = np.asarray(trace)
        assert tr[-1] < tr[0] * 0.05, tr
        lines = np.asarray(g_opt.lines)[: len(lines_gt)]
        np.testing.assert_allclose(lines[:, 1], lines_gt[:, 1], atol=0.03)
        poses = np.asarray(g_opt.poses)[: len(poses_gt)]
        np.testing.assert_allclose(poses, np.asarray(poses_gt), atol=0.05)


class TestLineSlam2D:
    def test_square_room_loop(self):
        cfg = LineSlam2DConfig(optimize_each_n=0)
        slam = LineSlam2D(cfg)
        gt = []
        x = np.array([0.0, 0.0, 0.0])
        n_frames = 12
        for k in range(n_frames):
            gt.append(x.copy())
            ranges, angles = square_room_scan(pose=tuple(x))
            delta_true = np.array([0.25, 0.0, 2 * np.pi / n_frames])
            delta = delta_true + rng.normal(0, 0.01, 3)
            slam.process_scan(
                np.asarray(ranges), np.asarray(angles),
                delta if k < n_frames - 1 else delta,
            )
            # integrate true motion
            c, s = np.cos(x[2]), np.sin(x[2])
            x = np.array(
                [x[0] + c * 0.25, x[1] + s * 0.0 + s * 0.25 * 0, x[2] + delta_true[2]]
            )
            x[0] = gt[-1][0] + c * delta_true[0] - s * delta_true[1]
            x[1] = gt[-1][1] + s * delta_true[0] + c * delta_true[1]
        slam.merge_landmarks()
        chi2 = slam.optimize()
        st = slam.stats()
        # the room has 4 walls; merging should keep the map compact
        assert 4 <= st["n_lines"] <= 8, st
        assert np.isfinite(chi2)
        est = np.asarray(slam.poses)
        errs = np.linalg.norm(est[: len(gt), :2] - np.asarray(gt)[:, :2], axis=1)
        assert errs.mean() < 0.2, errs

    def test_transform_line_roundtrip(self):
        pose = np.array([1.0, -0.5, 0.7])
        local = np.array([0.3, 2.0])
        world = transform_line(pose, local)
        back = np.asarray(
            line_observation(jnp.asarray(pose, jnp.float32), jnp.asarray(world, jnp.float32))
        )
        # observation may differ by the line's 180-deg ambiguity
        da = abs((back[0] - local[0] + np.pi) % (2 * np.pi) - np.pi)
        if da > np.pi / 2:
            back = np.array([back[0] + np.pi, -back[1]])
            da = abs((back[0] - local[0] + np.pi) % (2 * np.pi) - np.pi)
        assert da < 1e-5
        np.testing.assert_allclose(back[1], local[1], atol=1e-5)


MARTINA = "/root/reference/datasets/2D/martina/newtest_segway1_no_bag/aligned_unmerged.g2o"


@pytest.mark.skipif(not os.path.isfile(MARTINA), reason="dataset missing")
def test_martina_line_graph_parses_and_optimizes():
    """Real line_alignment output graph (VERTEX_LINE2D / VERTEX_EXTREME_XY /
    EDGE_SE2_LINE2D / EDGE_LINE2D_POINTXY records)."""
    from g2o_frontend_tpu.io.g2o import read_g2o, write_g2o
    from g2o_frontend_tpu.solvers.line_slam import (
        line_graph_from_log, optimize_line_graph)

    log = read_g2o(MARTINA)
    assert len(log.line2d_ids) == 166
    assert len(log.extreme_ids) == 215
    assert len(log.edge_se2line_ij) == 210
    assert len(log.edge_linexy_ij) == 420
    # endpoint references resolve to extreme-point vertices
    ep = set(log.extreme_ids.tolist())
    assert all(int(a) in ep and int(b) in ep for a, b in log.line2d_endpoints)

    g, _, _ = line_graph_from_log(log)
    g2, trace = optimize_line_graph(g, iters=8, cg_iters=60)
    tr = np.asarray(trace)
    assert tr[-1] <= tr[0] * 0.8  # substantial chi2 reduction

    # line records survive a write/read round trip
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".g2o", delete=False) as fh:
        path = fh.name
    write_g2o(path, log)
    back = read_g2o(path)
    np.testing.assert_allclose(back.line2d_params, log.line2d_params, rtol=1e-9)
    np.testing.assert_array_equal(back.line2d_endpoints, log.line2d_endpoints)
    np.testing.assert_allclose(back.extreme_points, log.extreme_points, rtol=1e-9)
    np.testing.assert_allclose(back.edge_se2line_meas, log.edge_se2line_meas, rtol=1e-9)
    np.testing.assert_allclose(back.edge_linexy_meas, log.edge_linexy_meas, rtol=1e-9)
    os.unlink(path)
