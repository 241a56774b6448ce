"""Distributed (edge-sharded) solver tests on a virtual 8-device CPU mesh.

This is the multi-chip test strategy from SURVEY.md §4: virtual host devices
via --xla_force_host_platform_device_count, no real slice needed."""
import os

import numpy as np
import pytest

from g2o_frontend_tpu.graph.store import graph2d_from_log
from g2o_frontend_tpu.io.g2o import read_g2o
from g2o_frontend_tpu.parallel.mesh import make_mesh
from g2o_frontend_tpu.parallel.sharded_pose_graph import optimize_se2_sharded
from g2o_frontend_tpu.solvers import pose_graph as pg

DATA = "/root/reference/datasets/2D"


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference datasets missing")
def test_sharded_matches_single_device():
    import jax

    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    log = read_g2o(os.path.join(DATA, "graphSE2.g2o"))
    g, _ = graph2d_from_log(log)

    g_ref, stats = pg.optimize_se2(g, iters=5, cg_iters=50)
    mesh = make_mesh(8)
    g_sh, trace = optimize_se2_sharded(g, mesh, iters=5, cg_iters=50)

    chi_ref = float(stats.chi2[-1])
    chi_sh = float(trace[-1])
    # identical algorithm, different reduction order -> near-identical result
    assert abs(chi_sh - chi_ref) / max(chi_ref, 1e-9) < 5e-2, (chi_ref, chi_sh)
    np.testing.assert_allclose(
        np.asarray(g_sh.poses), np.asarray(g_ref.poses), atol=2e-2
    )


def test_sharded_landmark_graph():
    import jax

    from test_pose_graph import make_circle_graph

    log, gt = make_circle_graph(noise=0.0)
    g, _ = graph2d_from_log(log)
    mesh = make_mesh(4)
    g_sh, trace = optimize_se2_sharded(g, mesh, iters=10, cg_iters=100)
    assert float(trace[-1]) < 1e-3


def test_sharded_se3_matches_single():
    import os
    import numpy as np
    from g2o_frontend_tpu.graph.store import graph3d_from_log
    from g2o_frontend_tpu.io.g2o import read_g2o
    from g2o_frontend_tpu.parallel.sharded_pose_graph3d import optimize_se3_sharded
    from g2o_frontend_tpu.solvers import pose_graph as pg

    path = "/root/reference/datasets/2D/graphSE3.g2o"
    if not os.path.isfile(path):
        import pytest

        pytest.skip("dataset missing")
    log = read_g2o(path)
    g, _ = graph3d_from_log(log)
    g_ref, stats = pg.optimize_se3(g, iters=4, cg_iters=40)
    mesh = make_mesh(8)
    g_sh, trace = optimize_se3_sharded(g, mesh, iters=4, cg_iters=40)
    r = float(np.asarray(stats.chi2)[-1])
    s = float(np.asarray(trace)[-1])
    assert abs(s - r) / max(r, 1e-9) < 0.05, (r, s)
