"""Bundled graphSE3.g2o: SE3 parse + optimization (reference eval data)."""
import os

import numpy as np
import pytest

from g2o_frontend_tpu.graph.store import graph3d_from_log
from g2o_frontend_tpu.io.g2o import read_g2o
from g2o_frontend_tpu.solvers import pose_graph as pg

PATH = "/root/reference/datasets/2D/graphSE3.g2o"


@pytest.mark.skipif(not os.path.isfile(PATH), reason="dataset missing")
def test_graphse3_loads_and_optimizes():
    log = read_g2o(PATH)
    assert len(log.se3_ids) == 452
    assert len(log.edge_se3_ij) == 451
    assert len(log.laser_scans) == 452
    g, _ = graph3d_from_log(log)
    chi2_0 = float(pg.chi2_se3(g))
    g_opt, stats = pg.optimize_se3(g, iters=8, cg_iters=60)
    chi2_1 = float(np.asarray(stats.chi2)[-1])
    assert np.isfinite(chi2_1)
    assert chi2_1 <= chi2_0 + 1e-3
    # quaternions remain normalized after updates
    q = np.asarray(g_opt.poses)[:452, 3:7]
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-4)


@pytest.mark.skipif(not os.path.isfile(PATH), reason="dataset missing")
def test_native_parser_handles_se3_records():
    a = read_g2o(PATH, native=True)
    b = read_g2o(PATH, native=False)
    np.testing.assert_allclose(a.se3_poses, b.se3_poses, rtol=1e-12)
    np.testing.assert_allclose(a.edge_se3_info, b.edge_se3_info, rtol=1e-12)
