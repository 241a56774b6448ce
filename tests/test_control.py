"""Accuracy control: float64 sparse-Cholesky host solver vs the TPU solvers.

BASELINE.md requires accuracy claims to be grounded in a control run of the
reference protocol; solvers/control.py plays the g2o+CHOLMOD role
(``map_g2o_reflector.h:50-74``). These tests pin the bundled graphs' optima
and assert the jitted solvers reach them.
"""
import os

import numpy as np
import pytest

from g2o_frontend_tpu.graph.store import graph2d_from_log
from g2o_frontend_tpu.io.g2o import read_g2o
from g2o_frontend_tpu.solvers.control import control_optimize_se2
from g2o_frontend_tpu.solvers.pose_graph import optimize_se2, optimize_se2_direct

from tests.test_partitioned import _ring_graph

DATA = "/root/reference/datasets/2D"


def test_control_matches_pcg_and_direct_on_ring():
    g = _ring_graph()
    ctl = control_optimize_se2(g, max_iters=100)
    g1, s1 = optimize_se2(g, iters=15, cg_iters=100)
    g2, s2 = optimize_se2_direct(g, iters=15)
    chi_pcg = float(np.asarray(s1.chi2)[-1])
    chi_dir = float(np.asarray(s2.chi2)[-1])
    assert chi_pcg == pytest.approx(ctl["chi2"], rel=1e-2)
    assert chi_dir == pytest.approx(ctl["chi2"], rel=1e-3)


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference datasets missing")
def test_world2000_full_optimum():
    """The bundled world-2000-full graph's optimum chi2 (control-established:
    7657.55; round-1 EVAL's 'stall' at 7658 was in fact convergence)."""
    log = read_g2o(os.path.join(DATA, "world-2000-full.g2o.gz"))
    g, _ = graph2d_from_log(log)
    ctl = control_optimize_se2(g, max_iters=30)
    assert ctl["chi2"] == pytest.approx(7657.55, rel=1e-3)
    gd, sd = optimize_se2_direct(g, iters=8)
    assert float(np.asarray(sd.chi2)[-1]) == pytest.approx(ctl["chi2"], rel=1e-4)


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference datasets missing")
def test_graphse2_optimum_near_zero():
    log = read_g2o(os.path.join(DATA, "graphSE2.g2o"))
    g, _ = graph2d_from_log(log)
    ctl = control_optimize_se2(g, max_iters=50)
    g1, s1 = optimize_se2(g, iters=10, cg_iters=100)
    assert ctl["chi2"] < 1e-6
    assert float(np.asarray(s1.chi2)[-1]) < 1e-6
