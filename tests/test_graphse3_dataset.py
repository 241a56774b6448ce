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


@pytest.mark.skipif(not os.path.isfile(PATH), reason="dataset missing")
def test_se3_to_se2_flatten():
    """toGraphSE2 equivalent (toGraphSE2.cpp:38-158): flatten + laser kept."""
    from g2o_frontend_tpu.io.g2o import se3_to_se2, write_g2o

    log = read_g2o(PATH)
    flat = se3_to_se2(log)
    assert len(flat.se2_ids) == len(log.se3_ids)
    assert len(flat.edge_se2_ij) == len(log.edge_se3_ij)
    assert len(flat.laser_scans) == len(log.laser_scans)
    # planar dataset: x, y match the SE3 estimates exactly
    np.testing.assert_allclose(flat.se2_poses[:, :2], log.se3_poses[:, :2])
    # edge measurements recomputed from state -> consistent with the poses
    i, j = flat.edge_se2_ij[10]
    pi = flat.se2_poses[np.where(flat.se2_ids == i)[0][0]]
    pj = flat.se2_poses[np.where(flat.se2_ids == j)[0][0]]
    c, s = np.cos(pi[2]), np.sin(pi[2])
    dx, dy = pj[0] - pi[0], pj[1] - pi[1]
    np.testing.assert_allclose(
        flat.edge_se2_meas[10][:2], [c * dx + s * dy, -s * dx + c * dy], atol=1e-12
    )
    # round-trips through the writer
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".g2o", mode="w", delete=False) as fh:
        path = fh.name
    write_g2o(path, flat)
    back = read_g2o(path)
    np.testing.assert_allclose(back.se2_poses, flat.se2_poses, rtol=1e-9)
    os.unlink(path)


@pytest.mark.skipif(not os.path.isfile(PATH), reason="dataset missing")
def test_add_imu_priors_roundtrip_and_optimize(tmp_path):
    """add_imu equivalent (sensor_data/add_imu.cpp:54-130): synthesized IMU
    orientation priors become EDGE_SE3_PRIOR records; the solver consumes
    them as binary edges to a fixed identity anchor."""
    from g2o_frontend_tpu.apps.boss_tools import main as boss_main
    from g2o_frontend_tpu.io.g2o import read_g2o as rd

    out = str(tmp_path / "imu.g2o")
    boss_main(["add-imu", PATH, "--synthesize", "-o", out])
    log = rd(out)
    assert len(log.prior_se3_ids) == 452
    # first prior fixes the gauge with full identity info; rest rotation-only
    assert np.allclose(log.prior_se3_info[0], np.eye(6))
    assert np.allclose(log.prior_se3_info[1][:3, :3], 0)
    assert np.allclose(log.prior_se3_info[1][3:, 3:], np.eye(3) * 1000.0)

    g, _ = graph3d_from_log(log)
    chi0 = float(pg.chi2_se3(g))
    g2, stats = pg.optimize_se3(g, iters=5, cg_iters=50)
    assert float(np.asarray(stats.chi2)[-1]) <= chi0 + 1e-6
    # orientation priors hold the estimates
    q0 = log.se3_poses[:, 3:7]
    q1 = np.asarray(g2.poses)[:452, 3:7]
    assert np.abs(np.sum(q0 * q1, 1)).min() > 0.999


def test_imu_boss_classes():
    from g2o_frontend_tpu.io.sensors import IMUData, IMUSensor

    d = IMUData(orientation=[0.0, 0.0, 0.0, 2.0])
    np.testing.assert_allclose(d.quaternion(), [0, 0, 0, 1.0])
    assert IMUSensor(topic="/imu/data").topic == "/imu/data"
