"""Distributed Schur/chain/Woodbury solver: accuracy on the mesh.

VERDICT r3 Next 1: the single-device Schur solver reaches the float64
control optimum on victoriaPark but no multi-device path did (block-Jacobi
stalled at 145k vs control 22.6k for three rounds). These tests gate the
SPIKE-distributed version at the control's accuracy on an 8-virtual-device
mesh — scaling out must no longer give up the optimum.
"""
import os

import numpy as np
import pytest

from g2o_frontend_tpu.graph.store import graph2d_from_log
from g2o_frontend_tpu.io.g2o import G2OLog, read_g2o
from g2o_frontend_tpu.parallel.mesh import make_mesh
from g2o_frontend_tpu.parallel.partitioned_schur import (
    optimize_se2_schur_partitioned)
from g2o_frontend_tpu.solvers.schur_pcg import optimize_se2_schur

DATA = "/root/reference/datasets/2D"


def _chain_landmark_graph(n=96, nl=12, seed=0):
    """Odometry chain observing XY landmarks — victoriaPark's structure in
    miniature (loop closure only through co-observed landmarks)."""
    rng = np.random.default_rng(seed)
    gt = np.zeros((n, 3))
    for i in range(1, n):
        gt[i, 2] = gt[i - 1, 2] + 0.15 * np.sin(i * 0.2)
        c, s = np.cos(gt[i - 1, 2]), np.sin(gt[i - 1, 2])
        gt[i, :2] = gt[i - 1, :2] + np.array([c, s]) * 0.5
    lms_gt = gt[rng.integers(0, n, nl), :2] + rng.normal(0, 2.0, (nl, 2))

    def rel(a, b):
        c, s = np.cos(a[2]), np.sin(a[2])
        d = b[:2] - a[:2]
        dth = (b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi
        return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1], dth])

    ij, z = [], []
    for i in range(n - 1):
        ij.append([i, i + 1])
        z.append(rel(gt[i], gt[i + 1]) + rng.normal(0, 0.02, 3))
    lij, lz = [], []
    for i in range(n):
        for l in range(nl):
            d = lms_gt[l] - gt[i, :2]
            if np.linalg.norm(d) < 4.0:
                c, s = np.cos(gt[i, 2]), np.sin(gt[i, 2])
                loc = np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1]])
                lij.append([i, l])
                lz.append(loc + rng.normal(0, 0.05, 2))
    noisy = gt + rng.normal(0, 0.08, gt.shape)
    noisy[0] = gt[0]
    log = G2OLog(
        se2_ids=np.arange(n),
        se2_poses=noisy,
        edge_se2_ij=np.asarray(ij),
        edge_se2_meas=np.asarray(z),
        edge_se2_info=np.tile(np.diag([400.0, 400.0, 1600.0]),
                              (len(ij), 1, 1)),
        xy_ids=np.arange(nl) + 10000,
        xy_points=lms_gt + rng.normal(0, 0.3, lms_gt.shape),
        edge_se2xy_ij=np.asarray(
            [[i, l + 10000] for i, l in lij]
        ),
        edge_se2xy_meas=np.asarray(lz),
        edge_se2xy_info=np.tile(np.diag([100.0, 100.0]), (len(lij), 1, 1)),
        fixed_ids=np.array([0]),
    )
    g, _ = graph2d_from_log(log)
    return g


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_partitioned_schur_matches_single_device(n_dev):
    g = _chain_landmark_graph()
    g_ref, st = optimize_se2_schur(g, iters=60, cg_iters=60)
    chi_ref = float(np.asarray(st.chi2)[-1])
    mesh = make_mesh(n_dev)
    g_pt, trace, stats = optimize_se2_schur_partitioned(
        g, mesh, iters=60, cg_iters=60
    )
    chi_pt = float(np.asarray(trace)[-1])
    assert chi_pt <= 1.005 * chi_ref, (chi_ref, chi_pt)
    np.testing.assert_allclose(
        np.asarray(g_pt.poses)[:96], np.asarray(g_ref.poses)[:96], atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(g_pt.landmarks)[:12], np.asarray(g_ref.landmarks)[:12],
        atol=5e-3,
    )


def test_partitioned_schur_pose_only():
    """No landmarks: reduces to distributed chain-preconditioned LM."""
    g = _chain_landmark_graph(nl=0)
    g_ref, st = optimize_se2_schur(g, iters=40, cg_iters=60)
    chi_ref = float(np.asarray(st.chi2)[-1])
    mesh = make_mesh(4)
    _, trace, _ = optimize_se2_schur_partitioned(g, mesh, iters=40,
                                                 cg_iters=60)
    chi_pt = float(np.asarray(trace)[-1])
    # both converge to the noise floor of this synthetic problem; the
    # absolute term absorbs fp32 roundoff at chi2 ~ 1e-8
    assert chi_pt <= 1.005 * chi_ref + 1e-7, (chi_ref, chi_pt)


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference datasets missing")
def test_partitioned_schur_victoria_reaches_control():
    """THE round-4 gate: 8-device mesh reaches the float64 control optimum
    on victoriaPark-full (VERDICT r3: every distributed run was >=5x off)."""
    import jax

    # the D=8 victoriaPark program is the biggest compile in the suite;
    # drop every cached executable first so the 2-core host's RAM survives
    # a full-suite run (the suite aborted in backend_compile here)
    jax.clear_caches()
    log = read_g2o(os.path.join(DATA, "victoriaPark-full.g2o.gz"))
    g, _ = graph2d_from_log(log)
    mesh = make_mesh(8)
    g_pt, trace, stats = optimize_se2_schur_partitioned(
        g, mesh, iters=60, cg_iters=100
    )
    chi_pt = float(np.asarray(trace)[-1])
    # float64 sparse-Cholesky control optimum: the control solver's own
    # cached output (one source of truth, regenerated by evaluate.py/bench)
    import json
    ctl_path = "/root/repo/eval_out/control_victoria.json"
    control = (json.load(open(ctl_path))["chi2_control"]
               if os.path.isfile(ctl_path) else 22572.61)
    assert chi_pt <= 1.01 * control, chi_pt
    # per-matvec wire stays O(ghosts): far below the full pose field
    comm = stats["comm"]
    assert comm["bytes_per_matvec"] < 6969 * 3 * 4 / 10
    # replicated psum payload is O(D + NL) floats, not O(N)
    assert stats["replicated_psum_floats_per_cg_iter"] < 6969
