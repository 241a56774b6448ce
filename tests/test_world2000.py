"""world-2000 unknown-DA judged against the bundled TRUE-association
graphs (VERDICT r4 Next 2).

``world-2000-full.g2o`` / ``world-2000-lownoise-full.g2o`` carry
ground-truth data association (69 / 145 true landmarks), so the proper
judge is the full graph's float64 optimum — and the REFERENCE TRACKER'S
own bundled output (``*-default.g2o``: 463 / 350 landmarks) is scored on
the same bar (measured full-length: reference tracker ATE 8.56 / 7.19 m vs
ours 0.28 / 0.17 m). These dataset-gated tests run the 800-frame prefix
through the shipped recipes and gate the association floor: clearly beat
raw odometry and keep the landmark count near truth, not near the
reference tracker's fragmentation.
"""
import os
import sys

import numpy as np
import pytest

DATA = "/root/reference/datasets/2D"
SCRIPTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
)


def _run(dataset, validated, n_frames=800):
    sys.path.insert(0, SCRIPTS)
    import world_finish as wf

    from g2o_frontend_tpu.graph.store import graph2d_from_log
    from g2o_frontend_tpu.io.g2o import read_g2o
    from g2o_frontend_tpu.solvers.control import control_optimize_se2
    from g2o_frontend_tpu.utils.evaluation import ate_xy

    if validated:
        wf.track_validated(dataset, n_frames)
        tr, st = wf.load_tracker(dataset, ".val")
    else:
        wf.track(dataset, n_frames)
        tr, st = wf.load_tracker(dataset)
    wf.finish_em7(tr)

    fullname = wf.DATASETS[dataset][2]
    log_full = read_g2o(os.path.join(DATA, fullname))
    g_full, _ = graph2d_from_log(log_full)
    ctl = control_optimize_se2(g_full, max_iters=80)
    gt = ctl["poses"][:n_frames]
    n_true = int(np.asarray(g_full.landmark_mask).sum())
    est = tr.trajectory()[: len(gt)]
    noassoc = read_g2o(os.path.join(DATA, wf.DATASETS[dataset][0]))
    ate = float(ate_xy(est[:, :2], gt[:, :2])["rmse"])
    ate_odo = float(
        ate_xy(noassoc.se2_poses[: len(gt), :2], gt[:, :2])["rmse"]
    )
    return ate, ate_odo, int(tr.lm_alive.sum()), n_true


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference datasets missing")
def test_world2000_highnoise_prefix_vs_true_da():
    ate, ate_odo, n_lms, n_true = _run("world2000", validated=True)
    assert ate < 0.7 * ate_odo, (ate, ate_odo)
    # count near truth (the reference tracker fragments 6.7x over truth)
    assert n_lms <= 1.6 * n_true, (n_lms, n_true)


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference datasets missing")
def test_world2000_lownoise_prefix_vs_true_da():
    ate, ate_odo, n_lms, n_true = _run("world2000low", validated=False)
    assert ate < 0.5 * ate_odo, (ate, ate_odo)
    assert n_lms <= 1.6 * n_true, (n_lms, n_true)
