"""Validated-SLAM driver: closure absorption, rollback, chimera split.

Oracle strategy: synthetic worlds with planted drift and known landmark
truth — the driver must merge drift-separated duplicates via validated
closures and reject poisoned batches (the ``map_closer`` consensus
accept/reject pattern at merge granularity; sweep record in
``scripts/victoria_finish.py``).
"""
import numpy as np
import pytest

from g2o_frontend_tpu.slam.feature_tracker import (
    FeatureTracker2D,
    Tracker2DConfig,
)
from g2o_frontend_tpu.slam.validated_slam import (
    ValidatedSlamConfig,
    absorb_closure,
    finish_window_closures,
    run_validated_tracking,
)


def _figure_world(seed=1, n_lms=14):
    # sparse field (spacing >> association gate): drift must not alias a
    # duplicated landmark onto a DIFFERENT old landmark, or the incremental
    # associator poisons the graph before any closure runs (the dense
    # victoria-like case is exercised by the victoria eval itself)
    rng = np.random.default_rng(seed)
    lms_true = rng.uniform(-9, 9, (n_lms, 2))
    path = [np.array([np.cos(t) * 5, np.sin(t) * 5, t + np.pi / 2])
            for t in np.linspace(0, 2 * np.pi, 40, endpoint=False)]
    return lms_true, path


def _frames(lms_true, path, loops=2, drift=np.array([8.0, 5.0, 0.0]),
            drift_from=40, ramp=25):
    """Drift ramps in over `ramp` frames — real odometry drift is spread
    over many edges, not one jump edge (a single-edge jump makes the
    post-closure optimum pay the whole correction on one constraint,
    which no consistent-gate driver should accept)."""
    prev_est = None
    for k, p in enumerate(path * loops):
        scale = np.clip((k - drift_from) / ramp, 0.0, 1.0)
        d = drift * scale
        est = p + d
        rel = lms_true - p[:2]
        c, s = np.cos(p[2]), np.sin(p[2])
        R = np.array([[c, s], [-s, c]])
        local = rel @ R.T
        vis = np.linalg.norm(rel, axis=1) < 6.0
        if 0.0 < scale < 1.0:
            # drift accrues in a feature-poor corridor (no observations
            # while the odometry error ramps in)
            vis[:] = False
        if prev_est is None:
            delta = np.zeros(3)
        else:
            c2, s2 = np.cos(prev_est[2]), np.sin(prev_est[2])
            dd = est[:2] - prev_est[:2]
            delta = np.array([c2 * dd[0] + s2 * dd[1],
                              -s2 * dd[0] + c2 * dd[1],
                              est[2] - prev_est[2]])
        prev_est = est
        yield delta, local[vis]


@pytest.mark.parametrize("seed", [1, 2, 7])
def test_validated_tracking_closes_drifted_loop(seed):
    """~9 m of odometry drift accrued in a feature-poor corridor between
    loop passes: the constellation window proposal + warped validated
    absorb must merge the duplicated landmarks back to the true landmark
    count (without the basin-jump warp the fine solver stalls in a kinked
    stationary point and every true closure is rejected — measured)."""
    lms_true, path = _figure_world(seed)
    tr = FeatureTracker2D(Tracker2DConfig(
        odometry_is_good=True, optimize_each_n=0,
        incremental_guess_max_feature_distance=1.0,
        odom_info=(10.0, 10.0, 100.0)))
    stats = run_validated_tracking(
        tr, _frames(lms_true, path),
        ValidatedSlamConfig(solve_every=20, propose_every=10, window=30,
                            old_age=25, drift_base=15.0, min_inliers=4),
    )
    finish_window_closures(tr, window=30, step=15, old_age=25, radius=30.0,
                           min_inliers=4)
    n = int(tr.lm_alive.sum())
    assert n <= len(lms_true) + 1  # duplicates merged
    assert stats["closures"] >= 1
    # the merged graph is consistent: per-edge chi2 at noise level
    assert float(np.median(tr.obs_edge_chi2())) < 1.0


def test_absorb_closure_rejects_poison_batch():
    """A batch merging two landmarks that are genuinely ~8 m apart must be
    rolled back by the chi2 gate, leaving the map untouched."""
    lms_true, path = _figure_world(seed=5)
    tr = FeatureTracker2D(Tracker2DConfig(
        odometry_is_good=True, optimize_each_n=0,
        incremental_guess_max_feature_distance=1.0))
    for delta, obs in _frames(lms_true, path, loops=1, drift_from=10 ** 9):
        tr.process_frame(delta, obs)
    tr.cfg.global_solver = "control"
    chi2 = tr.optimize(local=False, iters=15)
    alive = np.where(tr.lm_alive)[0]
    P = tr.landmarks[alive]
    d2 = np.sum((P[:, None] - P[None, :]) ** 2, -1)
    iu, ju = np.triu_indices(len(alive), 1)
    far = np.argmax(d2[iu, ju] > 64.0)  # first pair > 8 m apart
    la, lb = int(alive[iu[far]]), int(alive[ju[far]])
    before = int(tr.lm_alive.sum())
    n_acc, c2, ns = absorb_closure(tr, [(la, lb)], chi2_gate=chi2 + 50.0)
    assert n_acc == 0 and c2 is None
    assert int(tr.lm_alive.sum()) == before  # rolled back


def test_snapshot_restore_roundtrip():
    lms_true, path = _figure_world(seed=7)
    tr = FeatureTracker2D(Tracker2DConfig(optimize_each_n=0))
    for delta, obs in _frames(lms_true, path, loops=1, drift_from=10 ** 9):
        tr.process_frame(delta, obs)
    snap = tr.snapshot()
    n_lms = int(tr.lm_alive.sum())
    n_obs = len(tr.obs_edges)
    alive = np.where(tr.lm_alive)[0]
    tr._merge_landmarks(int(alive[0]), int(alive[1]))
    tr.poses[0] = tr.poses[0] + 5.0
    tr.restore(snap)
    assert int(tr.lm_alive.sum()) == n_lms
    assert len(tr.obs_edges) == n_obs
    np.testing.assert_allclose(tr.trajectory()[0], snap[0][0])


def test_split_inconsistent_landmarks_separates_chimera():
    """Force-merge two distant landmarks, leave poses at truth: the split
    pass must separate the chimera back into two clusters."""
    lms_true, path = _figure_world(seed=11)
    tr = FeatureTracker2D(Tracker2DConfig(
        odometry_is_good=True, optimize_each_n=0,
        incremental_guess_max_feature_distance=1.0))
    for delta, obs in _frames(lms_true, path, loops=1, drift_from=10 ** 9):
        tr.process_frame(delta, obs)
    alive = np.where(tr.lm_alive)[0]
    P = tr.landmarks[alive]
    d2 = np.sum((P[:, None] - P[None, :]) ** 2, -1)
    iu, ju = np.triu_indices(len(alive), 1)
    far = np.argmax(d2[iu, ju] > 64.0)
    la, lb = int(alive[iu[far]]), int(alive[ju[far]])
    tr._merge_landmarks(la, lb)  # chimera: obs of both now target la
    before = int(tr.lm_alive.sum())
    ns = tr.split_inconsistent_landmarks(spread_gate=3.0, cluster_eps=2.0)
    assert ns >= 1
    assert int(tr.lm_alive.sum()) == before + ns
