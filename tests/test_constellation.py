"""Constellation matcher: pose-free loop-closure proposal.

Oracle strategy: plant a known rigid SE2 between two partially-overlapping
landmark constellations (plus clutter) and require recovery of both the
transform and the correspondence set — the drift-tolerant candidate
detection role of ``slam/feature_tracker_closure.h:9-202`` /
``graph_merge/graph_matcher.h:19-66``.
"""
import numpy as np
import pytest

from g2o_frontend_tpu.slam.constellation import (
    match_constellations,
    segment_constellations,
)


def _apply(T, P):
    c, s = np.cos(T[2]), np.sin(T[2])
    R = np.array([[c, -s], [s, c]])
    return P @ R.T + T[:2]


def _planted(seed, n_shared=12, n_clutter_a=6, n_clutter_b=6,
             noise=0.05, T=(18.0, -11.0, 2.1)):
    rng = np.random.default_rng(seed)
    shared = rng.uniform(-15, 15, (n_shared, 2))
    T = np.asarray(T, np.float64)
    # B frame holds the shared landmarks as surveyed; A sees them through
    # the (drifted) inverse transform plus noise
    c, s = np.cos(T[2]), np.sin(T[2])
    R = np.array([[c, -s], [s, c]])
    A_shared = (shared - T[:2]) @ R  # inverse rigid map
    A = np.vstack([
        A_shared + rng.normal(0, noise, A_shared.shape),
        rng.uniform(-40, 40, (n_clutter_a, 2)),
    ])
    B = np.vstack([shared, rng.uniform(50, 90, (n_clutter_b, 2))])
    perm_a = rng.permutation(len(A))
    perm_b = rng.permutation(len(B))
    inv_a = np.argsort(perm_a)
    inv_b = np.argsort(perm_b)
    truth = {(int(inv_a[k]), int(inv_b[k])) for k in range(n_shared)}
    return A[perm_a], B[perm_b], T, truth


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_recovers_planted_transform_and_pairs(seed):
    A, B, T, truth = _planted(seed)
    m = match_constellations(A, B, dist_tol=0.3, inlier_threshold=0.5,
                             min_inliers=6, seed=seed)
    assert m.ok
    # transform parity
    assert np.hypot(*(m.transform[:2] - T[:2])) < 0.2
    dth = (m.transform[2] - T[2] + np.pi) % (2 * np.pi) - np.pi
    assert abs(dth) < 0.02
    found = set(m.pairs)
    assert len(found & truth) >= 10  # recovers nearly all shared landmarks
    assert not (found - truth)  # and invents none


def test_rejects_unrelated_constellations():
    rng = np.random.default_rng(7)
    A = rng.uniform(-20, 20, (15, 2))
    B = rng.uniform(-20, 20, (15, 2))
    m = match_constellations(A, B, dist_tol=0.15, inlier_threshold=0.3,
                             min_inliers=7)
    assert not m.ok


def test_rejects_too_small_input():
    m = match_constellations(np.zeros((3, 2)), np.zeros((20, 2)),
                             min_inliers=6)
    assert not m.ok


def test_segment_constellations_local_rigidity():
    """Per-segment landmark positions come from the segment's OWN
    observations: a landmark seen from two drift-separated segments gets a
    different position in each (local rigidity), not one global average."""
    # two segments of 2 poses; second segment's estimate drifted +10 in x
    poses = np.array([[0, 0, 0], [1, 0, 0], [12, 0, 0], [13, 0, 0]],
                     np.float64)
    # landmark 0 truly at (2, 1): seen from pose 0 (z=(2,1)) and from pose 2
    # whose TRUE x is 2 (z=(0,1)) — but the estimate says 12
    obs_edges = [
        (0, 0, np.array([2.0, 1.0]), None),
        (2, 0, np.array([0.0, 1.0]), None),
    ]
    alive = np.array([True])
    segs = segment_constellations(poses, obs_edges, alive, segment=2)
    assert len(segs) == 2
    ids0, pos0 = segs[0]
    ids1, pos1 = segs[1]
    assert list(ids0) == [0] and list(ids1) == [0]
    np.testing.assert_allclose(pos0[0], [2.0, 1.0], atol=1e-9)
    np.testing.assert_allclose(pos1[0], [12.0, 1.0], atol=1e-9)


def test_tracker_constellation_closure_merges_drifted_duplicates():
    """End-to-end through FeatureTracker2D: a figure-eight world where the
    revisit happens after injected odometry drift larger than every NN
    gate. The constellation sweep must find the revisit and merge the
    duplicated landmarks."""
    from g2o_frontend_tpu.slam.feature_tracker import (
        FeatureTracker2D,
        Tracker2DConfig,
    )

    rng = np.random.default_rng(3)
    lms_true = rng.uniform(-8, 8, (25, 2))
    tr = FeatureTracker2D(Tracker2DConfig(
        odometry_is_good=True, optimize_each_n=0,
        incremental_guess_max_feature_distance=1.0,
    ))

    def frame(pose_true, drift):
        pose_est = pose_true + drift
        rel = lms_true - pose_true[:2]
        c, s = np.cos(pose_true[2]), np.sin(pose_true[2])
        R = np.array([[c, s], [-s, c]])
        local = rel @ R.T
        vis = np.linalg.norm(rel, axis=1) < 6.0
        return pose_est, local[vis]

    # first pass around the loop (no drift), then revisit with a 15 m jump
    path = [np.array([np.cos(t) * 5, np.sin(t) * 5, t + np.pi / 2])
            for t in np.linspace(0, 2 * np.pi, 40, endpoint=False)]
    prev_est = None
    for k, p in enumerate(path * 2):
        drift = np.array([15.0, 9.0, 0.0]) if k >= 40 else np.zeros(3)
        est, obs = frame(p, drift)
        if prev_est is None:
            delta = np.zeros(3)
        else:
            c, s = np.cos(prev_est[2]), np.sin(prev_est[2])
            d = est[:2] - prev_est[:2]
            delta = np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1],
                              est[2] - prev_est[2]])
        prev_est = est
        tr.process_frame(delta, obs)

    n_before = int(tr.lm_alive.sum())
    assert n_before > 30  # duplicates exist (true world has 25)
    merged = tr.close_loops_constellation(
        segment=40, dist_tol=0.3, inlier_threshold=0.8, min_inliers=6)
    assert merged >= 5
    assert int(tr.lm_alive.sum()) <= n_before - 5
