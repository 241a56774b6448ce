"""2D unknown-data-association SLAM tests (synthetic world + bundled data).

Synthetic fixture follows the reference's GraphSimulator pattern
(``graph_merge/graph_simulator.h:18-108``): planted landmark world, noisy
odometry, range-limited observations WITHOUT ids; the tracker must rebuild
the map and beat raw odometry."""
import os

import numpy as np
import pytest

from g2o_frontend_tpu.slam.feature_tracker import FeatureTracker2D, Tracker2DConfig

DATA = "/root/reference/datasets/2D"
rng = np.random.default_rng(5)


def simulate_world(n_frames=60, n_lm=40, sense_range=4.0, odom_noise=0.02):
    lms = rng.uniform(-8, 8, (n_lm, 2)).astype(np.float32)
    poses = []
    x = np.zeros(3, np.float32)
    deltas, obs_per_frame = [], []
    for k in range(n_frames):
        poses.append(x.copy())
        # observations in robot frame
        c, s = np.cos(x[2]), np.sin(x[2])
        R = np.array([[c, s], [-s, c]], np.float32)  # world->robot
        rel = (lms - x[:2]) @ R.T
        dist = np.linalg.norm(rel, axis=1)
        vis = dist < sense_range
        obs = rel[vis] + rng.normal(0, 0.01, (vis.sum(), 2)).astype(np.float32)
        obs_per_frame.append(obs.astype(np.float32))
        # move along a circle
        true_delta = np.array([0.5, 0.0, 2 * np.pi / n_frames], np.float32)
        noisy = true_delta + rng.normal(0, odom_noise, 3).astype(np.float32)
        deltas.append(noisy)
        # integrate TRUE motion for ground truth
        c, s = np.cos(x[2]), np.sin(x[2])
        x = np.array(
            [
                x[0] + c * true_delta[0] - s * true_delta[1],
                x[1] + s * true_delta[0] + c * true_delta[1],
                x[2] + true_delta[2],
            ],
            np.float32,
        )
    return np.asarray(poses), lms, deltas, obs_per_frame


class TestFeatureTracker:
    def test_synthetic_slam_beats_odometry(self):
        gt, lms, deltas, obs = simulate_world()
        cfg = Tracker2DConfig(min_landmark_creation_frames=2, optimize_each_n=10)
        tr = FeatureTracker2D(cfg)
        for k in range(len(gt)):
            d = np.zeros(3, np.float32) if k == 0 else deltas[k - 1]
            tr.process_frame(d, obs[k])
        tr.optimize(local=False)
        st = tr.stats()
        # landmark count should be in the ballpark of the true world
        assert st["n_landmarks"] >= 0.6 * len(lms), st
        assert st["n_landmarks"] <= 1.8 * len(lms), st

        est = tr.trajectory()[: len(gt)]
        err_slam = np.sqrt(np.mean(np.sum((est[:, :2] - gt[:, :2]) ** 2, -1)))

        # raw odometry trajectory for comparison
        x = np.zeros(3, np.float32)
        odo = [x.copy()]
        for dlt in deltas[:-1]:
            c, s = np.cos(x[2]), np.sin(x[2])
            x = np.array(
                [x[0] + c * dlt[0] - s * dlt[1], x[1] + s * dlt[0] + c * dlt[1], x[2] + dlt[2]],
                np.float32,
            )
            odo.append(x.copy())
        odo = np.asarray(odo)
        err_odo = np.sqrt(np.mean(np.sum((odo[:, :2] - gt[:, :2]) ** 2, -1)))
        assert err_slam < 0.7 * err_odo, (err_slam, err_odo)
        assert err_slam < 0.3, err_slam

    def test_landmark_merge(self):
        tr = FeatureTracker2D()
        tr.landmarks = np.array([[0, 0], [0.1, 0.0], [5, 5]], np.float32)
        tr.lm_alive = np.array([True, True, True])
        tr.lm_seen = np.array([3, 2, 1], np.int32)
        tr.obs_edges = [(0, 1, np.zeros(2, np.float32), np.eye(2, dtype=np.float32))]
        merged = tr.merge_nearby_landmarks(distance=0.5)
        assert merged == 1
        assert tr.lm_alive.sum() == 2
        # edge re-targeted to the kept landmark
        assert tr.obs_edges[0][1] == 0

    def test_reassociate_retargets_and_kills_orphans(self):
        tr = FeatureTracker2D()
        tr.poses = [np.zeros(3, np.float32)]
        # lm 1 is a drift-duplicate of lm 0; lm 2 is far away
        tr.landmarks = np.array([[1, 0], [1.3, 0.0], [5, 5]], np.float32)
        tr.lm_alive = np.array([True, True, True])
        tr.lm_seen = np.array([2, 1, 1], np.int32)
        I = np.eye(2, dtype=np.float32)
        # observation at world (1.05, 0) currently bound to lm 1 — nearest
        # alive landmark is lm 0
        tr.obs_edges = [
            (0, 1, np.array([1.05, 0.0], np.float32), I),
            (0, 2, np.array([5.0, 5.0], np.float32), I),
        ]
        moved = tr.reassociate(gate=1.0)
        assert moved == 1
        assert tr.obs_edges[0][1] == 0
        assert tr.obs_edges[1][1] == 2
        # lm 1 lost its only observation -> killed
        assert not tr.lm_alive[1]
        assert tr.lm_alive[0] and tr.lm_alive[2]

    def test_mahalanobis_merge_respects_uncertainty(self):
        """The covariance gate must merge drift-separated duplicates (large
        correlated uncertainty between distant chain segments) while keeping
        equally-spaced but tightly-co-observed landmarks apart — the double
        failure mode of the Euclidean loopLandmarkMergeDistance gate."""
        tr = FeatureTracker2D()
        n = 21
        tr.poses = [np.array([0.3 * i, 0.0, 0.0], np.float32)
                    for i in range(n)]
        # weak odometry: sigma ~0.2 m/step -> ~0.8 m drift std over 15 steps
        Wo = np.diag([25.0, 25.0, 100.0]).astype(np.float32)
        tr.odom_edges = [
            (i, i + 1, np.array([0.3, 0.0, 0.0], np.float32), Wo)
            for i in range(n - 1)
        ]
        # A (lm 0) seen early, B (lm 1) = same tree re-entered 0.8 m off
        # after drift; C (lm 2) and D (lm 3) also 0.8 m apart but co-observed
        # from the same early poses (tight relative covariance)
        tr.landmarks = np.array(
            [[2.0, 1.0], [2.8, 1.0], [4.0, -1.0], [4.8, -1.0]], np.float32)
        tr.lm_alive = np.ones(4, bool)
        tr.lm_seen = np.array([6, 6, 6, 6], np.int32)
        Wm = (np.eye(2) * 100.0).astype(np.float32)  # sigma_meas = 0.1

        def local(p_idx, lm):
            d = tr.landmarks[lm] - np.asarray(tr.poses[p_idx][:2])
            return d.astype(np.float32)  # theta = 0 everywhere

        tr.obs_edges = (
            [(p, 0, local(p, 0), Wm) for p in range(0, 6)]
            + [(p, 1, local(p, 1), Wm) for p in range(15, 21)]
            + [(p, 2, local(p, 2), Wm) for p in range(0, 6)]
            + [(p, 3, local(p, 3), Wm) for p in range(0, 6)]
        )
        merged = tr.merge_landmarks_mahalanobis()
        assert merged == 1, merged
        assert not (tr.lm_alive[0] and tr.lm_alive[1])  # A/B merged
        assert tr.lm_alive[2] and tr.lm_alive[3]  # C/D kept distinct

    def test_close_loops_global_merges_drifted_duplicates(self):
        """Two copies of one constellation, offset by a rigid drift larger
        than any nearest-neighbour merge distance, must be merged by the
        RANSAC segment sweep."""
        rng_l = np.random.default_rng(3)
        base = rng_l.uniform(-3, 3, (12, 2)).astype(np.float32)
        drift = np.array([1.5, -0.8], np.float32)
        tr = FeatureTracker2D()
        # 40 poses: first 20 observe `base`, last 20 observe base+drift
        tr.poses = [np.zeros(3, np.float32) for _ in range(40)]
        tr.landmarks = np.concatenate([base, base + drift]).astype(np.float32)
        tr.lm_alive = np.ones(24, bool)
        tr.lm_seen = np.ones(24, np.int32)
        I = np.eye(2, dtype=np.float32)
        tr.obs_edges = [(p, l, tr.landmarks[l].copy(), I)
                        for p in range(0, 20) for l in range(12)]
        tr.obs_edges += [(p, l, tr.landmarks[l].copy(), I)
                         for p in range(20, 40) for l in range(12, 24)]
        merged = tr.close_loops_global(segment=20, gate=4.0,
                                       inlier_threshold=0.3)
        assert merged >= 10, merged
        assert tr.lm_alive.sum() <= 14


@pytest.mark.skipif(not os.path.isdir(DATA), reason="datasets missing")
class TestBundledNoassoc:
    def test_world2000_noassoc_runs(self):
        """BASELINE config 2: unknown-association world-2000 dataset."""
        from g2o_frontend_tpu.io.g2o import read_g2o
        from g2o_frontend_tpu.utils import lie
        import jax.numpy as jnp

        log = read_g2o(os.path.join(DATA, "world-2000-noassoc.g2o.gz"))
        n_frames = 120  # subset for test speed
        # group features by vertex
        feats = {}
        for row in log.features:
            feats.setdefault(int(row[0]), []).append(row[1:3])
        cfg = Tracker2DConfig(
            min_landmark_creation_frames=1,
            incremental_ransac_inlier_threshold=0.5,
            loop_landmark_merge_distance=0.5,
            local_map_size=10,
            optimize_each_n=10,
        )
        tr = FeatureTracker2D(cfg)
        prev = None
        for k in range(n_frames):
            vid = int(log.se2_ids[k])
            pose = log.se2_poses[k]
            if prev is None:
                delta = np.zeros(3, np.float32)
            else:
                delta = np.asarray(
                    lie.se2_relative(
                        jnp.asarray(prev, jnp.float32), jnp.asarray(pose, jnp.float32)
                    )
                )
            prev = pose
            obs = np.asarray(feats.get(vid, np.zeros((0, 2))), np.float32)
            tr.process_frame(delta, obs)
        chi2 = tr.optimize(local=False)
        st = tr.stats()
        assert st["n_poses"] == n_frames
        assert st["n_landmarks"] > 5, st
        assert np.isfinite(chi2)
        # trajectory should stay close to the (good) dataset odometry
        est = tr.trajectory()
        ref = log.se2_poses[:n_frames]
        rmse = np.sqrt(np.mean(np.sum((est[:, :2] - ref[:, :2]) ** 2, -1)))
        assert rmse < 1.0, rmse


def test_mahalanobis_association_gate():
    """Drift-elongated covariance gates IN a distant duplicate while a
    tight covariance gates OUT a nearer distinct landmark (the failure
    modes of the Euclidean gate, in both directions)."""
    import jax.numpy as jnp

    from g2o_frontend_tpu.slam.feature_tracker import _associate_nn_mahal

    obs = jnp.asarray([[3.0, 0.0]])
    obs_mask = jnp.asarray([True])
    lms = jnp.asarray([[0.0, 0.0], [3.0, 1.2]])
    lm_mask = jnp.asarray([True, True])
    # lm0: huge covariance along x (drift direction) -> obs 3 m away is
    # statistically the same point; lm1: tight covariance -> 1.2 m is >3sigma
    Sinv = jnp.asarray(np.stack([
        np.linalg.inv(np.diag([4.0, 0.04])),
        np.linalg.inv(np.diag([0.04, 0.04])),
    ]).astype(np.float32))
    m, d = _associate_nn_mahal(obs, obs_mask, lms, lm_mask, Sinv,
                               9.21, 10.0)
    assert int(m[0]) == 0  # matches the elongated-covariance landmark
    # with only the tight landmark available, the 1.2 m match is rejected
    m2, _ = _associate_nn_mahal(obs, obs_mask, lms,
                                jnp.asarray([False, True]), Sinv, 9.21, 10.0)
    assert int(m2[0]) == -1


def test_refresh_landmark_covariances_feeds_association():
    """After a covariance refresh the tracker uses the Mahalanobis gate and
    still associates repeat observations of the same landmarks."""
    from g2o_frontend_tpu.slam.feature_tracker import (FeatureTracker2D,
                                                       Tracker2DConfig)

    rng = np.random.default_rng(0)
    lms_gt = np.array([[2.0, 1.0], [3.0, -1.5], [5.0, 0.5], [1.0, -1.0]])
    tr = FeatureTracker2D(Tracker2DConfig(min_landmark_creation_frames=1,
                                          optimize_each_n=0))
    pose = np.zeros(3)
    for k in range(6):
        delta = np.array([0.3, 0.0, 0.02], np.float32) if k else np.zeros(3)
        if k:
            c, s = np.cos(pose[2]), np.sin(pose[2])
            pose = np.array([pose[0] + c * 0.3, pose[1] + s * 0.3,
                             pose[2] + 0.02])
        obs = []
        c, s = np.cos(pose[2]), np.sin(pose[2])
        R = np.array([[c, s], [-s, c]])
        for l in lms_gt:
            obs.append(R @ (l - pose[:2]) + rng.normal(0, 0.01, 2))
        tr.process_frame(delta, np.asarray(obs, np.float32))
        if k == 3:
            tr.optimize(local=False, iters=5)
            tr.refresh_landmark_covariances()
            assert tr.lm_cov is not None and len(tr.lm_cov) >= 4
    # no duplicates created after the refresh switched gates
    assert int(tr.lm_alive.sum()) == len(lms_gt), int(tr.lm_alive.sum())
