"""world-1000-dense-highnoise recipe smoke (VERDICT r3 Next 6).

The params.txt recipe is tracker_test with ALL DEFAULT flags on the densest,
noisiest bundled world (1000 poses, 108,674 observations). The full-length
evaluation lives in scripts/evaluate.py --only world1000 (judged against the
reference tracker's own recorded output graph in the bundled *_default
file); this dataset-gated test runs the 300-frame prefix and gates the
association quality floor: the estimate must clearly beat raw odometry and
must not explode the landmark count.
"""
import os

import numpy as np
import pytest

DATA = "/root/reference/datasets/2D"


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference datasets missing")
def test_world1000_dense_highnoise_prefix():
    from g2o_frontend_tpu.graph.store import graph2d_from_log
    from g2o_frontend_tpu.io.g2o import read_g2o
    from g2o_frontend_tpu.slam.feature_tracker import (FeatureTracker2D,
                                                       Tracker2DConfig)
    from g2o_frontend_tpu.solvers.control import control_optimize_se2
    from g2o_frontend_tpu.utils.evaluation import ate_xy

    log = read_g2o(os.path.join(DATA, "world-1000-dense-highnoise.g2o.gz"))
    n_frames = 300
    log_ref = read_g2o(
        os.path.join(DATA, "world-1000-dense-highnoise_default.g2o.gz")
    )
    g_ref, _ = graph2d_from_log(log_ref)
    ctl = control_optimize_se2(g_ref, max_iters=40)
    ref_traj = ctl["poses"][:n_frames]

    feats = {}
    for row in log.features:
        feats.setdefault(int(row[0]), []).append(row[1:3])
    tr = FeatureTracker2D(Tracker2DConfig(
        incremental_ransac_inlier_threshold=0.3,
        local_map_size=5,
        optimize_each_n=5,
        min_landmark_creation_frames=3,
        reserve_poses=n_frames,
        reserve_landmarks=1024,
        reserve_odom_edges=n_frames,
        reserve_obs_edges=65536,
    ))

    def rel(a, b):
        c, s = np.cos(a[2]), np.sin(a[2])
        d = b[:2] - a[:2]
        dth = (b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi
        return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1], dth],
                        np.float32)

    prev = None
    for k in range(n_frames):
        vid = int(log.se2_ids[k])
        pose = log.se2_poses[k]
        delta = (np.zeros(3, np.float32) if prev is None
                 else rel(np.asarray(prev), np.asarray(pose)))
        prev = pose
        obs = np.asarray(feats.get(vid, np.zeros((0, 2))), np.float32)
        tr.process_frame(delta, obs)
        if (k + 1) % 50 == 0:
            tr.close_loops()
    for _ in range(2):
        tr.merge_nearby_landmarks(distance=0.8)
        tr.close_loops()
        chi2 = tr.optimize(local=False, iters=12)
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=1.0)
        chi2 = tr.optimize(local=False, iters=12)

    est = tr.trajectory()[: len(ref_traj)]
    res = ate_xy(est[:, :2], ref_traj[:, :2])
    odo = ate_xy(log.se2_poses[: len(ref_traj), :2], ref_traj[:, :2])
    # measured r4: ATE ~1.1 m vs odometry 3.3 m; landmarks ~515
    assert res["rmse"] < 0.6 * odo["rmse"], (res["rmse"], odo["rmse"])
    assert int(tr.lm_alive.sum()) <= 700, int(tr.lm_alive.sum())
    assert np.isfinite(chi2)
