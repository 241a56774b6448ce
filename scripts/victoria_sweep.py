"""Victoria unknown-DA association experiments (round-4 tuning harness).

Runs the eval_victoria pipeline with knobs so association variants can be
compared quickly on a prefix. Usage:
    python scripts/victoria_sweep.py --frames 1000 --variant mahal
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

DATA = "/root/reference/datasets/2D"


def _rel_np(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    d = b[:2] - a[:2]
    dth = (b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi
    return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1], dth],
                    np.float32)


def run(frames, variant, global_every, drift_sigma, drift_cap, eucl_cap,
        chi2_gate, huber, seed=0):
    from g2o_frontend_tpu.graph.store import graph2d_from_log
    from g2o_frontend_tpu.io.g2o import read_g2o
    from g2o_frontend_tpu.slam.feature_tracker import (FeatureTracker2D,
                                                       Tracker2DConfig)
    from g2o_frontend_tpu.solvers.control import control_optimize_se2
    from g2o_frontend_tpu.utils.evaluation import ate_xy

    log = read_g2o(os.path.join(DATA, "victoriaPark-noassoc.g2o.gz"))
    n_frames = min(frames, len(log.se2_ids))
    log_full = read_g2o(os.path.join(DATA, "victoriaPark-full.g2o.gz"))
    g_full, _ = graph2d_from_log(log_full)
    ctl = control_optimize_se2(g_full, max_iters=150)
    ref_traj = ctl["poses"][:n_frames]

    feats = {}
    for row in log.features:
        feats.setdefault(int(row[0]), []).append(row[1:3])
    n_obs_total = sum(len(v) for v in feats.values())

    tr = FeatureTracker2D(
        Tracker2DConfig(
            loop_landmark_merge_distance=2.0,
            local_map_size=50,
            incremental_guess_max_feature_distance=2.0,
            incremental_ransac_inlier_threshold=1.0,
            loop_guess_max_feature_distance=60.0,
            loop_ransac_inlier_threshold=2.0,
            odometry_is_good=True,
            global_optimize_iters=30,
            cg_iters=150,
            huber_delta=huber,
            mahal_drift_sigma=drift_sigma,
            mahal_drift_cap=(drift_cap if drift_cap is not None else 1.5),
            mahal_eucl_cap=eucl_cap,
            mahal_chi2_gate=chi2_gate,
            reserve_poses=n_frames,
            reserve_landmarks=400,
            reserve_odom_edges=n_frames,
            reserve_obs_edges=int(1.3 * n_obs_total),
            seed=seed,
        )
    )
    prev = None
    t0 = time.perf_counter()
    for k in range(n_frames):
        vid = int(log.se2_ids[k])
        pose = log.se2_poses[k]
        delta = (np.zeros(3, np.float32) if prev is None
                 else _rel_np(np.asarray(prev), np.asarray(pose)))
        prev = pose
        obs = np.asarray(feats.get(vid, np.zeros((0, 2))), np.float32)
        tr.process_frame(delta, obs)
        if (k + 1) % 50 == 0:
            tr.close_loops()
        if global_every and (k + 1) % global_every == 0:
            tr.optimize(local=False, iters=5)
            if variant == "mahal":
                tr.refresh_landmark_covariances()
    t_track = time.perf_counter() - t0
    chi2 = 0.0
    for _ in range(2):
        tr.merge_nearby_landmarks()
        tr.close_loops()
        chi2 = tr.optimize(local=False)
    for gate in (9.21, 16.0):
        m = tr.merge_landmarks_mahalanobis(chi2_gate=gate,
                                           prefilter_distance=12.0)
        moved = tr.reassociate(gate=1.5)
        chi2 = tr.optimize(local=False)
        if m == 0 and moved == 0:
            break
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=1.5)
    tr.cfg.global_solver = "schur"
    chi2 = tr.optimize(local=False, iters=40)
    wall = time.perf_counter() - t0

    est = tr.trajectory()[: len(ref_traj)]
    res = ate_xy(est[:, :2], ref_traj[:, :2])
    odo = ate_xy(log.se2_poses[: len(ref_traj), :2], ref_traj[:, :2])
    out = {
        "variant": variant, "frames": n_frames,
        "landmarks": int(tr.lm_alive.sum()),
        "chi2": float(chi2),
        "ate": float(res["rmse"]), "ate_odo": float(odo["rmse"]),
        "wall_s": round(wall, 1),
        "wall_track_s": round(t_track, 1),
        "global_every": global_every,
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--variant", default="mahal")  # mahal | eucl | none
    ap.add_argument("--global-every", type=int, default=500)
    ap.add_argument("--drift-sigma", type=float, default=0.05)
    ap.add_argument("--drift-cap", type=float, default=None)
    ap.add_argument("--eucl-cap", type=float, default=10.0)
    ap.add_argument("--chi2-gate", type=float, default=9.21)
    ap.add_argument("--huber", type=float, default=None)
    args = ap.parse_args()
    ge = 0 if args.variant == "none" else args.global_every
    run(args.frames, args.variant, ge, args.drift_sigma, args.drift_cap,
        args.eucl_cap, args.chi2_gate, args.huber)
