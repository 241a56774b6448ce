"""Victoria finish-phase experiments from a saved tracker state.

Tracking (41 s) is deterministic for the 'none' variant; the finish phase is
where ATE/landmark quality is decided. Save the post-tracking state once,
then iterate finish strategies quickly:

    python scripts/victoria_finish.py --save            # track once
    python scripts/victoria_finish.py --strategy em6    # try a finish
"""
import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

DATA = "/root/reference/datasets/2D"
STATE = "/tmp/victoria_tracked.pkl"


def _rel_np(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    d = b[:2] - a[:2]
    dth = (b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi
    return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1], dth],
                    np.float32)


def make_tracker(n_frames, n_obs_total):
    from g2o_frontend_tpu.slam.feature_tracker import (FeatureTracker2D,
                                                       Tracker2DConfig)

    return FeatureTracker2D(
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
            reserve_poses=n_frames,
            reserve_landmarks=400,
            reserve_odom_edges=n_frames,
            reserve_obs_edges=int(1.3 * n_obs_total),
        )
    )


def track(frames=6969):
    from g2o_frontend_tpu.io.g2o import read_g2o

    log = read_g2o(os.path.join(DATA, "victoriaPark-noassoc.g2o.gz"))
    n_frames = min(frames, len(log.se2_ids))
    feats = {}
    for row in log.features:
        feats.setdefault(int(row[0]), []).append(row[1:3])
    n_obs_total = sum(len(v) for v in feats.values())
    tr = make_tracker(n_frames, n_obs_total)
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
    wall = time.perf_counter() - t0
    state = {
        "poses": [np.asarray(p) for p in tr.poses],
        "landmarks": tr.landmarks, "lm_alive": tr.lm_alive,
        "lm_seen": tr.lm_seen, "odom_edges": tr.odom_edges,
        "obs_edges": tr.obs_edges, "frame": tr.frame,
        "n_frames": n_frames, "n_obs_total": n_obs_total,
        "wall_track_s": wall,
    }
    with open(STATE, "wb") as fh:
        pickle.dump(state, fh)
    print(f"tracked {n_frames} frames in {wall:.1f}s; "
          f"landmarks={int(tr.lm_alive.sum())}", flush=True)


def load_tracker():
    with open(STATE, "rb") as fh:
        st = pickle.load(fh)
    tr = make_tracker(st["n_frames"], st["n_obs_total"])
    tr.poses = list(st["poses"])
    tr.landmarks = st["landmarks"].copy()
    tr.lm_alive = st["lm_alive"].copy()
    tr.lm_seen = st["lm_seen"].copy()
    tr.odom_edges = list(st["odom_edges"])
    tr.obs_edges = list(st["obs_edges"])
    tr.frame = st["frame"]
    return tr, st


def evaluate(tr, st, chi2, wall_finish, label):
    from g2o_frontend_tpu.graph.store import graph2d_from_log
    from g2o_frontend_tpu.io.g2o import read_g2o
    from g2o_frontend_tpu.solvers.control import control_optimize_se2
    from g2o_frontend_tpu.utils.evaluation import ate_xy

    log_full = read_g2o(os.path.join(DATA, "victoriaPark-full.g2o.gz"))
    g_full, _ = graph2d_from_log(log_full)
    ctl = control_optimize_se2(g_full, max_iters=150)
    ref = ctl["poses"][: st["n_frames"]]
    est = tr.trajectory()[: len(ref)]
    res = ate_xy(est[:, :2], ref[:, :2])
    # landmark-set diagnostics vs the true landmark positions: align our
    # map to the reference with the ATE SE2 fit, then match landmarks
    from g2o_frontend_tpu.ransac.solvers import fit_se2_points
    import jax.numpy as jnp

    n = min(len(est), len(ref))
    x = np.asarray(fit_se2_points(
        jnp.asarray(ref[:n, :2], jnp.float32),
        jnp.asarray(est[:n, :2], jnp.float32),
        jnp.ones(n, jnp.float32)))
    c, s = np.cos(x[2]), np.sin(x[2])
    R = np.array([[c, -s], [s, c]], np.float32)
    ours = tr.landmarks[tr.lm_alive] @ R.T + x[:2]
    true_lms = ctl["landmarks"][
        np.asarray(g_full.landmark_mask)[: len(ctl["landmarks"])]
    ]
    d2 = np.sum((ours[:, None] - true_lms[None, :]) ** 2, -1)
    nearest = d2.argmin(1)
    near_ok = d2.min(1) < 2.0 ** 2
    matched_true = set(nearest[near_ok].tolist())
    counts = np.bincount(nearest[near_ok], minlength=len(true_lms))
    out = {
        "strategy": label,
        "landmarks": int(tr.lm_alive.sum()),
        "chi2": float(chi2),
        "ate": round(float(res["rmse"]), 2),
        "wall_track_s": round(st["wall_track_s"], 1),
        "wall_finish_s": round(wall_finish, 1),
        "true_landmarks": int(len(true_lms)),
        "true_matched": len(matched_true),
        "true_duplicated": int((counts > 1).sum()),
        "dup_excess": int((counts[counts > 1] - 1).sum()),
        "orphans": int((~near_ok).sum()),
    }
    print(json.dumps(out), flush=True)
    # per-frame error percentile profile (where does the ATE live?)
    err = np.linalg.norm(est[:n, :2] @ R.T + x[:2] - ref[:n, :2], axis=1)
    qs = np.percentile(err, [50, 75, 90, 99])
    print(f"  err p50={qs[0]:.1f} p75={qs[1]:.1f} p90={qs[2]:.1f} "
          f"p99={qs[3]:.1f} max={err.max():.1f} "
          f"argmax_frame={int(err.argmax())}", flush=True)
    return out


def finish_r3(tr):
    """The r4-sweep budgeted finish (baseline)."""
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
    return tr.optimize(local=False, iters=40)


def finish_em6(tr, seg_gate=12.0, rounds=6, opt_iters=8):
    """Segment-RANSAC global closure sweep EM: close_loops_global handles
    coherent multi-meter drift that NN gates cannot."""
    tr.merge_nearby_landmarks()
    tr.close_loops()
    chi2 = tr.optimize(local=False, iters=12)
    for r in range(rounds):
        m = tr.close_loops_global(segment=250, gate=seg_gate,
                                  inlier_threshold=0.6)
        m += tr.merge_landmarks_mahalanobis(chi2_gate=9.21,
                                            prefilter_distance=12.0)
        moved = tr.reassociate(gate=1.5)
        chi2 = tr.optimize(local=False, iters=opt_iters)
        if m == 0 and moved == 0:
            break
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=1.5)
    tr.cfg.global_solver = "schur"
    return tr.optimize(local=False, iters=25)


def finish_em7(tr):
    """Descending-gate EM with early Schur geometry: the Schur solver's
    basin is far below PCG's on this chain+arrow graph, so running it
    before the later merge rounds gives the merges better geometry."""
    t0 = time.perf_counter()
    tr.merge_nearby_landmarks()
    tr.close_loops()
    chi2 = tr.optimize(local=False, iters=12)
    print(f"  [t={time.perf_counter()-t0:.0f}s] initial opt chi2={chi2:.0f} "
          f"lms={int(tr.lm_alive.sum())}", flush=True)
    for r, gate in enumerate((20.0, 14.0, 10.0, 7.0, 5.0)):
        m = tr.close_loops_global(segment=250, gate=gate,
                                  inlier_threshold=0.8)
        m += tr.merge_landmarks_mahalanobis(chi2_gate=9.21,
                                            prefilter_distance=12.0)
        moved = tr.reassociate(gate=1.5)
        if r == 1:
            tr.cfg.global_solver = "schur"
        iters = 12 if r < 2 else 10
        chi2 = tr.optimize(local=False, iters=iters)
        print(f"  [t={time.perf_counter()-t0:.0f}s] round {r} gate={gate} "
              f"merged={m} moved={moved} chi2={chi2:.0f} "
              f"lms={int(tr.lm_alive.sum())}", flush=True)
        if m == 0 and moved == 0 and r >= 2:
            break
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=1.5)
    chi2 = tr.optimize(local=False, iters=25)
    print(f"  [t={time.perf_counter()-t0:.0f}s] final chi2={chi2:.0f}",
          flush=True)
    return chi2


def finish_em6b(tr):
    """em6 with finer segments (120 poses): a rigid SE2 per segment fits
    the bent trajectory better locally, catching matches the 250-pose
    segments miss."""
    tr.merge_nearby_landmarks()
    tr.close_loops()
    chi2 = tr.optimize(local=False, iters=12)
    for r in range(8):
        m = tr.close_loops_global(segment=120, gate=15.0,
                                  inlier_threshold=0.6)
        m += tr.merge_landmarks_mahalanobis(chi2_gate=9.21,
                                            prefilter_distance=12.0)
        moved = tr.reassociate(gate=1.5)
        chi2 = tr.optimize(local=False, iters=8)
        print(f"  round {r}: merged={m} moved={moved} chi2={chi2:.0f} "
              f"lms={int(tr.lm_alive.sum())}", flush=True)
        if m == 0 and moved == 0:
            break
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=1.5)
    tr.cfg.global_solver = "schur"
    return tr.optimize(local=False, iters=30)


def finish_em6h(tr):
    """em6 with a Huber kernel on the global solves: ground-truth-DA gives
    ATE~0, and our chi2 sits 10x above the full graph's optimum — wrong
    merge constraints are fighting the odometry; robustify them away."""
    tr.cfg.huber_delta = 2.0
    chi2 = finish_em6(tr)
    return tr.optimize(local=False, iters=30)


def _snapshot(tr):
    return (list(np.asarray(p) for p in tr.poses), tr.landmarks.copy(),
            tr.lm_alive.copy(), tr.lm_seen.copy(), list(tr.obs_edges))


def _rollback(tr, snap):
    tr.poses, tr.landmarks, tr.lm_alive, tr.lm_seen, tr.obs_edges = (
        list(snap[0]), snap[1].copy(), snap[2].copy(), snap[3].copy(),
        list(snap[4]))


def finish_em6c(tr):
    """Rollback-validated EM (the map_closer consensus-validation idea at
    merge-round granularity): a round of merges is ACCEPTED only if the
    optimized graph's chi2 stays within a factor of the pre-round chi2 —
    wrong merge batches (the em6b 157k->487k creep) get rolled back and the
    gate tightens instead."""
    tr.merge_nearby_landmarks()
    tr.close_loops()
    chi2 = tr.optimize(local=False, iters=12)
    for gate in (12.0, 12.0, 8.0, 8.0, 5.0, 5.0, 3.0, 3.0):
        snap = _snapshot(tr)
        chi2_before = chi2
        m = tr.close_loops_global(segment=250, gate=gate,
                                  inlier_threshold=0.6)
        m += tr.merge_landmarks_mahalanobis(chi2_gate=9.21,
                                            prefilter_distance=12.0)
        moved = tr.reassociate(gate=1.5)
        if not (m or moved):
            continue
        chi2 = tr.optimize(local=False, iters=10)
        if chi2 > 1.35 * chi2_before + 1e4:
            _rollback(tr, snap)
            chi2 = chi2_before
            print(f"  gate={gate}: ROLLBACK (chi2 {chi2_before:.0f} -> "
                  f"rejected)", flush=True)
        else:
            print(f"  gate={gate}: merged={m} moved={moved} "
                  f"chi2={chi2:.0f} lms={int(tr.lm_alive.sum())}",
                  flush=True)
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=1.5)
    tr.cfg.global_solver = "schur"
    return tr.optimize(local=False, iters=30)


def _prune_bad_obs(tr, chi2_gate=500.0):
    """Drop observation edges whose chi2 at the current estimate exceeds
    the gate (switchable-constraints-lite: at a fixed point, true closures
    have small residuals, wrong merges large ones)."""
    poses = np.asarray(tr.poses)
    kept, dropped = [], 0
    for (p, l, z, w) in tr.obs_edges:
        xp = poses[p]
        c, s = np.cos(xp[2]), np.sin(xp[2])
        d = tr.landmarks[l] - xp[:2]
        e = np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1]]) - z
        if float(e @ w @ e) > chi2_gate:
            dropped += 1
        else:
            kept.append((p, l, z, w))
    tr.obs_edges = kept
    return dropped


def finish_em6d(tr):
    """em6c + residual-gated pruning of the surviving wrong constraints."""
    chi2 = finish_em6c(tr)
    for r in range(3):
        dropped = _prune_bad_obs(tr, chi2_gate=500.0)
        moved = tr.reassociate(gate=1.5)
        tr.cull_weak_landmarks(min_obs=2)
        chi2 = tr.optimize(local=False, iters=15)
        print(f"  prune round {r}: dropped={dropped} moved={moved} "
              f"chi2={chi2:.0f} lms={int(tr.lm_alive.sum())}", flush=True)
        if dropped == 0 and moved == 0:
            break
    return chi2


STRATEGIES = {"r3": finish_r3, "em6": finish_em6, "em7": finish_em7,
              "em6h": finish_em6h, "em6b": finish_em6b,
              "em6c": finish_em6c, "em6d": finish_em6d}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--frames", type=int, default=6969)
    ap.add_argument("--strategy", default="em6")
    args = ap.parse_args()
    if args.save:
        track(args.frames)
    else:
        tr, st = load_tracker()
        t0 = time.perf_counter()
        chi2 = STRATEGIES[args.strategy](tr)
        evaluate(tr, st, chi2, time.perf_counter() - t0, args.strategy)
