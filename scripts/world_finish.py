"""world-1000/2000 finish-phase experiments from a saved tracker state.

Same pattern as victoria_finish.py: track once, iterate finish strategies.

    python scripts/world_finish.py --save [--dataset world1000]
    python scripts/world_finish.py --strategy em [--dataset world1000]
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
DATASETS = {
    # name -> (noassoc input, reference-tracker output, full-DA graph)
    "world1000": ("world-1000-dense-highnoise.g2o.gz",
                  "world-1000-dense-highnoise_default.g2o.gz", None),
    "world2000": ("world-2000-noassoc.g2o.gz", "world-2000-default.g2o.gz",
                  "world-2000-full.g2o.gz"),
    "world2000low": ("world-2000-lownoise-noassoc.g2o.gz",
                     "world-2000-lownoise-default.g2o.gz",
                     "world-2000-lownoise-full.g2o.gz"),
}


def _rel_np(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    d = b[:2] - a[:2]
    dth = (b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi
    return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1], dth],
                    np.float32)


def make_tracker(n_frames, n_obs_total, dataset):
    from g2o_frontend_tpu.slam.feature_tracker import (FeatureTracker2D,
                                                       Tracker2DConfig)

    if dataset == "world1000":
        # params.txt line 1: all tracker defaults
        cfg = Tracker2DConfig(
            incremental_ransac_inlier_threshold=0.3,
            local_map_size=5,
            optimize_each_n=5,
            min_landmark_creation_frames=3,
        )
    else:
        # params.txt world-2000 recipe: -odometryIsGood
        # -minLandmarkCreationFrames 0 -loopLandmarkMergeDistance 0.5
        # -localMapSize 10 -incrementalRansacInlierThreshold 0.5
        # -loopRansacInlierThreshold 0.2
        cfg = Tracker2DConfig(
            odometry_is_good=True,
            min_landmark_creation_frames=1,
            loop_landmark_merge_distance=0.5,
            local_map_size=10,
            optimize_each_n=10,
            incremental_ransac_inlier_threshold=0.5,
            loop_ransac_inlier_threshold=0.2,
        )
    cfg.reserve_poses = n_frames
    cfg.reserve_landmarks = 2048
    cfg.reserve_odom_edges = n_frames
    cfg.reserve_obs_edges = int(1.2 * n_obs_total)
    return FeatureTracker2D(cfg)


def state_path(dataset):
    return f"/tmp/{dataset}_tracked.pkl"


def track(dataset, frames=10 ** 9):
    from g2o_frontend_tpu.io.g2o import read_g2o

    noassoc = DATASETS[dataset][0]
    log = read_g2o(os.path.join(DATA, noassoc))
    n_frames = min(frames, len(log.se2_ids))
    feats = {}
    for row in log.features:
        feats.setdefault(int(row[0]), []).append(row[1:3])
    n_obs_total = sum(len(v) for v in feats.values())
    tr = make_tracker(n_frames, n_obs_total, dataset)
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
            tr.merge_nearby_landmarks(distance=0.3)
            tr.optimize(local=False, iters=3)
    wall = time.perf_counter() - t0
    st = {"poses": [np.asarray(p) for p in tr.poses],
          "landmarks": tr.landmarks, "lm_alive": tr.lm_alive,
          "lm_seen": tr.lm_seen, "odom_edges": tr.odom_edges,
          "obs_edges": tr.obs_edges, "frame": tr.frame,
          "n_frames": n_frames, "n_obs_total": n_obs_total,
          "wall_track_s": wall, "dataset": dataset}
    with open(state_path(dataset), "wb") as fh:
        pickle.dump(st, fh)
    print(f"tracked {n_frames} frames in {wall:.1f}s; "
          f"landmarks={int(tr.lm_alive.sum())}", flush=True)


def track_validated(dataset, frames=10 ** 9):
    """Victoria-style validated tracking: exact solves bound drift, window
    closures propose, chi2 gates verify (slam/validated_slam.py)."""
    from g2o_frontend_tpu.io.g2o import read_g2o
    from g2o_frontend_tpu.slam.validated_slam import (
        ValidatedSlamConfig, run_validated_tracking)

    noassoc = DATASETS[dataset][0]
    log = read_g2o(os.path.join(DATA, noassoc))
    n_frames = min(frames, len(log.se2_ids))
    feats = {}
    for row in log.features:
        feats.setdefault(int(row[0]), []).append(row[1:3])
    n_obs_total = sum(len(v) for v in feats.values())
    tr = make_tracker(n_frames, n_obs_total, dataset)

    def stream():
        prev = None
        for k in range(n_frames):
            vid = int(log.se2_ids[k])
            pose = log.se2_poses[k]
            delta = (np.zeros(3, np.float32) if prev is None
                     else _rel_np(np.asarray(prev), np.asarray(pose)))
            prev = pose
            yield delta, np.asarray(feats.get(vid, np.zeros((0, 2))),
                                    np.float32)

    t0 = time.perf_counter()
    stats = run_validated_tracking(tr, stream(), ValidatedSlamConfig(),
                                   log=print)
    wall = time.perf_counter() - t0
    st = {"poses": [np.asarray(p) for p in tr.poses],
          "landmarks": tr.landmarks, "lm_alive": tr.lm_alive,
          "lm_seen": tr.lm_seen, "odom_edges": tr.odom_edges,
          "obs_edges": tr.obs_edges, "frame": tr.frame,
          "n_frames": n_frames, "n_obs_total": n_obs_total,
          "wall_track_s": wall, "dataset": dataset}
    with open(state_path(dataset) + ".val", "wb") as fh:
        pickle.dump(st, fh)
    print(f"validated-tracked {n_frames} frames in {wall:.1f}s; "
          f"landmarks={int(tr.lm_alive.sum())} {stats}", flush=True)


def load_tracker(dataset, suffix=""):
    with open(state_path(dataset) + suffix, "rb") as fh:
        st = pickle.load(fh)
    tr = make_tracker(st["n_frames"], st["n_obs_total"], dataset)
    tr.poses = list(st["poses"])
    tr.landmarks = st["landmarks"].copy()
    tr.lm_alive = st["lm_alive"].copy()
    tr.lm_seen = st["lm_seen"].copy()
    tr.odom_edges = list(st["odom_edges"])
    tr.obs_edges = list(st["obs_edges"])
    tr.frame = st["frame"]
    tr.lm_last_seen = np.zeros(len(tr.landmarks), np.int32)
    return tr, st


def evaluate(tr, st, chi2, wall_finish, label, dataset):
    from g2o_frontend_tpu.graph.store import graph2d_from_log
    from g2o_frontend_tpu.io.g2o import read_g2o
    from g2o_frontend_tpu.solvers.control import control_optimize_se2
    from g2o_frontend_tpu.utils.evaluation import ate_xy

    _noassoc, refname, fullname = DATASETS[dataset]
    log_ref = read_g2o(os.path.join(DATA, refname))
    g_ref, _ = graph2d_from_log(log_ref)
    ctl = control_optimize_se2(g_ref, max_iters=60)
    ref = ctl["poses"][: st["n_frames"]]
    ref_landmarks = int(np.asarray(g_ref.landmark_mask).sum())
    est = tr.trajectory()[: len(ref)]
    res = ate_xy(est[:, :2], ref[:, :2])
    out = {"strategy": label, "dataset": dataset,
           "landmarks": int(tr.lm_alive.sum()),
           "landmarks_reference": ref_landmarks,
           "chi2": float(chi2),
           "chi2_reference_graph": float(ctl["chi2"]),
           "chi2_ratio": round(float(chi2) / float(ctl["chi2"]), 3),
           "ate_vs_reference_tracker": round(float(res["rmse"]), 3),
           "wall_track_s": round(st["wall_track_s"], 1),
           "wall_finish_s": round(wall_finish, 1)}
    if fullname is not None:
        # TRUE data association exists: the proper judge is the full
        # graph's float64 optimum (the victoria protocol), and the
        # reference tracker's own output is scored on the same bar
        log_full = read_g2o(os.path.join(DATA, fullname))
        g_full, _ = graph2d_from_log(log_full)
        ctl_full = control_optimize_se2(g_full, max_iters=120)
        gt = ctl_full["poses"][: st["n_frames"]]
        out["landmarks_true"] = int(np.asarray(g_full.landmark_mask).sum())
        out["chi2_full_optimum"] = float(ctl_full["chi2"])
        out["ate_vs_full_optimum"] = round(
            float(ate_xy(est[:, :2], gt[:, :2])["rmse"]), 3)
        out["ate_reference_tracker_vs_full_optimum"] = round(
            float(ate_xy(ref[:, :2], gt[:, :2])["rmse"]), 3)
        noassoc_log = read_g2o(os.path.join(DATA, _noassoc))
        out["ate_odometry_vs_full_optimum"] = round(
            float(ate_xy(noassoc_log.se2_poses[: len(gt), :2],
                         gt[:, :2])["rmse"]), 3)
    print(json.dumps(out), flush=True)
    return out


def finish_r4(tr):
    """The shipped r4 finish (baseline)."""
    chi2 = 0.0
    for _ in range(2):
        tr.merge_nearby_landmarks(distance=0.8)
        tr.close_loops()
        chi2 = tr.optimize(local=False, iters=12)
    m = tr.merge_landmarks_mahalanobis(chi2_gate=9.21, prefilter_distance=6.0)
    moved = tr.reassociate(gate=1.0)
    if m or moved:
        chi2 = tr.optimize(local=False, iters=12)
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=1.0)
        chi2 = tr.optimize(local=False, iters=12)
    return chi2


def finish_em(tr, rounds=6):
    """Validated exact-solve EM: split chimeras, re-associate, merge
    duplicates, iterate to a fixed point."""
    t0 = time.perf_counter()
    tr.cfg.global_solver = "control"
    tr.merge_nearby_landmarks(distance=0.8)
    tr.close_loops()
    chi2 = tr.optimize(local=False, iters=20)
    print(f"  [t={time.perf_counter()-t0:.0f}s] init chi2={chi2:.3g} "
          f"lms={int(tr.lm_alive.sum())}", flush=True)
    for r in range(rounds):
        ns = tr.split_inconsistent_landmarks(spread_gate=1.5,
                                             cluster_eps=0.8)
        m = tr.merge_landmarks_mahalanobis(chi2_gate=9.21,
                                           prefilter_distance=4.0)
        m += tr.merge_nearby_landmarks(distance=0.5)
        moved = tr.reassociate(gate=0.8)
        chi2 = tr.optimize(local=False, iters=12)
        print(f"  [t={time.perf_counter()-t0:.0f}s] round {r}: splits={ns} "
              f"merged={m} moved={moved} chi2={chi2:.4g} "
              f"lms={int(tr.lm_alive.sum())}", flush=True)
        if ns == 0 and m == 0 and moved == 0:
            break
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=0.8)
    return tr.optimize(local=False, iters=20)


def finish_em2(tr, rounds=6):
    """em with duplicate-count discipline: the 0.8 m merge runs INSIDE the
    EM rounds (count parity with the reference tracker needs the same
    dedup aggressiveness the r4 finish had) and solves are budgeted."""
    t0 = time.perf_counter()
    tr.cfg.global_solver = "control"
    tr.merge_nearby_landmarks(distance=0.8)
    tr.close_loops()
    chi2 = tr.optimize(local=False, iters=15)
    print(f"  [t={time.perf_counter()-t0:.0f}s] init chi2={chi2:.3g} "
          f"lms={int(tr.lm_alive.sum())}", flush=True)
    for r in range(rounds):
        ns = tr.split_inconsistent_landmarks(spread_gate=1.5,
                                             cluster_eps=0.8)
        m = tr.merge_landmarks_mahalanobis(chi2_gate=9.21,
                                           prefilter_distance=4.0)
        m += tr.merge_nearby_landmarks(distance=0.8)
        moved = tr.reassociate(gate=0.8)
        chi2 = tr.optimize(local=False, iters=8)
        print(f"  [t={time.perf_counter()-t0:.0f}s] round {r}: splits={ns} "
              f"merged={m} moved={moved} chi2={chi2:.4g} "
              f"lms={int(tr.lm_alive.sum())}", flush=True)
        if ns == 0 and m == 0 and moved == 0:
            break
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=0.8)
    return tr.optimize(local=False, iters=20)


def finish_em3(tr, rounds=5):
    """r4 finish (keeps reference count parity) + pure re-association EM:
    no merges or splits in the rounds — only moving observation edges to
    their best landmark under the improving geometry, PCG solves in the
    loop, one exact solve for the final number."""
    t0 = time.perf_counter()
    chi2 = finish_r4(tr)
    print(f"  [t={time.perf_counter()-t0:.0f}s] r4 chi2={chi2:.4g} "
          f"lms={int(tr.lm_alive.sum())}", flush=True)
    for r in range(rounds):
        moved = tr.reassociate(gate=0.8)
        if moved == 0:
            break
        chi2 = tr.optimize(local=False, iters=10)
        print(f"  [t={time.perf_counter()-t0:.0f}s] round {r}: "
              f"moved={moved} chi2={chi2:.4g} "
              f"lms={int(tr.lm_alive.sum())}", flush=True)
    tr.cfg.global_solver = "control"
    return tr.optimize(local=False, iters=15)


def finish_em4(tr, rounds=30):
    """em3 with the EM run to (near) fixed point: reassociation rounds are
    ~7 s each with the jitted PCG solver, so run them until the moved-edge
    count dries up; finish with exact solves."""
    t0 = time.perf_counter()
    chi2 = finish_r4(tr)
    print(f"  [t={time.perf_counter()-t0:.0f}s] r4 chi2={chi2:.4g} "
          f"lms={int(tr.lm_alive.sum())}", flush=True)
    for r in range(rounds):
        moved = tr.reassociate(gate=0.8)
        if moved < 100:
            break
        chi2 = tr.optimize(local=False, iters=10)
        if r % 5 == 4:
            print(f"  [t={time.perf_counter()-t0:.0f}s] round {r}: "
                  f"moved={moved} chi2={chi2:.4g} "
                  f"lms={int(tr.lm_alive.sum())}", flush=True)
    tr.cfg.global_solver = "control"
    chi2 = tr.optimize(local=False, iters=10)
    moved = tr.reassociate(gate=0.8)
    print(f"  [t={time.perf_counter()-t0:.0f}s] exact: moved={moved} "
          f"chi2={chi2:.4g}", flush=True)
    return tr.optimize(local=False, iters=10)


def finish_em5(tr, rounds=20):
    """em's split+merge+reassociate EM with cheap PCG solves, then a final
    count-discipline dedup and exact polish."""
    t0 = time.perf_counter()
    tr.merge_nearby_landmarks(distance=0.8)
    tr.close_loops()
    chi2 = tr.optimize(local=False, iters=12)
    print(f"  [t={time.perf_counter()-t0:.0f}s] init chi2={chi2:.3g} "
          f"lms={int(tr.lm_alive.sum())}", flush=True)
    for r in range(rounds):
        ns = tr.split_inconsistent_landmarks(spread_gate=1.5,
                                             cluster_eps=0.8)
        m = tr.merge_landmarks_mahalanobis(chi2_gate=9.21,
                                           prefilter_distance=4.0)
        m += tr.merge_nearby_landmarks(distance=0.5)
        moved = tr.reassociate(gate=0.8)
        chi2 = tr.optimize(local=False, iters=10)
        if r % 4 == 3 or (ns == 0 and m == 0 and moved < 100):
            print(f"  [t={time.perf_counter()-t0:.0f}s] round {r}: "
                  f"splits={ns} merged={m} moved={moved} chi2={chi2:.4g} "
                  f"lms={int(tr.lm_alive.sum())}", flush=True)
        if ns == 0 and m == 0 and moved < 100:
            break
    # count discipline: the reference tracker's dedup aggressiveness
    for _ in range(2):
        m = tr.merge_nearby_landmarks(distance=0.8)
        moved = tr.reassociate(gate=0.8)
        chi2 = tr.optimize(local=False, iters=10)
        if not (m or moved):
            break
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=0.8)
    tr.cfg.global_solver = "control"
    chi2 = tr.optimize(local=False, iters=10)
    moved = tr.reassociate(gate=0.8)
    print(f"  [t={time.perf_counter()-t0:.0f}s] exact: moved={moved} "
          f"chi2={chi2:.4g} lms={int(tr.lm_alive.sum())}", flush=True)
    return tr.optimize(local=False, iters=10)


def finish_em6(tr, rounds=12):
    """Association-EM on the free-count curve, then dedup to reference
    count discipline: mahal+0.5-merge+reassociate rounds (PCG solves; the
    split scan measured 0 hits and ~60 s/round — run it once up front),
    then the 0.8-dedup, cull, and exact polish. Reports the count-parity
    operating point; the free point is logged on the way."""
    t0 = time.perf_counter()
    tr.merge_nearby_landmarks(distance=0.8)
    tr.close_loops()
    chi2 = tr.optimize(local=False, iters=12)
    ns = tr.split_inconsistent_landmarks(spread_gate=1.5, cluster_eps=0.8)
    print(f"  [t={time.perf_counter()-t0:.0f}s] init chi2={chi2:.3g} "
          f"splits={ns} lms={int(tr.lm_alive.sum())}", flush=True)
    for r in range(rounds):
        m = tr.merge_landmarks_mahalanobis(chi2_gate=9.21,
                                           prefilter_distance=4.0)
        m += tr.merge_nearby_landmarks(distance=0.5)
        moved = tr.reassociate(gate=0.8)
        chi2 = tr.optimize(local=False, iters=10)
        print(f"  [t={time.perf_counter()-t0:.0f}s] round {r}: merged={m} "
              f"moved={moved} chi2={chi2:.4g} "
              f"lms={int(tr.lm_alive.sum())}", flush=True)
        if m == 0 and moved < 150:
            break
    print(f"  free-count point: chi2={chi2:.4g} "
          f"lms={int(tr.lm_alive.sum())}", flush=True)
    for _ in range(3):
        m = tr.merge_nearby_landmarks(distance=0.8)
        moved = tr.reassociate(gate=0.8)
        chi2 = tr.optimize(local=False, iters=10)
        print(f"  [t={time.perf_counter()-t0:.0f}s] dedup: merged={m} "
              f"moved={moved} chi2={chi2:.4g} "
              f"lms={int(tr.lm_alive.sum())}", flush=True)
        if not m:
            break
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=0.8)
    tr.cfg.global_solver = "control"
    chi2 = tr.optimize(local=False, iters=10)
    moved = tr.reassociate(gate=0.8)
    print(f"  [t={time.perf_counter()-t0:.0f}s] exact: moved={moved} "
          f"chi2={chi2:.4g} lms={int(tr.lm_alive.sum())}", flush=True)
    return tr.optimize(local=False, iters=10)


def _reassociate_frames(tr, gate=1.5):
    """Per-frame JOINT re-association: replay the incremental associator
    (mutual-NN + frame-rigid RANSAC verification) over every pose — the
    track-continuity prior that per-obs NN reassociation lacks."""
    old_gate = tr.cfg.incremental_guess_max_feature_distance
    old_oig = tr.cfg.odometry_is_good
    tr.cfg.incremental_guess_max_feature_distance = gate
    tr.cfg.odometry_is_good = True  # never rewrite poses mid-sweep
    by_pose = {}
    for k, (p, l, z, w) in enumerate(tr.obs_edges):
        by_pose.setdefault(p, []).append(k)
    moved = 0
    for p, idxs in sorted(by_pose.items()):
        obs_local = np.stack([np.asarray(tr.obs_edges[k][2], np.float32)
                              for k in idxs])
        m = tr._associate(np.asarray(tr.poses[p], np.float32), obs_local)
        for k, mi in zip(idxs, m):
            if mi >= 0 and int(mi) != tr.obs_edges[k][1]:
                pp, _l, z, w = tr.obs_edges[k]
                tr.obs_edges[k] = (pp, int(mi), z, w)
                moved += 1
    tr.cfg.incremental_guess_max_feature_distance = old_gate
    tr.cfg.odometry_is_good = old_oig
    cur = np.fromiter((e[1] for e in tr.obs_edges), np.int64,
                      len(tr.obs_edges))
    counts = np.bincount(cur, minlength=len(tr.landmarks))
    alive = np.where(tr.lm_alive)[0]
    tr.lm_alive[alive[counts[alive] == 0]] = False
    return moved


def finish_em8(tr, rounds=12):
    """em4 (count-parity r4 base) but with JOINT frame-RANSAC
    re-association rounds."""
    t0 = time.perf_counter()
    chi2 = finish_r4(tr)
    print(f"  [t={time.perf_counter()-t0:.0f}s] r4 chi2={chi2:.4g} "
          f"lms={int(tr.lm_alive.sum())}", flush=True)
    for r in range(rounds):
        moved = _reassociate_frames(tr, gate=1.5)
        chi2 = tr.optimize(local=False, iters=10)
        print(f"  [t={time.perf_counter()-t0:.0f}s] round {r}: "
              f"moved={moved} chi2={chi2:.4g} "
              f"lms={int(tr.lm_alive.sum())}", flush=True)
        if moved < 150:
            break
    tr.cfg.global_solver = "control"
    chi2 = tr.optimize(local=False, iters=10)
    moved = _reassociate_frames(tr, gate=1.5)
    print(f"  [t={time.perf_counter()-t0:.0f}s] exact: moved={moved} "
          f"chi2={chi2:.4g}", flush=True)
    return tr.optimize(local=False, iters=10)


def finish_em7(tr, rounds=18):
    """The shipped free-count association EM: one 0.8 dedup of the raw
    track, then cheap merge(0.5)+reassociate+PCG rounds to the fixed
    point, exact polish. No covariance pass (measured ~85 s/round for
    near-zero merges after round 0)."""
    t0 = time.perf_counter()
    tr.merge_nearby_landmarks(distance=0.8)
    tr.close_loops()
    chi2 = tr.optimize(local=False, iters=12)
    print(f"  [t={time.perf_counter()-t0:.0f}s] init chi2={chi2:.3g} "
          f"lms={int(tr.lm_alive.sum())}", flush=True)
    for r in range(rounds):
        m = tr.merge_nearby_landmarks(distance=0.5)
        moved = tr.reassociate(gate=0.8)
        chi2 = tr.optimize(local=False, iters=10)
        if r % 4 == 3:
            print(f"  [t={time.perf_counter()-t0:.0f}s] round {r}: "
                  f"merged={m} moved={moved} chi2={chi2:.4g} "
                  f"lms={int(tr.lm_alive.sum())}", flush=True)
        if m == 0 and moved < 150:
            break
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=0.8)
    tr.cfg.global_solver = "control"
    chi2 = tr.optimize(local=False, iters=8)
    moved = tr.reassociate(gate=0.8)
    print(f"  [t={time.perf_counter()-t0:.0f}s] exact: moved={moved} "
          f"chi2={chi2:.4g} lms={int(tr.lm_alive.sum())}", flush=True)
    return tr.optimize(local=False, iters=8)


STRATEGIES = {"r4": finish_r4, "em": finish_em, "em2": finish_em2,
              "em3": finish_em3, "em4": finish_em4, "em5": finish_em5,
              "em6": finish_em6, "em7": finish_em7, "em8": finish_em8}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--validated", action="store_true")
    ap.add_argument("--val-state", action="store_true")
    ap.add_argument("--dataset", default="world1000",
                    choices=sorted(DATASETS))
    ap.add_argument("--frames", type=int, default=10 ** 9)
    ap.add_argument("--strategy", default="em")
    args = ap.parse_args()
    if args.save and args.validated:
        track_validated(args.dataset, args.frames)
    elif args.save:
        track(args.dataset, args.frames)
    else:
        tr, st = load_tracker(args.dataset,
                              ".val" if args.val_state else "")
        t0 = time.perf_counter()
        chi2 = STRATEGIES[args.strategy](tr)
        evaluate(tr, st, chi2, time.perf_counter() - t0, args.strategy,
                 args.dataset)
