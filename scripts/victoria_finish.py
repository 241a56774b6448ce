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


def make_tracker(n_frames, n_obs_total, frame_closure=False):
    from g2o_frontend_tpu.slam.feature_tracker import (FeatureTracker2D,
                                                       Tracker2DConfig)

    return FeatureTracker2D(
        Tracker2DConfig(
            frame_closure=frame_closure,
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


def track(frames=6969, inloop=0, inloop_iters=10, state_path=STATE):
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
        if inloop and (k + 1) % inloop == 0:
            # in-loop STRONG global solve (exact float64): bounds drift so
            # the association gates keep working through rotation-burst
            # odometry — the reference's online optimize-each-N architecture
            old = tr.cfg.global_solver
            tr.cfg.global_solver = "control"
            chi2 = tr.optimize(local=False, iters=inloop_iters)
            tr.cfg.global_solver = old
            print(f"  frame {k+1}: inloop solve chi2={chi2:.0f} "
                  f"lms={int(tr.lm_alive.sum())} "
                  f"[t={time.perf_counter()-t0:.0f}s]", flush=True)
    wall = time.perf_counter() - t0
    state = {
        "poses": [np.asarray(p) for p in tr.poses],
        "landmarks": tr.landmarks, "lm_alive": tr.lm_alive,
        "lm_seen": tr.lm_seen, "odom_edges": tr.odom_edges,
        "obs_edges": tr.obs_edges, "frame": tr.frame,
        "n_frames": n_frames, "n_obs_total": n_obs_total,
        "wall_track_s": wall,
    }
    with open(state_path, "wb") as fh:
        pickle.dump(state, fh)
    print(f"tracked {n_frames} frames in {wall:.1f}s; "
          f"landmarks={int(tr.lm_alive.sum())}", flush=True)


def track_validated(frames=6969, every=50, state_path=STATE,
                    chi2_slack=2.0, chi2_abs=300.0, solve_iters=8,
                    frame_closure=False, inc_gate=2.0,
                    use_close_loops=True):
    """Tracking with chi2-VALIDATED loop closures: every closure batch is
    immediately absorbed by an exact solve; a batch whose optimized chi2
    jumps past the running trend is rolled back (poses included). Keeps the
    trajectory drift-free without letting one false merge poison the run —
    the failure of both plain in-loop solving (ATE 53.7) and no in-loop
    solving (ATE 27)."""
    from g2o_frontend_tpu.io.g2o import read_g2o

    log = read_g2o(os.path.join(DATA, "victoriaPark-noassoc.g2o.gz"))
    n_frames = min(frames, len(log.se2_ids))
    feats = {}
    for row in log.features:
        feats.setdefault(int(row[0]), []).append(row[1:3])
    n_obs_total = sum(len(v) for v in feats.values())
    tr = make_tracker(n_frames, n_obs_total, frame_closure=frame_closure)
    tr.cfg.incremental_guess_max_feature_distance = inc_gate
    tr.cfg.global_solver = "control"
    prev = None
    chi2_ref = 0.0  # running accepted chi2
    n_edges_ref = 0
    n_rb = 0
    t0 = time.perf_counter()
    for k in range(n_frames):
        vid = int(log.se2_ids[k])
        pose = log.se2_poses[k]
        delta = (np.zeros(3, np.float32) if prev is None
                 else _rel_np(np.asarray(prev), np.asarray(pose)))
        prev = pose
        obs = np.asarray(feats.get(vid, np.zeros((0, 2))), np.float32)
        tr.process_frame(delta, obs)
        if frame_closure and (k + 1) % 15 == 0:
            drift_before = tr._drift_frames
            snap = _snapshot(tr)
            prop = tr.propose_window_closure(apply=False)
            wpairs = prop["pairs"] if prop else []
            if wpairs:
                from g2o_frontend_tpu.slam.validated_slam import (
                    absorb_closure)

                gate = chi2_slack * chi2_ref + chi2_abs
                # all-or-nothing absorb (25-iter exact solve, basin-jump
                # warp): per-pair carving measured harmful online (keeps
                # consistent-but-wrong subsets; ATE 18.1 -> 32.9)
                n_acc, chi2, _ns = absorb_closure(
                    tr, wpairs, gate, iters=25,
                    warp=(prop["transform"], prop["window_start"],
                          len(tr.poses)))
                if n_acc:
                    chi2_ref = max(chi2_ref, chi2)
                    tr._drift_frames = 0
                    print(f"  frame {k+1}: window closure merged={n_acc}"
                          f"/{len(wpairs)} chi2={chi2:.0f} "
                          f"[t={time.perf_counter()-t0:.0f}s]", flush=True)
                else:
                    tr._drift_frames = drift_before
                    n_rb += 1
                    print(f"  frame {k+1}: window closure {len(wpairs)} "
                          f"pairs REJECTED (gate {gate:.0f})", flush=True)
                if n_acc:
                    n_edges_ref = len(tr.obs_edges)
        if (k + 1) % every == 0:
            snap = _snapshot(tr)
            merged = tr.close_loops() if use_close_loops else 0
            chi2 = tr.optimize(local=False, iters=solve_iters)
            d_edges = max(len(tr.obs_edges) - n_edges_ref, 0)
            gate_r = chi2_ref + max(150.0, 2.5 * d_edges)
            if chi2 > gate_r:
                _rollback(tr, snap)
                n_rb += 1
                if merged:
                    print(f"  frame {k+1}: close_loops merged={merged} "
                          f"REJECTED chi2={chi2:.0f} (gate {gate_r:.0f})",
                          flush=True)
                if merged == 0:
                    # the jump came from association upstream of close_loops
                    # (wrong incremental merge already in the graph). This
                    # is the chimera-formation moment — the wrong merge is
                    # FRESH, so its obs still project multi-modally: split
                    # it apart instead of accepting the corruption.
                    chi2 = tr.optimize(local=False, iters=solve_iters)
                    if chi2 > gate_r:
                        ns = tr.split_inconsistent_landmarks(
                            spread_gate=2.0, cluster_eps=1.2)
                        if ns:
                            tr.reassociate(gate=1.0)
                            chi2 = tr.optimize(local=False,
                                               iters=solve_iters)
                            print(f"  frame {k+1}: split {ns} fresh "
                                  f"chimeras; chi2={chi2:.0f}", flush=True)
                    chi2_ref = max(chi2_ref, chi2)
                    n_edges_ref = len(tr.obs_edges)
            else:
                chi2_ref = max(chi2_ref, chi2)
                n_edges_ref = len(tr.obs_edges)
    wall = time.perf_counter() - t0
    state = {
        "poses": [np.asarray(p) for p in tr.poses],
        "landmarks": tr.landmarks, "lm_alive": tr.lm_alive,
        "lm_seen": tr.lm_seen, "odom_edges": tr.odom_edges,
        "obs_edges": tr.obs_edges, "frame": tr.frame,
        "n_frames": n_frames, "n_obs_total": n_obs_total,
        "wall_track_s": wall,
    }
    with open(state_path, "wb") as fh:
        pickle.dump(state, fh)
    print(f"tracked {n_frames} frames in {wall:.1f}s; "
          f"landmarks={int(tr.lm_alive.sum())} chi2_ref={chi2_ref:.0f} "
          f"rollbacks={n_rb} relocs={tr.n_relocalizations}", flush=True)


def _try_absorb(tr, pairs, chi2_gate, iters=25, max_attempts=4,
                min_support=4):
    """Greedy per-pair closure acceptance: apply the merge batch, solve
    exactly, and on a chi2-gate failure drop the worst-fitting pair and
    retry — one bad correspondence must not veto a true loop closure.
    Returns (n_accepted, chi2) with the tracker left in the accepted state,
    or (0, None) with the tracker rolled back."""
    for _ in range(max_attempts):
        if len(pairs) < min_support:
            return 0, None
        snap = _snapshot(tr)
        edge_map = []
        for la, lb in pairs:
            idxs = [k for k, (p, l, z, w) in enumerate(tr.obs_edges)
                    if l == la]
            tr._merge_landmarks(lb, la)
            edge_map.append(((la, lb), idxs))
        chi2 = tr.optimize(local=False, iters=iters)
        if chi2 <= chi2_gate:
            tr.n_relocalizations += 1
            return len(pairs), chi2
        costs = tr.obs_edge_chi2()
        worst_q, worst_c = 0, -1.0
        for q, (_pair, idxs) in enumerate(edge_map):
            c = max((costs[k] for k in idxs), default=0.0)
            if c > worst_c:
                worst_q, worst_c = q, c
        _rollback(tr, snap)
        pairs = [p for q, p in enumerate(pairs) if q != worst_q]
    return 0, None


def _try_absorb_split(tr, pairs, chi2_gate, iters=20):
    """All-or-nothing absorb with chimera conflict resolution: when the
    post-merge solve fails the chi2 gate, the strain makes earlier wrong
    merges visible (their obs projections go multi-modal under the strained
    poses) — split those landmarks, re-associate, re-solve, and re-judge.
    A fully-absorbed chimera is locally invisible in a relaxed graph; the
    failed absorb is exactly the moment it can be detected."""
    snap = _snapshot(tr)
    for la, lb in pairs:
        if tr.lm_alive[la] and tr.lm_alive[lb]:
            tr._merge_landmarks(lb, la)
    chi2 = tr.optimize(local=False, iters=iters)
    if chi2 <= chi2_gate:
        return len(pairs), chi2, 0
    ns = tr.split_inconsistent_landmarks(spread_gate=3.0, cluster_eps=2.0)
    if ns:
        tr.reassociate(gate=1.0)
        chi2 = tr.optimize(local=False, iters=iters)
        if chi2 <= chi2_gate:
            return len(pairs), chi2, ns
    _rollback(tr, snap)
    return 0, None, 0


def load_tracker(state_path=STATE):
    with open(state_path, "rb") as fh:
        st = pickle.load(fh)
    tr = make_tracker(st["n_frames"], st["n_obs_total"])
    tr.poses = list(st["poses"])
    tr.landmarks = st["landmarks"].copy()
    tr.lm_alive = st["lm_alive"].copy()
    tr.lm_seen = st["lm_seen"].copy()
    tr.odom_edges = list(st["odom_edges"])
    tr.obs_edges = list(st["obs_edges"])
    tr.frame = st["frame"]
    tr.lm_last_seen = np.zeros(len(tr.landmarks), np.int32)
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
            tr.lm_alive.copy(), tr.lm_seen.copy(), list(tr.obs_edges),
            tr.lm_last_seen.copy())


def _rollback(tr, snap):
    tr.poses, tr.landmarks, tr.lm_alive, tr.lm_seen, tr.obs_edges = (
        list(snap[0]), snap[1].copy(), snap[2].copy(), snap[3].copy(),
        list(snap[4]))
    tr.lm_last_seen = snap[5].copy()


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


def finish_con(tr, segment=250, dist_tol=0.3, inlier_threshold=1.0,
               min_inliers=6, rounds=6):
    """Constellation-proposal EM (VERDICT r4 Next 1): pose-free landmark
    pattern matching proposes the long-range loop merges the pose-gated
    sweeps cannot see; existing reassociate+optimize verifies."""
    t0 = time.perf_counter()
    tr.merge_nearby_landmarks()
    tr.close_loops()
    chi2 = tr.optimize(local=False, iters=12)
    print(f"  [t={time.perf_counter()-t0:.0f}s] init chi2={chi2:.0f} "
          f"lms={int(tr.lm_alive.sum())}", flush=True)
    for r in range(rounds):
        m = tr.close_loops_constellation(
            segment=segment, dist_tol=dist_tol,
            inlier_threshold=inlier_threshold, min_inliers=min_inliers)
        m += tr.merge_landmarks_mahalanobis(chi2_gate=9.21,
                                            prefilter_distance=12.0)
        moved = tr.reassociate(gate=1.5)
        chi2 = tr.optimize(local=False, iters=8)
        print(f"  [t={time.perf_counter()-t0:.0f}s] round {r}: merged={m} "
              f"moved={moved} chi2={chi2:.0f} "
              f"lms={int(tr.lm_alive.sum())}", flush=True)
        if m == 0 and moved == 0:
            break
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=1.5)
    tr.cfg.global_solver = "schur"
    return tr.optimize(local=False, iters=25)


def finish_con_em6(tr):
    """Constellation proposal + the em6 segment-RANSAC sweep in the same EM
    loop (constellation finds the long-range revisits, close_loops_global
    mops up the mid-range drift pairs)."""
    t0 = time.perf_counter()
    tr.merge_nearby_landmarks()
    tr.close_loops()
    chi2 = tr.optimize(local=False, iters=12)
    for r in range(8):
        m = tr.close_loops_constellation(segment=250, dist_tol=0.3,
                                         inlier_threshold=1.0, min_inliers=6)
        m += tr.close_loops_global(segment=250, gate=12.0,
                                   inlier_threshold=0.6)
        m += tr.merge_landmarks_mahalanobis(chi2_gate=9.21,
                                            prefilter_distance=12.0)
        moved = tr.reassociate(gate=1.5)
        chi2 = tr.optimize(local=False, iters=8)
        print(f"  [t={time.perf_counter()-t0:.0f}s] round {r}: merged={m} "
              f"moved={moved} chi2={chi2:.0f} "
              f"lms={int(tr.lm_alive.sum())}", flush=True)
        if m == 0 and moved == 0:
            break
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=1.5)
    tr.cfg.global_solver = "schur"
    return tr.optimize(local=False, iters=25)


def finish_con2(tr, segment=250, dist_tol=0.25, inlier_threshold=0.8,
                min_inliers=8):
    """Constellation EM, phased: (a) pose-free constellation merges absorbed
    immediately by the STRONG Schur solver (PCG can't swallow a 27 m loop
    closure in 8 iterations — con's 2.0e6 chi2 stall), (b) only then the
    covariance-gated mop-up rounds on sane geometry."""
    t0 = time.perf_counter()
    tr.merge_nearby_landmarks()
    tr.close_loops()
    chi2 = tr.optimize(local=False, iters=12)
    print(f"  [t={time.perf_counter()-t0:.0f}s] init chi2={chi2:.0f} "
          f"lms={int(tr.lm_alive.sum())}", flush=True)
    tr.cfg.global_solver = "schur"
    for r in range(5):
        m = tr.close_loops_constellation(
            segment=segment, dist_tol=dist_tol,
            inlier_threshold=inlier_threshold, min_inliers=min_inliers)
        if m == 0:
            break
        chi2 = tr.optimize(local=False, iters=15)
        print(f"  [t={time.perf_counter()-t0:.0f}s] con round {r}: "
              f"merged={m} chi2={chi2:.0f} lms={int(tr.lm_alive.sum())}",
              flush=True)
    for r in range(5):
        m = tr.merge_landmarks_mahalanobis(chi2_gate=9.21,
                                           prefilter_distance=12.0)
        moved = tr.reassociate(gate=1.5)
        chi2 = tr.optimize(local=False, iters=10)
        print(f"  [t={time.perf_counter()-t0:.0f}s] mop round {r}: "
              f"merged={m} moved={moved} chi2={chi2:.0f} "
              f"lms={int(tr.lm_alive.sum())}", flush=True)
        if m == 0 and moved == 0:
            break
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=1.5)
    return tr.optimize(local=False, iters=25)


def finish_hier(tr, segment=250, dist_tol=0.3, inlier_threshold=1.0,
                min_inliers=6, rounds=4):
    """Coarse-to-fine constellation closure: accepted matches become
    segment-level pose-graph edges, the coarse solve absorbs the drift,
    segments warp rigidly, THEN merges + fine optimization."""
    t0 = time.perf_counter()
    tr.merge_nearby_landmarks()
    tr.close_loops()
    chi2 = tr.optimize(local=False, iters=12)
    print(f"  [t={time.perf_counter()-t0:.0f}s] init chi2={chi2:.0f} "
          f"lms={int(tr.lm_alive.sum())}", flush=True)
    tr.cfg.global_solver = "schur"
    for r in range(rounds):
        m = tr.close_loops_hierarchical(
            segment=segment, dist_tol=dist_tol,
            inlier_threshold=inlier_threshold, min_inliers=min_inliers)
        if m == 0:
            break
        moved = tr.reassociate(gate=1.5)
        chi2 = tr.optimize(local=False, iters=15)
        print(f"  [t={time.perf_counter()-t0:.0f}s] hier round {r}: "
              f"merged={m} moved={moved} chi2={chi2:.0f} "
              f"lms={int(tr.lm_alive.sum())}", flush=True)
    for r in range(5):
        m = tr.merge_landmarks_mahalanobis(chi2_gate=9.21,
                                           prefilter_distance=12.0)
        moved = tr.reassociate(gate=1.5)
        chi2 = tr.optimize(local=False, iters=10)
        print(f"  [t={time.perf_counter()-t0:.0f}s] mop round {r}: "
              f"merged={m} moved={moved} chi2={chi2:.0f} "
              f"lms={int(tr.lm_alive.sum())}", flush=True)
        if m == 0 and moved == 0:
            break
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=1.5)
    return tr.optimize(local=False, iters=25)


def finish_valwin(tr, window=60, step=30, old_age=150, radius=45.0,
                  rot_gate=0.8, min_inliers=6, rounds=2, split=False,
                  greedy=False):
    """Validated whole-trajectory window-closure sweep: replay the online
    constellation relocalization over every window of the finished
    trajectory, accepting each merge batch all-or-nothing through an exact
    solve + chi2 gate (per-pair carving measured harmful: it keeps
    consistent-but-wrong subsets)."""
    from g2o_frontend_tpu.slam.constellation import match_constellations

    t0 = time.perf_counter()
    tr.cfg.global_solver = "control"
    chi2_ref = tr.optimize(local=False, iters=30)
    print(f"  [t={time.perf_counter()-t0:.0f}s] init chi2={chi2_ref:.0f} "
          f"lms={int(tr.lm_alive.sum())}", flush=True)
    if split:
        ns = tr.split_inconsistent_landmarks(spread_gate=4.0,
                                             cluster_eps=2.5)
        if ns:
            tr.reassociate(gate=1.0)
            chi2_ref = tr.optimize(local=False, iters=20)
            print(f"  [t={time.perf_counter()-t0:.0f}s] split {ns} chimera "
                  f"landmarks; chi2={chi2_ref:.0f} "
                  f"lms={int(tr.lm_alive.sum())}", flush=True)
    n = len(tr.poses)
    for rnd in range(rounds):
        accepted = 0
        # per-landmark observation frame lists (pose index == frame)
        lm_frames = {}
        for (p, l, z, w) in tr.obs_edges:
            lm_frames.setdefault(l, []).append(p)
        for l in lm_frames:
            lm_frames[l] = np.sort(np.asarray(lm_frames[l]))
        for s0 in range(0, max(n - window, 1), step):
            s1 = s0 + window
            acc = {}
            for (p, l, z, w) in tr.obs_edges:
                if s0 <= p < s1 and tr.lm_alive[l]:
                    from g2o_frontend_tpu.slam.feature_tracker import (
                        _se2_apply_np)
                    acc.setdefault(int(l), []).append(_se2_apply_np(
                        np.asarray(tr.poses[p], np.float32),
                        np.asarray(z, np.float32)[None])[0])
            if len(acc) < min_inliers:
                continue
            ids_a = np.array(sorted(acc), np.int64)
            pos_a = np.stack([np.mean(acc[int(l)], 0) for l in ids_a])
            in_w = set(ids_a.tolist())
            old = []
            for l in np.where(tr.lm_alive)[0]:
                if l in in_w or l not in lm_frames:
                    continue
                f = lm_frames[l]
                # no obs within [s0-age, s1+age)
                k = np.searchsorted(f, s0 - old_age)
                if k < len(f) and f[k] < s1 + old_age:
                    continue
                old.append(l)
            old = np.asarray(old, np.int64)
            if len(old) < min_inliers:
                continue
            centroid = pos_a.mean(0)
            span = float(np.linalg.norm(pos_a - centroid, axis=1).max())
            d = np.linalg.norm(tr.landmarks[old] - centroid, axis=1)
            B_idx = old[d < radius + span + 5.0]
            if len(B_idx) < min_inliers:
                continue
            m = match_constellations(
                pos_a, tr.landmarks[B_idx], dist_tol=0.4,
                inlier_threshold=1.0, min_inliers=min_inliers,
                min_pair_sep=1.0, max_pair_sep=2.0 * span + 5.0,
                trans_gate=radius, rot_gate=rot_gate, seed=s0 + rnd)
            if not m.ok:
                continue
            pairs = [(int(ids_a[ia]), int(B_idx[ib])) for ia, ib in m.pairs
                     if int(ids_a[ia]) != int(B_idx[ib])
                     and tr.lm_alive[int(ids_a[ia])]
                     and tr.lm_alive[int(B_idx[ib])]]
            if len(pairs) < 3:
                continue
            gate = 1.4 * chi2_ref + 500.0
            if greedy:
                n_acc, chi2, ns = _try_absorb_split(tr, pairs, gate,
                                                    iters=20)
                if n_acc:
                    chi2_ref = max(chi2_ref, chi2)
                    accepted += 1
                    print(f"    w{s0}: merged {n_acc}/{len(pairs)} "
                          f"splits={ns} chi2={chi2:.0f} "
                          f"[t={time.perf_counter()-t0:.0f}s]", flush=True)
                else:
                    print(f"    w{s0}: {len(pairs)} pairs rejected",
                          flush=True)
                continue
            snap = _snapshot(tr)
            for la, lb in pairs:
                if tr.lm_alive[la] and tr.lm_alive[lb]:
                    tr._merge_landmarks(lb, la)
            chi2 = tr.optimize(local=False, iters=20)
            if chi2 > gate:
                _rollback(tr, snap)
                print(f"    w{s0}: {len(pairs)} pairs rejected "
                      f"(chi2 {chi2:.0f} vs ref {chi2_ref:.0f})", flush=True)
            else:
                chi2_ref = max(chi2_ref, chi2)
                accepted += 1
                print(f"    w{s0}: merged {len(pairs)} chi2={chi2:.0f} "
                      f"[t={time.perf_counter()-t0:.0f}s]", flush=True)
        print(f"  [t={time.perf_counter()-t0:.0f}s] round {rnd}: "
              f"{accepted} windows accepted, "
              f"lms={int(tr.lm_alive.sum())}", flush=True)
        if accepted == 0:
            break
    # conservative validated mop-up
    for r in range(4):
        snap = _snapshot(tr)
        m = tr.merge_landmarks_mahalanobis(chi2_gate=9.21,
                                           prefilter_distance=10.0)
        moved = tr.reassociate(gate=1.0)
        if not (m or moved):
            break
        chi2 = tr.optimize(local=False, iters=15)
        if chi2 > 1.4 * chi2_ref + 500.0:
            _rollback(tr, snap)
            break
        chi2_ref = max(chi2_ref, chi2)
        print(f"  mop {r}: merged={m} moved={moved} chi2={chi2:.0f} "
              f"lms={int(tr.lm_alive.sum())}", flush=True)
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=1.0)
    return tr.optimize(local=False, iters=25)


def finish_valwin_force(tr, window=60, step=30, old_age=150, radius=45.0,
                        rot_gate=0.8, min_inliers=6):
    """valwin + forced absorption: a window whose batch fails the chi2
    gate is retried with the conflicting constraints PRUNED — apply the
    merges, solve, drop obs edges with chi2 > 150 (the wrong constraints
    a fully-absorbed chimera carries), re-associate, re-solve, and accept
    iff the end state passes a looser gate with <3% of edges pruned."""
    from g2o_frontend_tpu.slam.constellation import match_constellations
    from g2o_frontend_tpu.slam.feature_tracker import _se2_apply_np
    from g2o_frontend_tpu.slam.validated_slam import absorb_closure

    t0 = time.perf_counter()
    tr.cfg.global_solver = "control"
    chi2_ref = tr.optimize(local=False, iters=30)
    print(f"  [t={time.perf_counter()-t0:.0f}s] init chi2={chi2_ref:.0f} "
          f"lms={int(tr.lm_alive.sum())}", flush=True)
    n = len(tr.poses)
    for rnd in range(3):
        accepted = 0
        lm_frames = {}
        for (p, l, z, w) in tr.obs_edges:
            lm_frames.setdefault(l, []).append(p)
        lm_frames = {l: np.sort(np.asarray(v)) for l, v in lm_frames.items()}
        for s0 in range(0, max(n - window, 1), step):
            s1 = s0 + window
            acc = {}
            for (p, l, z, w) in tr.obs_edges:
                if s0 <= p < s1 and tr.lm_alive[l]:
                    acc.setdefault(int(l), []).append(_se2_apply_np(
                        np.asarray(tr.poses[p], np.float32),
                        np.asarray(z, np.float32)[None])[0])
            if len(acc) < min_inliers:
                continue
            ids_a = np.array(sorted(acc), np.int64)
            pos_a = np.stack([np.mean(acc[int(l)], 0) for l in ids_a])
            in_w = set(ids_a.tolist())
            old = []
            for l in np.where(tr.lm_alive)[0]:
                if l in in_w or l not in lm_frames:
                    continue
                f = lm_frames[l]
                kk = np.searchsorted(f, s0 - old_age)
                if kk < len(f) and f[kk] < s1 + old_age:
                    continue
                old.append(l)
            old = np.asarray(old, np.int64)
            if len(old) < min_inliers:
                continue
            centroid = pos_a.mean(0)
            span = float(np.linalg.norm(pos_a - centroid, axis=1).max())
            d = np.linalg.norm(tr.landmarks[old] - centroid, axis=1)
            B_idx = old[d < radius + span + 5.0]
            if len(B_idx) < min_inliers:
                continue
            m = match_constellations(
                pos_a, tr.landmarks[B_idx], dist_tol=0.4,
                inlier_threshold=1.0, min_inliers=min_inliers,
                min_pair_sep=1.0, max_pair_sep=2.0 * span + 5.0,
                trans_gate=radius, rot_gate=rot_gate, seed=s0 + rnd)
            if not m.ok:
                continue
            pairs = [(int(ids_a[ia]), int(B_idx[ib])) for ia, ib in m.pairs
                     if int(ids_a[ia]) != int(B_idx[ib])]
            if len(pairs) < 3:
                continue
            n_acc, chi2, ns = absorb_closure(
                tr, pairs, 1.4 * chi2_ref + 500.0, iters=20,
                warp=(m.transform, s0, s1))
            if n_acc:
                chi2_ref = max(chi2_ref, chi2)
                accepted += 1
                print(f"    w{s0}: merged {n_acc} chi2={chi2:.0f}",
                      flush=True)
                continue
            # FORCED path: apply, solve, prune conflicts, re-judge
            snap = _snapshot(tr)
            for la, lb in pairs:
                if tr.lm_alive[la] and tr.lm_alive[lb]:
                    tr._merge_landmarks(lb, la)
            tr.optimize(local=False, iters=20)
            n_edges = len(tr.obs_edges)
            dropped = _prune_bad_obs(tr, chi2_gate=150.0)
            tr.cull_weak_landmarks(min_obs=2)
            tr.reassociate(gate=1.0)
            chi2 = tr.optimize(local=False, iters=20)
            if dropped <= 0.03 * n_edges and chi2 <= 1.5 * chi2_ref + 1000:
                chi2_ref = max(chi2_ref, chi2)
                accepted += 1
                print(f"    w{s0}: FORCED merged {len(pairs)} "
                      f"pruned={dropped} chi2={chi2:.0f} "
                      f"[t={time.perf_counter()-t0:.0f}s]", flush=True)
            else:
                _rollback(tr, snap)
                print(f"    w{s0}: rejected even forced "
                      f"(pruned={dropped}, chi2={chi2:.0f})", flush=True)
        print(f"  [t={time.perf_counter()-t0:.0f}s] round {rnd}: "
              f"{accepted} accepted, lms={int(tr.lm_alive.sum())}",
              flush=True)
        if accepted == 0:
            break
    for _r in range(4):
        m2 = tr.merge_landmarks_mahalanobis(chi2_gate=9.21,
                                            prefilter_distance=10.0)
        moved = tr.reassociate(gate=1.0)
        if not (m2 or moved):
            break
        chi2 = tr.optimize(local=False, iters=15)
    if tr.cull_weak_landmarks(min_obs=2):
        tr.reassociate(gate=1.0)
    return tr.optimize(local=False, iters=25)


STRATEGIES = {"r3": finish_r3, "em6": finish_em6, "em7": finish_em7,
              "em6h": finish_em6h, "em6b": finish_em6b,
              "em6c": finish_em6c, "em6d": finish_em6d,
              "con": finish_con, "con_em6": finish_con_em6,
              "con2": finish_con2, "hier": finish_hier,
              "valwin": finish_valwin, "valwin_force": finish_valwin_force,
              "valwin2": lambda tr: finish_valwin(tr, split=True,
                                                  greedy=True, rounds=3)}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--frames", type=int, default=6969)
    ap.add_argument("--strategy", default="em6")
    ap.add_argument("--inloop", type=int, default=0)
    ap.add_argument("--validated", action="store_true")
    ap.add_argument("--frame-closure", action="store_true")
    ap.add_argument("--slack", type=float, default=2.0)
    ap.add_argument("--abs", dest="cabs", type=float, default=300.0)
    ap.add_argument("--inc-gate", type=float, default=2.0)
    ap.add_argument("--no-close-loops", action="store_true")
    ap.add_argument("--inloop-iters", type=int, default=10)
    ap.add_argument("--state", default=STATE)
    args = ap.parse_args()
    if args.save and args.validated:
        track_validated(args.frames, state_path=args.state,
                        frame_closure=args.frame_closure,
                        chi2_slack=args.slack, chi2_abs=args.cabs,
                        inc_gate=args.inc_gate,
                        use_close_loops=not args.no_close_loops)
    elif args.save:
        track(args.frames, inloop=args.inloop,
              inloop_iters=args.inloop_iters, state_path=args.state)
    else:
        tr, st = load_tracker(args.state)
        t0 = time.perf_counter()
        chi2 = STRATEGIES[args.strategy](tr)
        evaluate(tr, st, chi2, time.perf_counter() - t0, args.strategy)
