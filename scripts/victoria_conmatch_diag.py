"""Diagnose constellation-match precision/recall on Victoria against GT.

For each segment pair the matcher accepts, the implied coarse constraint
rel(a_i, T ⊕ a_j) is compared with the ground-truth relative pose
rel(gt_i, gt_j) from the full-association control optimum. A match whose
implied relative translation errs by more than a few meters is FALSE —
folding the map when merged.

    python scripts/victoria_conmatch_diag.py --dist-tol 0.3 --inl 1.0 --min-inl 6
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from victoria_finish import load_tracker, DATA  # noqa: E402


def _rel(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    d = b[:2] - a[:2]
    dth = (b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi
    return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1], dth])


def _comp(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    return np.array([a[0] + c * b[0] - s * b[1],
                     a[1] + s * b[0] + c * b[1],
                     (a[2] + b[2] + np.pi) % (2 * np.pi) - np.pi])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segment", type=int, default=250)
    ap.add_argument("--dist-tol", type=float, default=0.3)
    ap.add_argument("--inl", type=float, default=1.0)
    ap.add_argument("--min-inl", type=int, default=6)
    ap.add_argument("--max-sep", type=float, default=40.0)
    ap.add_argument("--gt-tol", type=float, default=3.0)
    ap.add_argument("--drift-base", type=float, default=0.0,
                    help="trans gate = base + rate * |j-i| * segment (0=off)")
    ap.add_argument("--drift-rate", type=float, default=0.03)
    ap.add_argument("--rot-base", type=float, default=0.0)
    ap.add_argument("--rot-rate", type=float, default=0.0005)
    args = ap.parse_args()

    from g2o_frontend_tpu.graph.store import graph2d_from_log
    from g2o_frontend_tpu.io.g2o import read_g2o
    from g2o_frontend_tpu.slam.constellation import (
        match_constellations, segment_constellations)
    from g2o_frontend_tpu.solvers.control import control_optimize_se2

    tr, st = load_tracker()
    log_full = read_g2o(os.path.join(DATA, "victoriaPark-full.g2o.gz"))
    g_full, _ = graph2d_from_log(log_full)
    ctl = control_optimize_se2(g_full, max_iters=150)
    gt = np.asarray(ctl["poses"])[: st["n_frames"]]

    segs = segment_constellations(tr.poses, tr.obs_edges, tr.lm_alive,
                                  args.segment)
    S = len(segs)
    anchors = [min(s * args.segment, len(tr.poses) - 1) for s in range(S)]
    X = np.asarray([tr.poses[a] for a in anchors], np.float64)
    G = gt[anchors]

    # GT overlap structure: which segment pairs SHOULD match (their GT
    # anchor translation within max revisit distance AND constellations
    # overlap — approximated by GT anchor distance < 60 m)
    t0 = time.perf_counter()
    n_true = n_false = 0
    missed = []
    per_pair = []
    for j in range(S):
        ids_a, pos_a = segs[j]
        for i in range(j):
            ids_b, pos_b = segs[i]
            gt_rel = _rel(G[i], G[j])
            gt_close = np.hypot(gt_rel[0], gt_rel[1]) < 2.2 * args.segment * 0.05
            m = None
            tg = rg = None
            if args.drift_base > 0:
                tg = args.drift_base + args.drift_rate * (j - i) * args.segment
                rg = args.rot_base + args.rot_rate * (j - i) * args.segment
            if len(ids_a) >= args.min_inl and len(ids_b) >= args.min_inl:
                m = match_constellations(
                    pos_a, pos_b, dist_tol=args.dist_tol,
                    inlier_threshold=args.inl, min_inliers=args.min_inl,
                    max_pair_sep=args.max_sep, trans_gate=tg, rot_gate=rg,
                    seed=i * 10007 + j)
            if m is not None and m.ok:
                aj_corr = _comp(np.asarray(m.transform, np.float64), X[j])
                implied = _rel(X[i], aj_corr)
                err = np.hypot(*(implied[:2] - gt_rel[:2]))
                good = err < args.gt_tol
                n_true += good
                n_false += not good
                per_pair.append((i, j, m.n_inliers,
                                 len([1 for a, b in m.pairs
                                      if ids_a[a] != ids_b[b]]),
                                 round(float(err), 1), good))
            elif gt_close and i < j - 1:
                missed.append((i, j, len(ids_a), len(ids_b)))
    print(f"accepted: {n_true} true / {n_false} false "
          f"(precision {n_true / max(n_true + n_false, 1):.2f}); "
          f"missed-close-pairs: {len(missed)}; "
          f"wall {time.perf_counter() - t0:.0f}s")
    print("accepted detail (i, j, inl, new_merges, gt_err_m, good):")
    for row in sorted(per_pair, key=lambda r: r[4], reverse=True)[:40]:
        print("  ", row)
    print("missed close pairs (i, j, nA, nB):", missed[:30])


if __name__ == "__main__":
    main()
