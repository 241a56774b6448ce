"""Level-1 hierarchical optimization earns its keep (VERDICT r3 Next 7).

The MapMerger's big-node layer (``map_merger.cpp:43-115`` grouping,
``map_core.h`` MapNodeAlias) was write-only in r3. Now the reflector
coarse-solves it and rigidly warps keyframe groups before the fine solve:
the test shows coarse-then-fine reaches the cold full-solve chi2 in fewer
total CG matvecs on a 500-keyframe map with a large loop correction.
"""
import numpy as np

from g2o_frontend_tpu.graph.map_manager import MapManager, MapRelation
from g2o_frontend_tpu.graph.reflector import MapReflector
from g2o_frontend_tpu.slam.map_merger import MapMerger
from g2o_frontend_tpu.solvers.control import _se3_exp64


def _build_map(n=500, list_size=5, seed=0, with_merger=True):
    """Noisy 500-keyframe loop with closures; returns (manager, merger)."""
    rng = np.random.default_rng(seed)
    mgr = MapManager()
    merger = MapMerger(mgr, list_size=list_size) if with_merger else None
    T_gt = [np.eye(4)]
    for i in range(1, n):
        step = np.concatenate([[0.4, 0, 0], [0, 0, 2 * np.pi / n]])
        T_gt.append(T_gt[-1] @ _se3_exp64(step))
    info = np.diag([100.0] * 3 + [400.0] * 3)
    nodes = []
    T_est = np.eye(4)
    for i in range(n):
        if i == 0:
            rel = None
        else:
            rel = np.linalg.inv(T_gt[i - 1]) @ T_gt[i]
            rel = rel @ _se3_exp64(rng.normal(0, 0.008, 6))
            T_est = T_est @ rel  # dead-reckoned estimate (drifts)
        node = mgr.add_node(T_est.copy())
        nodes.append(node)
        if rel is not None:
            mgr.add_relation(MapRelation(nodes[i - 1], node, rel, info))
        if merger is not None:
            merger.process_key_node(node)
    # loop closures re-entering mapped space (accepted by consensus)
    for i, j in [(0, n // 2), (5, n // 2 + 5), (0, n - 1), (3, n - 4),
                 (n // 4, 3 * n // 4)]:
        rel = np.linalg.inv(T_gt[i]) @ T_gt[j]
        rel = rel @ _se3_exp64(rng.normal(0, 0.004, 6))
        mgr.add_relation(MapRelation(nodes[i], nodes[j], rel, info,
                                     is_closure=True, accepted=True))
    return mgr, merger, nodes, np.asarray(T_gt)


def _traj_err(mgr, T_gt):
    est = np.asarray([n.transform[:3, 3] for n in mgr.nodes if n.level == 0])
    return float(np.sqrt(np.mean(np.sum((est - T_gt[:, :3, 3]) ** 2, -1))))


def test_coarse_fine_fewer_matvecs_same_chi2():
    import jax

    jax.clear_caches()  # 500-node SE3 solves: keep compile RAM bounded
    COLD_ITERS, CG = 25, 200
    mgr_a, _, _, T_gt = _build_map(with_merger=False)
    ref_a = MapReflector(mgr_a)
    # cold baseline gets the SAME chain preconditioner the hierarchical
    # path uses — the matvec win must come from the hierarchy itself
    chi2_cold = ref_a.optimize(iters=COLD_ITERS, cg_iters=CG,
                               precond="chain")
    cg_cold = ref_a.last_cg_iters
    err_cold = _traj_err(mgr_a, T_gt)

    mgr_b, merger_b, _, _ = _build_map(with_merger=True)
    n1 = len([x for x in mgr_b.nodes if x.level == 1])
    assert n1 >= 80
    ref_b = MapReflector(mgr_b)
    chi2_h, st = ref_b.optimize_hierarchical(
        iters=6, cg_iters=CG, coarse_iters=12, coarse_cg=100
    )
    err_h = _traj_err(mgr_b, T_gt)

    # same optimum (1% chi2) at meaningfully less matvec WORK. A matvec
    # costs O(edges): the coarse graph has ~n1 edges vs ~n fine edges, so
    # weight coarse matvecs by the edge ratio (~1/list_size here).
    n_fine_edges = len([r for r in mgr_a.relations])
    n_coarse_edges = n1 - 1 + 5  # level-1 chain + lifted closures
    w = n_coarse_edges / n_fine_edges
    work_h = st["fine_cg"] + w * st["coarse_cg"]
    assert chi2_h <= 1.01 * chi2_cold + 1e-9, (chi2_cold, chi2_h)
    assert work_h < 0.75 * cg_cold, (work_h, cg_cold, st)
    # the fine solve alone also uses fewer matvecs than the cold solve
    assert st["fine_cg"] < 0.7 * cg_cold, (st, cg_cold)
    # and the trajectory is comparable (chi2 parity is the hard gate above;
    # the r5 adjoint transport of lifted-closure information shifts the
    # coarse weighting slightly — measured 0.84 vs 0.77 positional error at
    # IDENTICAL chi2, both far below the pre-correction trajectory)
    assert err_h <= 1.15 * err_cold + 1e-3, (err_cold, err_h)


def test_level_filtering_excludes_aliases():
    """The flat level-0 solve must not see alias vertices or level-1 chain
    relations (they double-count the path)."""
    mgr, merger, nodes, _ = _build_map(n=60, with_merger=True)
    ref = MapReflector(mgr)
    g0 = ref.build_graph(level=0)
    n0 = len([x for x in mgr.nodes if x.level == 0])
    assert int(np.asarray(g0.pose_mask).sum()) == n0
    g1 = ref.build_graph(level=1)
    n1 = len([x for x in mgr.nodes if x.level == 1])
    assert int(np.asarray(g1.pose_mask).sum()) == n1
    # level-1 chain relations only appear in the level-1 graph
    e1 = int(np.asarray(g1.pp_mask).sum())
    assert e1 == n1 - 1, e1


def test_hierarchical_degenerates_without_aliases():
    mgr, _, _, _ = _build_map(n=40, with_merger=False)
    ref = MapReflector(mgr)
    chi2, st = ref.optimize_hierarchical(iters=10, cg_iters=100)
    assert st["coarse_cg"] == 0 and st["fine_cg"] > 0
    assert np.isfinite(chi2)
