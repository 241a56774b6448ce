"""MapMerger: stream grouping (``map_merger.cpp:43-115``) and redundancy
collapse (the ``merger2.h:20`` revisit role)."""
import numpy as np

from g2o_frontend_tpu.graph.map_manager import MapManager, MapRelation
from g2o_frontend_tpu.slam.map_merger import MapMerger


def _pose(x, y=0.0, yaw=0.0):
    T = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    T[:2, :2] = [[c, -s], [s, c]]
    T[0, 3], T[1, 3] = x, y
    return T


def _consistent_chain(poses, closures=()):
    """Manager whose relation transforms exactly match the poses."""
    m = MapManager()
    nodes = [m.add_node(T) for T in poses]
    I6 = np.eye(6)
    for a, b in zip(nodes[:-1], nodes[1:]):
        m.add_relation(MapRelation(
            a, b, np.linalg.inv(a.transform) @ b.transform, I6))
    for i, j in closures:
        m.add_relation(MapRelation(
            nodes[i], nodes[j],
            np.linalg.inv(nodes[i].transform) @ nodes[j].transform, I6,
            is_closure=True, accepted=True))
    return m, nodes


def _relation_residuals(m):
    """Max deviation of every relation transform from the current poses."""
    worst = 0.0
    for r in m.relations:
        pred = np.linalg.inv(r.node_from.transform) @ r.node_to.transform
        worst = max(worst, float(np.abs(pred - r.transform).max()))
    return worst


class TestStreamGrouping:
    def test_big_nodes_every_list_size(self):
        m = MapManager()
        merger = MapMerger(m, list_size=3)
        bigs = []
        for k in range(12):
            n = m.add_node(_pose(float(k)))
            big = merger.process_key_node(n)
            if big is not None:
                bigs.append(big)
        assert len(bigs) == 3  # groups of 4 (list_size+1 like the reference)
        assert all(b.level == 1 for b in bigs)
        # consecutive big nodes are chained with the reference's fixed info
        rels = [r for r in m.relations
                if r.node_from.level == 1 and r.node_to.level == 1]
        assert len(rels) == 2
        assert np.allclose(np.diag(rels[0].information),
                           [10, 10, 10, 100, 100, 100])
        # the relation transform matches the big nodes' poses
        assert _relation_residuals(m) < 1e-9


class TestCollapse:
    def _looped(self):
        # 0..7 walk out and back; node 6 lands on node 1's pose
        xs = [0.0, 1.0, 2.0, 3.0, 3.0, 2.0, 1.02, 0.5]
        poses = [_pose(x, 0.08 * i) for i, x in enumerate(xs)]
        poses[6] = _pose(1.02, 0.05)  # ~node 1 (1.0, 0.08)
        return _consistent_chain(poses, closures=[(1, 6)])

    def test_collapse_retargets_and_preserves_consistency(self):
        m, nodes = self._looped()
        n_rel0 = len(m.relations)
        merger = MapMerger(m)
        merged = merger.collapse_redundant(translational_threshold=0.3,
                                           rotational_threshold=0.3)
        assert merged == 1
        assert nodes[6].payload["merged_into"] == 1
        # the retired node carries no relations; its neighbours now bind to
        # the survivor
        assert not m.node_relations(nodes[6])
        partners = {
            (r.node_from.seq, r.node_to.seq) for r in m.node_relations(nodes[1])
        }
        assert (5, 1) in partners and (1, 7) in partners
        # the closure edge itself is consumed
        assert len(m.relations) == n_rel0 - 1
        # every re-targeted transform stays consistent with the poses
        assert _relation_residuals(m) < 1e-9
        assert len(merger.active_nodes()) == len(nodes) - 1

    def test_collapse_is_idempotent_and_gated(self):
        m, nodes = self._looped()
        merger = MapMerger(m)
        assert merger.collapse_redundant(0.3, 0.3) == 1
        assert merger.collapse_redundant(0.3, 0.3) == 0
        # a closure between genuinely distinct poses never collapses
        m2, nodes2 = _consistent_chain(
            [_pose(0.0), _pose(1.0), _pose(2.0)], closures=[(0, 2)])
        assert MapMerger(m2).collapse_redundant(0.3, 0.3) == 0

    def test_chi2_preserved_through_reflector(self):
        """Optimizing the collapsed graph must keep (or improve) the
        residual level: the re-targeted relations are exactly consistent, so
        the optimum stays near-zero chi2."""
        from g2o_frontend_tpu.graph.reflector import MapReflector

        m, nodes = self._looped()
        chi_before = MapReflector(m).optimize(iters=3, cg_iters=20)
        merger = MapMerger(m)
        assert merger.collapse_redundant(0.3, 0.3) == 1
        chi_after = MapReflector(m).optimize(iters=3, cg_iters=20)
        assert chi_after <= max(chi_before, 1e-6) + 1e-5
