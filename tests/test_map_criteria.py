"""Node-acceptance criteria + connectivity-limited selection
(``boss_map/map_utils.h:10-108``, ``map_utils.cpp:119/167``)."""
import numpy as np

from g2o_frontend_tpu.graph.map_manager import (
    DistancePoseAcceptanceCriterion,
    GazePointAcceptanceCriterion,
    MahalanobisPoseAcceptanceCriterion,
    MapManager,
    MapRelation,
)


def _pose(x, y, theta=0.0):
    T = np.eye(4)
    c, s = np.cos(theta), np.sin(theta)
    T[:2, :2] = [[c, -s], [s, c]]
    T[0, 3], T[1, 3] = x, y
    return T


def _chain_manager(xs, closures=()):
    m = MapManager()
    nodes = [m.add_node(_pose(*x) if isinstance(x, tuple) else _pose(x, 0))
             for x in xs]
    I6 = np.eye(6)
    for a, b in zip(nodes[:-1], nodes[1:]):
        m.add_relation(MapRelation(a, b, np.eye(4), I6))
    for a, b in closures:
        m.add_relation(MapRelation(nodes[a], nodes[b], np.eye(4), I6,
                                   is_closure=True, accepted=True))
    return m, nodes


class TestCriteria:
    def test_distance_criterion_matches_flat_select(self):
        m, nodes = _chain_manager([(i * 1.0, 0.0) for i in range(10)])
        crit = DistancePoseAcceptanceCriterion(2.5, np.inf)
        crit.set_reference_pose(_pose(5.0, 0.0))
        got = {n.seq for n in m.select_nodes_by(crit)}
        legacy = {n.seq for n in m.select_nodes(_pose(5.0, 0.0), 2.5, np.inf)}
        assert got == legacy == {3, 4, 5, 6, 7}

    def test_distance_criterion_rotation_gate(self):
        m, _ = _chain_manager([(0.0, 0.0), (0.5, 0.0)])
        m.add_node(_pose(0.5, 0.0, np.pi / 2))
        crit = DistancePoseAcceptanceCriterion(2.0, 0.3)
        crit.set_reference_pose(_pose(0.0, 0.0))
        got = {n.seq for n in m.select_nodes_by(crit)}
        assert got == {0, 1}  # the rotated node fails the angular gate

    def test_gaze_criterion_prefers_facing_nodes(self):
        """Gaze point 2 m ahead of the reference: a node near the gaze point
        and LOOKING at it passes; one looking away fails; one far away
        fails; the reference node itself always passes
        (``map_utils.cpp:34-48``)."""
        m = MapManager()
        ref = m.add_node(_pose(0.0, 0.0))
        # node at (1, 0.5) looking toward the gaze point (2, 0)
        toward = np.arctan2(-0.5, 1.0)
        facing = m.add_node(_pose(1.0, 0.5, toward))
        away = m.add_node(_pose(1.0, 0.5, toward + np.pi))
        far = m.add_node(_pose(8.0, 0.0, 0.0))
        crit = GazePointAcceptanceCriterion(
            translational_distance=2.0, rotational_distance=0.5,
            forward_sliding=2.0,
        )
        crit.set_reference_pose(ref.transform)
        got = {n.seq for n in m.select_nodes_by(crit)}
        assert facing.seq in got
        assert away.seq not in got
        assert far.seq not in got
        assert ref.seq in got

    def test_mahalanobis_criterion(self):
        m, _ = _chain_manager([(0.0, 0.0), (1.0, 0.0), (0.0, 2.0)])
        info = np.diag([1.0, 100.0, 1.0, 1.0, 1.0, 1.0])  # tight in y
        crit = MahalanobisPoseAcceptanceCriterion(info, distance=4.0)
        crit.set_reference_pose(_pose(0.0, 0.0))
        got = {n.seq for n in m.select_nodes_by(crit)}
        assert got == {0, 1}  # y-offset node blows the gated distance


class TestConnectedSelection:
    def test_matches_flat_filter_on_connected_map(self):
        """On a fully connected map every criterion-passing node is reachable
        -> BFS selection == flat selection."""
        m, nodes = _chain_manager([(i * 1.0, 0.0) for i in range(10)])
        crit = DistancePoseAcceptanceCriterion(2.5, np.inf)
        crit.set_reference_pose(nodes[5].transform)
        flat = {n.seq for n in m.select_nodes_by(crit)}
        bfs = {n.seq for n in m.select_nodes_connected(nodes[5], crit)}
        assert bfs == flat

    def test_prunes_unconnected_near_nodes(self):
        """A spatially-near node with NO relation path inside the acceptance
        region must appear in the flat candidate set (it is a closure
        candidate) but NOT in the connectivity-limited local map."""
        m, nodes = _chain_manager([(i * 1.0, 0.0) for i in range(4)])
        stray = m.add_node(_pose(1.5, 0.2))  # near but unconnected
        crit = DistancePoseAcceptanceCriterion(2.0, np.inf)
        crit.set_reference_pose(nodes[1].transform)
        flat = {n.seq for n in m.select_nodes_by(crit)}
        bfs = {n.seq for n in m.select_nodes_connected(nodes[1], crit)}
        assert stray.seq in flat
        assert stray.seq not in bfs

    def test_respects_relation_selector_and_criterion_barrier(self):
        """BFS cannot tunnel through a node the criterion rejects, unless a
        closure relation bridges it — and the relation selector can turn
        those bridges off."""
        # chain 0-1-2-3-4 with node 2 far off to the side (rejected),
        # plus an accepted closure 1-3
        m, nodes = _chain_manager(
            [(0.0, 0.0), (1.0, 0.0), (50.0, 0.0), (2.0, 0.0), (3.0, 0.0)],
            closures=[(1, 3)],
        )
        crit = DistancePoseAcceptanceCriterion(10.0, np.inf)
        crit.set_reference_pose(nodes[0].transform)
        with_closure = {n.seq for n in m.select_nodes_connected(nodes[0], crit)}
        assert with_closure == {0, 1, 3, 4}  # through the closure, not node 2
        no_closure = {
            n.seq
            for n in m.select_nodes_connected(
                nodes[0], crit, relation_selector=lambda r: not r.is_closure
            )
        }
        assert no_closure == {0, 1}  # node 2 is a barrier
