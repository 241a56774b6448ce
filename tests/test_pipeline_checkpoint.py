"""StreamProcessor dataflow + checkpoint/resume tests."""
import numpy as np

from g2o_frontend_tpu.graph.map_manager import MapManager, MapRelation
from g2o_frontend_tpu.graph.pipeline import (
    EnqueuerOutputHandler,
    FunctionProcessor,
    chain,
)
from g2o_frontend_tpu.io.checkpoint import load_map, load_pytree, save_map, save_pytree


class TestPipeline:
    def test_chain_propagates(self):
        double = FunctionProcessor(lambda x: x * 2, "double")
        plus = FunctionProcessor(lambda x: x + 1, "plus")
        sink = EnqueuerOutputHandler("sink")
        grp = chain(double, plus, sink)
        grp.process(5)
        grp.process(10)
        assert list(sink.queue) == [11, 21]

    def test_filter_drops_none(self):
        keep_even = FunctionProcessor(lambda x: x if x % 2 == 0 else None)
        sink = EnqueuerOutputHandler()
        grp = chain(keep_even, sink)
        for k in range(6):
            grp.process(k)
        assert list(sink.queue) == [0, 2, 4]

    def test_named_lookup(self):
        a = FunctionProcessor(lambda x: x, "alpha")
        grp = chain(a, EnqueuerOutputHandler("sink"))
        assert grp.node("alpha") is a
        assert grp.node("nope") is None


class TestCheckpoint:
    def test_pytree_roundtrip(self, tmp_path):
        from g2o_frontend_tpu.graph.store import graph2d_from_log
        from g2o_frontend_tpu.slam.simulator import SimulatorConfig, simulate

        world = simulate(SimulatorConfig(n_poses=40, n_landmarks=10, seed=7))
        g, _ = graph2d_from_log(world.to_g2o_log())
        p = tmp_path / "graph.npz"
        save_pytree(str(p), g)
        g2 = load_pytree(str(p), g)
        np.testing.assert_allclose(np.asarray(g2.poses), np.asarray(g.poses))
        np.testing.assert_array_equal(np.asarray(g2.pp_ij), np.asarray(g.pp_ij))

    def test_map_roundtrip(self, tmp_path):
        mgr = MapManager()
        a = mgr.add_node(np.eye(4), payload={"frame": 0})
        T = np.eye(4)
        T[0, 3] = 1.0
        b = mgr.add_node(T, payload={"frame": 5})
        rel = MapRelation(a, b, T, np.eye(6) * 10, is_closure=True, accepted=True,
                          consensus_times_checked=3, consensus_cum_inlier=7)
        mgr.add_relation(rel)
        p = tmp_path / "map.npz"
        save_map(str(p), mgr)
        m2 = load_map(str(p))
        assert len(m2.nodes) == 2 and len(m2.relations) == 1
        assert m2.nodes[1].payload["frame"] == 5
        r = m2.relations[0]
        assert r.is_closure and r.accepted
        assert r.consensus_times_checked == 3 and r.consensus_cum_inlier == 7
        np.testing.assert_allclose(r.information, np.eye(6) * 10)
