"""Map <-> solver reflector (MapG2OReflector analog).

The reference mirrors its MapManager into a g2o SparseOptimizer
(``boss_map_building/map_g2o_reflector.h:15-74``: node<->VertexSE3,
relation<->EdgeSE3, copyEstimatesToG2O/FromG2O, gauge-fixed optimize()).
Here the mirror target is the flat-array `PoseGraph3D` consumed by the
jitted LM-PCG solver: `optimize()` packs accepted nodes/relations into
arrays, runs `optimize_se3`, and writes estimates back into the map nodes.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..solvers.pose_graph import optimize_se3
from ..utils import lie
from .map_manager import MapManager, MapRelation
from .store import PoseGraph3D, _cap


def _T_to_pose7(T):
    q = np.asarray(lie.mat2quat_full(jnp.asarray(T[:3, :3], jnp.float32)))
    return np.concatenate([T[:3, 3], q[1:], q[:1]])


def _pose7_to_T(p):
    T = np.eye(4)
    T[:3, :3] = np.asarray(lie.quat2mat(jnp.asarray(p[3:6], jnp.float32)))
    T[:3, 3] = p[:3]
    return T


class MapReflector:
    """Pack a MapManager into PoseGraph3D, optimize, reflect back."""

    def __init__(self, manager: MapManager):
        self.manager = manager

    def build_graph(self, gauge_node=None) -> PoseGraph3D:
        nodes = self.manager.nodes
        rels = [
            r
            for r in self.manager.relations
            if (not r.is_closure) or r.accepted
        ]
        n, ep = len(nodes), len(rels)
        NP, EP = _cap(max(n, 1)), _cap(max(ep, 1))
        poses = np.zeros((NP, 7))
        poses[:, 6] = 1.0
        for i, nd in enumerate(nodes):
            poses[i] = _T_to_pose7(nd.transform)
        pp_ij = np.zeros((EP, 2), np.int32)
        pp_z = np.zeros((EP, 7))
        pp_z[:, 6] = 1.0
        pp_w = np.zeros((EP, 6, 6))
        for k, r in enumerate(rels):
            pp_ij[k] = (r.node_from.seq, r.node_to.seq)
            pp_z[k] = _T_to_pose7(r.transform)
            pp_w[k] = r.information
        fixed = np.zeros(NP, bool)
        gauge = gauge_node.seq if gauge_node is not None else 0
        if n:
            fixed[gauge] = True
        return PoseGraph3D(
            poses=jnp.asarray(poses, jnp.float32),
            pose_mask=jnp.asarray(np.arange(NP) < n),
            pp_ij=jnp.asarray(pp_ij),
            pp_meas=jnp.asarray(pp_z, jnp.float32),
            pp_info=jnp.asarray(pp_w, jnp.float32),
            pp_mask=jnp.asarray(np.arange(EP) < ep),
            fixed=jnp.asarray(fixed),
        )

    def optimize(self, iters=10, cg_iters=50, gauge_node=None) -> float:
        if not self.manager.nodes:
            return 0.0
        g = self.build_graph(gauge_node)
        g_opt, stats = optimize_se3(g, iters=iters, cg_iters=cg_iters)
        poses = np.asarray(g_opt.poses)
        for i, nd in enumerate(self.manager.nodes):
            nd.transform = _pose7_to_T(poses[i].astype(np.float64))
        return float(np.asarray(stats.chi2)[-1])
