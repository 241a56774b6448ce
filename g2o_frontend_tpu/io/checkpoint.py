"""Checkpoint / resume: graph and map state as npz archives.

The reference checkpoints by serializing the entire object graph through
boss at shutdown (``pwn_slam_app.cpp:124-130``) with BLOB side files. Here
the flat-array representation makes checkpoints trivial: every pytree graph
(PoseGraph2D/3D, BAProblem, PlaneGraph) round-trips through one compressed
npz; `MapManager` state (nodes, relations, consensus counters) is packed to
arrays + a small JSON header. Long runs restart from the latest checkpoint
(SURVEY.md §5 checkpoint/resume).
"""
from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np


def save_pytree(path, tree):
    """Save a NamedTuple/dataclass-like pytree of arrays to npz."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrs = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrs["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrs)


def load_pytree(path, example):
    """Load into the structure of `example` (shapes may differ)."""
    import jax

    data = np.load(path)
    leaves_e, treedef = jax.tree_util.tree_flatten(example)
    leaves = [
        jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves_e))
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_map(path, manager):
    """Serialize a MapManager (nodes, relations, consensus state)."""
    from ..graph.map_manager import MapManager

    assert isinstance(manager, MapManager)
    nodes_T = np.stack([n.transform for n in manager.nodes]) if manager.nodes else np.zeros((0, 4, 4))
    levels = np.asarray([n.level for n in manager.nodes], np.int32)
    payloads = [n.payload for n in manager.nodes]
    rel_rows = []
    rel_T = []
    rel_I = []
    for r in manager.relations:
        rel_rows.append(
            [
                r.node_from.seq,
                r.node_to.seq,
                int(r.is_closure),
                int(r.accepted),
                r.consensus_times_checked,
                r.consensus_cum_inlier,
                r.consensus_cum_outlier_times,
            ]
        )
        rel_T.append(r.transform)
        rel_I.append(r.information)
    header = json.dumps({"payloads": payloads})
    np.savez_compressed(
        path,
        nodes_T=nodes_T,
        levels=levels,
        rel_rows=np.asarray(rel_rows, np.int64).reshape(-1, 7),
        rel_T=np.asarray(rel_T).reshape(-1, 4, 4),
        rel_I=np.asarray(rel_I).reshape(-1, 6, 6),
        header=np.frombuffer(header.encode(), np.uint8),
    )


def load_map(path):
    from ..graph.map_manager import MapManager, MapRelation

    data = np.load(path)
    header = json.loads(bytes(data["header"]).decode())
    mgr = MapManager()
    for T, lvl, pl in zip(data["nodes_T"], data["levels"], header["payloads"]):
        mgr.add_node(T, payload=pl, level=int(lvl))
    for row, T, I in zip(data["rel_rows"], data["rel_T"], data["rel_I"]):
        rel = MapRelation(
            node_from=mgr.nodes[int(row[0])],
            node_to=mgr.nodes[int(row[1])],
            transform=T,
            information=I,
            is_closure=bool(row[2]),
            accepted=bool(row[3]),
            consensus_times_checked=int(row[4]),
            consensus_cum_inlier=int(row[5]),
            consensus_cum_outlier_times=int(row[6]),
        )
        mgr.add_relation(rel)
    return mgr
