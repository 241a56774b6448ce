"""Map model: nodes, relations, criteria, partitions (boss_map analog).

Host-side re-design of ``boss_map``'s map layer:
- `MapNode` / `MapRelation` (``map_core.h`` MapNode, MapNodeBinaryRelation):
  SE3 pose nodes with seq numbers; binary relations carry a 4x4 transform,
  6x6 information, and the closure-consensus counters (`ClosureInfo`,
  ``map_closer.h:11-18``),
- `MapManager` (``map_manager.h:9-56``): bookkeeping + action handlers
  (nodeAdded/relationAdded callbacks used by the g2o reflector analog),
- `select_nodes` (``map_utils.cpp:119``): nodes accepted by a pose
  criterion (distance / gaze),
- `make_partitions` (``map_utils.cpp:167``): connected components of the
  selected set under a relation selector — the structure reused by the
  distributed solver as its sharding axis (SURVEY.md §5).

Geometry math is numpy here (graphs are small); bulk per-node distance
checks go through one vectorized pass.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np


@dataclass
class MapNode:
    seq: int
    transform: np.ndarray  # (4, 4) pose
    level: int = 0
    payload: dict = field(default_factory=dict)

    def __hash__(self):
        return self.seq

    def __eq__(self, other):
        return isinstance(other, MapNode) and other.seq == self.seq


class MapNodeAlias(MapNode):
    """A node at level+1 whose pose proxies an `original` node
    (``map_core.h`` MapNodeAlias, ``:79-99``) — the reference's mechanism
    for hierarchical map levels: higher levels alias representative nodes of
    lower-level partitions, so level-L optimization moves whole subtrees."""

    def __init__(self, seq: int, original: MapNode, payload=None):
        super().__init__(seq=seq, transform=original.transform,
                         level=original.level + 1, payload=payload or {})
        self.original = original

    @property  # type: ignore[override]
    def transform(self):
        return self.original.transform

    @transform.setter
    def transform(self, value):
        # setting an alias pose moves the original (map_core.h:90-92)
        if getattr(self, "original", None) is not None:
            self.original.transform = value


@dataclass
class MapRelation:
    """Binary relation; transform maps `to` coordinates into `from` frame."""

    node_from: MapNode
    node_to: MapNode
    transform: np.ndarray  # (4, 4)
    information: np.ndarray  # (6, 6)
    # ClosureInfo consensus fields (map_closer.h:11-18)
    is_closure: bool = False
    accepted: bool = False
    consensus_times_checked: int = 0
    consensus_cum_inlier: int = 0
    consensus_cum_outlier_times: int = 0
    payload: dict = field(default_factory=dict)

    def __hash__(self):
        return id(self)


class MapManager:
    """Node/relation bookkeeping with observer callbacks."""

    def __init__(self):
        self.nodes: list[MapNode] = []
        self.relations: list[MapRelation] = []
        self._node_relations: dict[int, set[MapRelation]] = {}
        self.node_added_handlers: list[Callable] = []
        self.relation_added_handlers: list[Callable] = []
        self.relation_removed_handlers: list[Callable] = []

    def add_node(self, transform, payload=None, level=0) -> MapNode:
        n = MapNode(seq=len(self.nodes), transform=np.asarray(transform, np.float64),
                    level=level, payload=payload or {})
        self.nodes.append(n)
        self._node_relations[n.seq] = set()
        for h in self.node_added_handlers:
            h(n)
        return n

    def add_alias(self, original: MapNode, payload=None) -> MapNodeAlias:
        """Lift `original` one level up (``map_core.h`` MapNodeAlias)."""
        n = MapNodeAlias(seq=len(self.nodes), original=original,
                         payload=payload)
        self.nodes.append(n)
        self._node_relations[n.seq] = set()
        for h in self.node_added_handlers:
            h(n)
        return n

    def level_nodes(self, level: int) -> list[MapNode]:
        return [n for n in self.nodes if n.level == level]

    def add_relation(self, rel: MapRelation) -> MapRelation:
        self.relations.append(rel)
        self._node_relations[rel.node_from.seq].add(rel)
        self._node_relations[rel.node_to.seq].add(rel)
        for h in self.relation_added_handlers:
            h(rel)
        return rel

    def remove_relation(self, rel: MapRelation):
        if rel in self.relations:
            self.relations.remove(rel)
            self._node_relations[rel.node_from.seq].discard(rel)
            self._node_relations[rel.node_to.seq].discard(rel)
            for h in self.relation_removed_handlers:
                h(rel)

    def node_relations(self, node: MapNode) -> set:
        return self._node_relations.get(node.seq, set())

    # -- criteria & partitions ---------------------------------------------
    def select_nodes(
        self,
        reference_pose: np.ndarray,
        translational_distance: float,
        rotational_distance: float = np.inf,
    ) -> list[MapNode]:
        """DistancePoseAcceptanceCriterion (``map_utils.h:62``) vectorized."""
        if not self.nodes:
            return []
        T = np.stack([n.transform for n in self.nodes])
        ref_inv = np.linalg.inv(reference_pose)
        rel = np.einsum("ij,njk->nik", ref_inv, T)
        dt = np.linalg.norm(rel[:, :3, 3], axis=1)
        tr = np.clip((np.trace(rel[:, :3, :3], axis1=1, axis2=2) - 1) / 2, -1, 1)
        dr = np.arccos(tr)
        ok = (dt < translational_distance) & (dr < rotational_distance)
        return [n for n, o in zip(self.nodes, ok) if o]

    def make_partitions(
        self,
        selected: list[MapNode],
        relation_selector: Optional[Callable[[MapRelation], bool]] = None,
    ) -> list[list[MapNode]]:
        """Connected components of `selected` under accepted relations."""
        sel = {n.seq for n in selected}
        parent = {s: s for s in sel}

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb

        for r in self.relations:
            if relation_selector is not None and not relation_selector(r):
                continue
            a, b = r.node_from.seq, r.node_to.seq
            if a in sel and b in sel:
                union(a, b)
        groups: dict[int, list[MapNode]] = {}
        for n in selected:
            groups.setdefault(find(n.seq), []).append(n)
        return list(groups.values())
