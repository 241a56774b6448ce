"""Voronoi DIAGRAM graph extraction from on-chip masks.

Completes component #31: the reference builds an explicit graph from its
distance map — vertices, edges, connected components, regions
(``voronoi/voronoi_diagram.h:40-49``, ``voronoi_diagram.cpp`` 1,183 LoC).
Here the heavy per-pixel work (jump-flood distance transform, boundary
mask, skeleton) runs on-chip (ops/distance_transform.py); this module walks
the resulting boolean mask into the graph on the host — a small, pointer-
chasing pass that has no batch parallelism to exploit.

Semantics:
- graph NODES are junction pixels (>= 3 skeleton neighbors, 8-connected)
  and endpoints (exactly 1); isolated pixels become degree-0 nodes,
- graph EDGES are maximal degree-2 chains between nodes, with metric length
  (diagonal steps count sqrt(2)) and the chain's pixel path,
- connected COMPONENTS label every node (the reference's region grouping),
- pure cycles (no junction) get one node and a self-edge of the cycle
  length.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

_N8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


class VoronoiGraph(NamedTuple):
    vertices: np.ndarray  # (V, 2) pixel coords (row, col)
    vertex_dist: np.ndarray  # (V,) clearance at the vertex (0 if no map)
    edges: list  # [(i, j, length, path (P, 2) ndarray)]
    components: np.ndarray  # (V,) component label per vertex
    n_components: int

    @property
    def n_vertices(self):
        return len(self.vertices)

    @property
    def n_edges(self):
        return len(self.edges)


def extract_graph(mask, dist=None) -> VoronoiGraph:
    """Boolean diagram mask (H, W) -> VoronoiGraph."""
    mask = np.asarray(mask, bool)
    H, W = mask.shape
    dist = None if dist is None else np.asarray(dist)
    idx = {(int(r), int(c)) for r, c in zip(*np.where(mask))}

    def nbrs(p):
        r, c = p
        return [
            (r + dr, c + dc)
            for dr, dc in _N8
            if (r + dr, c + dc) in idx
        ]

    degree = {p: len(nbrs(p)) for p in idx}
    node_pix = [p for p in idx if degree[p] != 2]
    # 8-connectivity turns every junction into a CLUSTER of >2-degree pixels
    # (each arm's first pixel touches the perpendicular arm diagonally);
    # merge adjacent node pixels into one vertex, as the reference does when
    # it unifies diagram vertices (voronoi_diagram.cpp)
    cluster = {p: p for p in node_pix}

    def cfind(p):
        while cluster[p] != p:
            cluster[p] = cluster[cluster[p]]
            p = cluster[p]
        return p

    node_set = set(node_pix)
    for p in node_pix:
        for q in nbrs(p):
            if q in node_set:
                rp, rq = cfind(p), cfind(q)
                if rp != rq:
                    cluster[rp] = rq
    roots = sorted({cfind(p) for p in node_pix})
    root_id = {r: k for k, r in enumerate(roots)}
    node_of = {p: root_id[cfind(p)] for p in node_pix}
    # vertex position: centroid pixel of each cluster
    node_pix_by_cluster = [[] for _ in roots]
    for p in node_pix:
        node_pix_by_cluster[node_of[p]].append(p)
    member_pix = list(node_set)  # original junction/endpoint pixels
    node_pix = [
        tuple(np.asarray(c).mean(0).round().astype(int)) for c in node_pix_by_cluster
    ]

    edges = []
    visited_dir = set()  # (pixel, next_pixel) directed chain starts

    def walk(start, first):
        """Follow the degree-2 chain from node `start` through `first`."""
        path = [start, first]
        prev, cur = start, first
        length = np.hypot(cur[0] - start[0], cur[1] - start[1])
        while cur not in node_of:
            nxt = [q for q in nbrs(cur) if q != prev]
            # prefer non-diagonal continuation when 8-connectivity gives
            # both the corner and the diagonal
            if len(nxt) > 1:
                nxt = [q for q in nxt if (q[0] - cur[0]) * (q[1] - cur[1]) == 0] or nxt
            if not nxt:
                break  # dead end that wasn't classified (shouldn't happen)
            prev, cur = cur, nxt[0]
            length += np.hypot(cur[0] - prev[0], cur[1] - prev[1])
            path.append(cur)
            if cur == start and len(path) > 3:
                break  # pure cycle back to origin
        return cur, length, path

    for p in member_pix:
        for q in nbrs(p):
            if q in node_set and node_of[q] == node_of[p]:
                continue  # intra-cluster adjacency
            if (p, q) in visited_dir:
                continue
            end, length, path = walk(p, q)
            visited_dir.add((p, q))
            if path[-1] in node_of and len(path) >= 2:
                visited_dir.add((path[-1], path[-2]))
            j = node_of.get(end, node_of[p])
            if j == node_of[p] and len(path) <= 3:
                continue  # spurious micro self-loop around a junction cluster
            edges.append((node_of[p], j, float(length),
                          np.asarray(path, np.int32)))

    # pure cycles: degree-2 pixels never reached from any node
    covered = set()
    for (_, _, _, path) in edges:
        covered.update(map(tuple, path.tolist()))
    for p in sorted(idx - covered - set(node_pix)):
        if p in covered:
            continue
        node_of[p] = len(node_pix)
        node_pix.append(p)
        end, length, path = walk(p, nbrs(p)[0])
        covered.update(map(tuple, np.asarray(path).tolist()))
        edges.append((node_of[p], node_of[p], float(length),
                      np.asarray(path, np.int32)))

    # connected components over nodes via their chains
    parent = list(range(len(node_pix)))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (i, j, _, _) in edges:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[ri] = rj
    comp_root = [find(k) for k in range(len(node_pix))]
    remap = {r: k for k, r in enumerate(sorted(set(comp_root)))}
    components = np.asarray([remap[r] for r in comp_root], np.int32)

    verts = np.asarray(node_pix, np.int32).reshape(-1, 2)
    vdist = (
        dist[verts[:, 0], verts[:, 1]].astype(np.float32)
        if dist is not None and len(verts)
        else np.zeros(len(verts), np.float32)
    )
    return VoronoiGraph(
        vertices=verts,
        vertex_dist=vdist,
        edges=edges,
        components=components,
        n_components=len(remap) if len(node_pix) else 0,
    )


def region_labels(mask, free) -> tuple[np.ndarray, int]:
    """Label the free-space regions the diagram partitions (4-connected
    flood fill of `free & ~mask`) — the reference's region set."""
    mask = np.asarray(mask, bool)
    free = np.asarray(free, bool)
    cells = free & ~mask
    H, W = cells.shape
    labels = np.full((H, W), -1, np.int32)
    n = 0
    for r0, c0 in zip(*np.where(cells)):
        if labels[r0, c0] >= 0:
            continue
        stack = [(int(r0), int(c0))]
        labels[r0, c0] = n
        while stack:
            r, c = stack.pop()
            for dr, dc in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                rr, cc = r + dr, c + dc
                if 0 <= rr < H and 0 <= cc < W and cells[rr, cc] and labels[rr, cc] < 0:
                    labels[rr, cc] = n
                    stack.append((rr, cc))
        n += 1
    return labels, n
