"""Multi-graph matching and merging (graph_merge toolkit, ref #32).

Re-design of ``graph_merge/``'s merge pipeline (``graph_matcher.h:19-66``,
``graph_merge.cpp:38``, ``match_merge.cpp:47``):

- `match_graphs`: estimate the SE2 transform between two pose graphs from
  tentative node correspondences — gated NN over node positions under an
  initial guess, then vectorized RANSAC with the pose-set solver,
- `merge_graphs`: map graph B into A's frame, concatenate, and connect with
  inter-graph edges at matched node pairs; one joint optimization welds the
  maps,
- `overlap_score`: the evaluation metric of `compute_score.cpp` — fraction
  of nodes of B within a radius of some node of A after alignment.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..io.g2o import G2OLog
from ..ransac import solvers as rsolvers
from ..ransac.engine import ransac
from ..utils import lie


@dataclass
class GraphMatchResult:
    transform: np.ndarray  # (3,) SE2 chart: B -> A
    pairs: list  # [(idx_a, idx_b)]
    ok: bool


def match_graphs(
    poses_a,
    poses_b,
    initial_guess=np.zeros(3),
    gate: float = 2.0,
    inlier_threshold: float = 0.5,
    n_hypotheses: int = 512,
    seed: int = 0,
) -> GraphMatchResult:
    """Find T mapping graph-B poses into graph-A's frame."""
    A = np.asarray(poses_a, np.float32)
    B = np.asarray(poses_b, np.float32)
    Bg = np.asarray(
        lie.se2_apply(jnp.asarray(initial_guess, jnp.float32), jnp.asarray(B[:, :2]))
    )
    # gated NN from B to A
    d2 = ((Bg[:, None, :] - A[None, :, :2]) ** 2).sum(-1)
    nn = d2.argmin(1)
    ok = d2[np.arange(len(B)), nn] < gate * gate
    if ok.sum() < 3:
        return GraphMatchResult(np.asarray(initial_guess), [], False)
    pa = A[nn, :2]
    res = ransac(
        jax.random.PRNGKey(seed),
        jnp.asarray(pa),
        jnp.asarray(B[:, :2]),
        jnp.asarray(ok),
        fit_fn=rsolvers.fit_se2_points,
        err_fn=rsolvers.err_se2_points,
        minimal_size=2,
        inlier_threshold=inlier_threshold**2,
        n_hypotheses=n_hypotheses,
        min_inliers=3,
    )
    inl = np.asarray(res.inliers)
    pairs = [(int(nn[i]), i) for i in range(len(B)) if ok[i] and inl[i]]
    return GraphMatchResult(np.asarray(res.transform), pairs, bool(res.ok))


def overlap_score(poses_a, poses_b, transform, radius: float = 1.0) -> float:
    """Fraction of B nodes landing within `radius` of an A node."""
    A = np.asarray(poses_a)[:, :2]
    B = np.asarray(
        lie.se2_apply(
            jnp.asarray(np.asarray(transform), jnp.float32),
            jnp.asarray(np.asarray(poses_b)[:, :2], jnp.float32),
        )
    )
    d2 = ((B[:, None] - A[None]) ** 2).sum(-1).min(1)
    return float((d2 < radius * radius).mean())


def map_entropy(occupancy, hit_counts=None):
    """Total entropy of an occupancy grid (``compute_entropy.cpp:10-78``).

    The reference app sums the nonnegative per-cell values of a saved
    entropy map (unknown cells are negative and skipped,
    ``compute_entropy.cpp:64-78``); the map itself holds the binary-entropy
    of each cell's occupancy belief. Here both steps are one function:
    ``occupancy`` is the per-cell occupancy probability in [0, 1] with
    unknown cells < 0 (or NaN); returns (total_entropy, per_cell_map) where
    the map holds -p log p - (1-p) log(1-p) and -1 for unknown cells —
    lower total = crisper merged map (the reference's merge-quality metric).
    """
    p = jnp.asarray(occupancy, jnp.float32)
    known = (p >= 0.0) & (p <= 1.0) & jnp.isfinite(p)
    pc = jnp.clip(p, 1e-6, 1.0 - 1e-6)
    h = -(pc * jnp.log(pc) + (1.0 - pc) * jnp.log(1.0 - pc))
    h = jnp.where(known, h, -1.0)
    total = jnp.sum(jnp.where(known, h, 0.0))
    return total, h


def merge_graphs(
    log_a: G2OLog,
    log_b: G2OLog,
    match: GraphMatchResult,
    link_info=None,
) -> G2OLog:
    """Concatenate graph B (remapped by match.transform) onto graph A with
    zero-measurement inter-graph edges at the matched node pairs."""
    T = jnp.asarray(np.asarray(match.transform), jnp.float32)
    nb = len(log_b.se2_ids)
    id_off = (int(log_a.se2_ids.max()) + 1) if len(log_a.se2_ids) else 0
    poses_b = np.asarray(
        jax.vmap(lambda p: lie.se2_compose(T, p))(
            jnp.asarray(log_b.se2_poses, jnp.float32)
        )
    )
    if link_info is None:
        link_info = np.diag([100.0, 100.0, 400.0])
    # inter-graph edges: measurement = current relative pose of the pair
    link_ij, link_z, link_w = [], [], []
    for ia, ib in match.pairs:
        za = log_a.se2_poses[ia]
        zb = poses_b[ib]
        rel = np.asarray(
            lie.se2_relative(jnp.asarray(za, jnp.float32), jnp.asarray(zb, jnp.float32))
        )
        link_ij.append([int(log_a.se2_ids[ia]), int(log_b.se2_ids[ib]) + id_off])
        link_z.append(rel)
        link_w.append(link_info)

    return G2OLog(
        se2_ids=np.concatenate([log_a.se2_ids, log_b.se2_ids + id_off]),
        se2_poses=np.concatenate([log_a.se2_poses, poses_b]),
        edge_se2_ij=np.concatenate(
            [
                log_a.edge_se2_ij,
                log_b.edge_se2_ij + id_off,
                np.asarray(link_ij, np.int64).reshape(-1, 2),
            ]
        ),
        edge_se2_meas=np.concatenate(
            [log_a.edge_se2_meas, log_b.edge_se2_meas, np.asarray(link_z).reshape(-1, 3)]
        ),
        edge_se2_info=np.concatenate(
            [
                log_a.edge_se2_info,
                log_b.edge_se2_info,
                np.asarray(link_w).reshape(-1, 3, 3),
            ]
        ),
        fixed_ids=log_a.fixed_ids if len(log_a.fixed_ids) else np.array([0]),
    )
