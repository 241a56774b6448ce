"""Submap-based 2D laser SLAM (mapper/graph_slam GraphSLAM equivalent).

Re-design of ``mapper/graph_slam/graph_slam.{h,cpp}`` (inner/outer `SubMap`
local-map matching over `CorrelativeMatcher`):

- scans accumulate into the current *submap* likelihood grid (anchored at
  the submap's first pose),
- per scan: correlative match (FFT; optional gradient polish) against the
  current submap refines odometry and adds a pose-graph edge,
- every `scans_per_submap` scans a new submap starts; finished submaps keep
  their grid,
- *loop closing*: each new submap is matched against older submaps whose
  anchors are nearby; a strong correlative peak adds an inter-submap edge,
- the SE2 pose graph (anchors + scan poses) is optimized with the batched
  LM-PCG solver.

Works directly on the bundled ``datasets/2D/graphSE2.g2o`` laser log.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..laser.matcher_refine import gradient_refine
from ..laser.scan_matcher import (GridSpec, build_likelihood_map,
                                  correlative_match_multires)
from ..utils import lie


@dataclass
class GridSlamConfig:
    resolution: float = 0.05
    map_half_size: float = 15.0  # meters from submap anchor
    sigma_cells: float = 1.5
    scans_per_submap: int = 20
    search_thetas_deg: float = 10.0
    theta_step_deg: float = 1.0
    search_radius_m: float = 1.5
    min_match_score: float = 8.0
    loop_anchor_distance: float = 8.0
    loop_min_score: float = 12.0
    loop_search_radius_m: float = 4.0
    odom_info: tuple = (400.0, 400.0, 1600.0)
    match_info: tuple = (800.0, 800.0, 3200.0)
    loop_info: tuple = (200.0, 200.0, 800.0)
    max_range: float = 40.0
    gradient_polish_steps: int = 0


def _pad_pow2_pts(pts, min_cap=256):
    """Pad an (N, 2) point set to a power-of-two bucket with a valid mask.

    Every scan has a different return count; without bucketing each
    correlative match / map build compiles a fresh XLA program (the round-2
    grid-SLAM run spent most of its 418 s recompiling). Buckets bound the
    number of distinct shapes to a handful per log."""
    n = len(pts)
    cap = max(min_cap, 1 << max(0, (n - 1)).bit_length())
    out = np.zeros((cap, 2), np.float32)
    out[:n] = pts
    mask = np.arange(cap) < n
    return out, mask


@dataclass
class SubMap:
    anchor_idx: int  # pose index of the submap anchor
    spec: GridSpec
    points: list = field(default_factory=list)  # scans in anchor frame
    likelihood: object = None  # lazily (re)built grid


class GridSlam2D:
    def __init__(self, config: GridSlamConfig = GridSlamConfig()):
        self.cfg = config
        self.poses: list[np.ndarray] = []
        self.edges: list = []  # (i, j, z, info)
        self.submaps: list[SubMap] = []
        self._scan_count = 0

    # -- helpers ------------------------------------------------------------
    def _spec(self):
        c = self.cfg
        n = int(2 * c.map_half_size / c.resolution)
        return GridSpec(rows=n, cols=n, resolution=c.resolution,
                        origin_x=-c.map_half_size, origin_y=-c.map_half_size)

    def _rebuild(self, sm: SubMap):
        pts = np.concatenate(sm.points, 0) if sm.points else np.zeros((0, 2), np.float32)
        pad, mask = _pad_pow2_pts(pts, min_cap=1024)
        sm.likelihood = build_likelihood_map(
            jnp.asarray(pad), jnp.asarray(mask), sm.spec,
            sigma_cells=self.cfg.sigma_cells,
        )

    @staticmethod
    def _rel(a, b):
        return np.asarray(
            lie.se2_relative(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
        )

    # -- main ---------------------------------------------------------------
    def process_scan(self, ranges, angles, odom_delta):
        cfg = self.cfg
        ranges = np.asarray(ranges, np.float32)
        angles = np.asarray(angles, np.float32)
        valid = (ranges > 1e-3) & (ranges < cfg.max_range) & np.isfinite(ranges)
        pts = np.stack([ranges * np.cos(angles), ranges * np.sin(angles)], -1)[valid]

        if not self.poses:
            self.poses.append(np.zeros(3, np.float32))
            sm = SubMap(anchor_idx=0, spec=self._spec())
            sm.points.append(pts)
            self._rebuild(sm)
            self.submaps.append(sm)
            self._scan_count = 1
            return {"matched": False, "new_submap": True}

        prev = self.poses[-1]
        pred = np.asarray(
            lie.se2_compose(jnp.asarray(prev, jnp.float32),
                            jnp.asarray(odom_delta, jnp.float32))
        )
        self.poses.append(pred.copy())
        i, j = len(self.poses) - 2, len(self.poses) - 1
        self.edges.append((i, j, np.asarray(odom_delta, np.float32),
                           np.diag(cfg.odom_info)))

        sm = self.submaps[-1]
        anchor = self.poses[sm.anchor_idx]
        # scan pose in the submap frame, predicted
        local_pred = self._rel(anchor, pred)
        matched = self._match_into(sm, pts, local_pred, j,
                                   cfg.search_radius_m, cfg.min_match_score,
                                   cfg.match_info)

        # insert the scan into the submap at the current best estimate
        local = self._rel(anchor, self.poses[-1])
        c, s = np.cos(local[2]), np.sin(local[2])
        R = np.array([[c, -s], [s, c]], np.float32)
        sm.points.append(pts @ R.T + local[:2])
        self._scan_count += 1

        new_submap = False
        if self._scan_count % cfg.scans_per_submap == 0:
            self._rebuild(sm)  # finalize
            nm = SubMap(anchor_idx=j, spec=self._spec())
            nm.points.append(pts)
            self._rebuild(nm)
            self.submaps.append(nm)
            new_submap = True
            self._close_loops(nm)
        elif len(sm.points) % 5 == 0:
            self._rebuild(sm)

        return {"matched": matched, "new_submap": new_submap}

    def _match_into(self, sm: SubMap, pts, local_pred, pose_idx,
                    radius_m, min_score, info):
        """Correlative-match a scan into a submap; adds an edge on success."""
        cfg = self.cfg
        if sm.likelihood is None:
            self._rebuild(sm)
        thetas = np.deg2rad(
            np.arange(-cfg.search_thetas_deg, cfg.search_thetas_deg + 1e-6,
                      cfg.theta_step_deg)
        ).astype(np.float32) + local_pred[2]
        # search around the predicted local pose: shift scan by prediction
        pad, mask = _pad_pow2_pts(pts)
        res = correlative_match_multires(
            sm.likelihood,
            jnp.asarray(pad),
            jnp.asarray(mask),
            sm.spec,
            jnp.asarray(thetas),
            search_radius_cells=int(radius_m / cfg.resolution),
            translation_prior=jnp.asarray(local_pred[:2], jnp.float32),
        )
        score = float(res.score)
        if score < min_score:
            return False
        match_local = np.asarray(res.pose)
        if cfg.gradient_polish_steps:
            pose_ref, _ = gradient_refine(
                sm.likelihood, jnp.asarray(pts, jnp.float32),
                jnp.ones(len(pts), bool), sm.spec,
                jnp.asarray(match_local, jnp.float32),
                steps=cfg.gradient_polish_steps,
            )
            match_local = np.asarray(pose_ref)
        # edge anchor -> pose with measurement = matched local pose
        anchor = self.poses[sm.anchor_idx]
        self.edges.append(
            (sm.anchor_idx, pose_idx, match_local.astype(np.float32),
             np.diag(info))
        )
        # snap the current estimate to the match
        self.poses[pose_idx] = np.asarray(
            lie.se2_compose(jnp.asarray(anchor, jnp.float32),
                            jnp.asarray(match_local, jnp.float32))
        )
        return True

    def _close_loops(self, new_sm: SubMap):
        cfg = self.cfg
        a_new = self.poses[new_sm.anchor_idx]
        first_pts = new_sm.points[0]
        for old in self.submaps[:-2]:
            a_old = self.poses[old.anchor_idx]
            if np.linalg.norm(a_new[:2] - a_old[:2]) > cfg.loop_anchor_distance:
                continue
            local_pred = self._rel(a_old, a_new)
            self._match_into(
                old, first_pts, local_pred, new_sm.anchor_idx,
                cfg.loop_search_radius_m, cfg.loop_min_score, cfg.loop_info,
            )

    # -- optimization -------------------------------------------------------
    def optimize(self, iters=10, cg_iters=100):
        from ..graph.store import graph2d_from_log
        from ..io.g2o import G2OLog
        from ..solvers.pose_graph import optimize_se2

        log = G2OLog(
            se2_ids=np.arange(len(self.poses)),
            se2_poses=np.asarray(self.poses, np.float64),
            edge_se2_ij=np.asarray([[i, j] for (i, j, _, _) in self.edges]),
            edge_se2_meas=np.asarray([z for (_, _, z, _) in self.edges]),
            edge_se2_info=np.asarray([w for (_, _, _, w) in self.edges]),
            fixed_ids=np.array([0]),
        )
        g, _ = graph2d_from_log(log)
        g_opt, stats = optimize_se2(g, iters=iters, cg_iters=cg_iters)
        poses = np.asarray(g_opt.poses)[: len(self.poses)]
        for k in range(len(self.poses)):
            self.poses[k] = poses[k].astype(np.float32)
        return float(np.asarray(stats.chi2)[-1])

    def stats(self):
        return {
            "n_poses": len(self.poses),
            "n_edges": len(self.edges),
            "n_submaps": len(self.submaps),
        }
