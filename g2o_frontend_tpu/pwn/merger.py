"""Cloud merging: collapse redundant points after registration (ref Merger).

Re-design of ``pwn_core/merger.cpp:15-110`` (also `pwn_tracker2`'s
`PwnMerger`/`Merger2`): after aligning a new cloud into a model, points that
re-project onto the same pixel with compatible depth and normal are fused
(weight-averaged) and the duplicates dropped. The reference compacts arrays
serially; here the model is a fixed-capacity masked point list and the
collapse is pure scatter arithmetic:

1. z-buffer-project all model points (projector.project),
2. every point whose pixel winner is a *different* point with
   |dz| < distance_threshold and n.n' > normal_threshold collapses onto the
   winner: weighted positions scatter-add onto winners, losers' masks clear,
3. winners take the fused (weight-averaged) position and accumulated weight.

`MergedModel.add_cloud` appends a registered cloud into free capacity slots.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .cloud import Cloud
from .projector import PinholeProjector


@dataclass(frozen=True)
class MergerConfig:
    distance_threshold: float = 0.1  # meters (merger.h default)
    normal_threshold: float = 0.8  # cos angle
    max_point_depth: float = 10.0


class MergedModel(NamedTuple):
    """Flat masked point-with-normal model."""

    points: jnp.ndarray  # (C, 3)
    normals: jnp.ndarray  # (C, 3)
    weights: jnp.ndarray  # (C,) accumulated fusion weight
    mask: jnp.ndarray  # (C,) bool

    @property
    def capacity(self):
        return self.points.shape[0]

    def n_points(self):
        return int(np.asarray(jnp.sum(self.mask)))


def empty_model(capacity: int, dtype=jnp.float32) -> MergedModel:
    return MergedModel(
        points=jnp.zeros((capacity, 3), dtype),
        normals=jnp.zeros((capacity, 3), dtype),
        weights=jnp.zeros(capacity, dtype),
        mask=jnp.zeros(capacity, bool),
    )


@partial(jax.jit, static_argnames=("projector", "config"))
def collapse(model: MergedModel, projector: PinholeProjector,
             transform=None, config: MergerConfig = MergerConfig()) -> MergedModel:
    """One merge pass over the model viewed through `projector` @ transform."""
    cfg = config
    pts = model.points
    if transform is not None:
        pts_view = pts @ transform[:3, :3].T + transform[:3, 3]
    else:
        pts_view = pts
    depth_img, idx_img = projector.project(pts_view, model.mask)
    u, v, d = projector.pixel_of(pts_view)
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    H, W = projector.rows, projector.cols
    inside = (
        model.mask
        & (d > projector.min_distance)
        & (d < cfg.max_point_depth)
        & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    )
    ui = jnp.clip(ui, 0, W - 1)
    vi = jnp.clip(vi, 0, H - 1)
    winner = idx_img[vi, ui]  # flat model index winning this pixel
    wz = depth_img[vi, ui]
    self_idx = jnp.arange(model.capacity, dtype=jnp.int32)
    win_safe = jnp.maximum(winner, 0)
    n_dot = jnp.sum(model.normals * model.normals[win_safe], -1)
    collapses = (
        inside
        & (winner >= 0)
        & (winner != self_idx)
        & (jnp.abs(d - wz) < cfg.distance_threshold)
        & (n_dot > cfg.normal_threshold)
    )
    # fuse: scatter weighted positions of collapsing points onto winners
    C = model.capacity
    w_src = jnp.where(collapses, model.weights, 0.0)
    tgt = jnp.where(collapses, winner, C)  # overflow slot
    add_w = jnp.zeros(C + 1, pts.dtype).at[tgt].add(w_src)[:C]
    add_p = jnp.zeros((C + 1, 3), pts.dtype).at[tgt].add(
        w_src[:, None] * model.points
    )[:C]
    new_w = model.weights + add_w
    new_p = jnp.where(
        (add_w > 0)[:, None],
        (model.weights[:, None] * model.points + add_p)
        / jnp.maximum(new_w, 1e-9)[:, None],
        model.points,
    )
    return MergedModel(
        points=new_p,
        normals=model.normals,
        weights=jnp.where(collapses, 0.0, new_w),
        mask=model.mask & ~collapses,
    )


def add_cloud(model: MergedModel, cloud: Cloud, transform=None) -> MergedModel:
    """Append a (registered) cloud's valid points into free slots (host op)."""
    pts = np.asarray(cloud.points).reshape(-1, 3)
    nrm = np.asarray(cloud.normals).reshape(-1, 3)
    ok = np.asarray(cloud.valid).reshape(-1)
    if transform is not None:
        T = np.asarray(transform)
        pts = pts @ T[:3, :3].T + T[:3, 3]
        nrm = nrm @ T[:3, :3].T
    pts, nrm = pts[ok], nrm[ok]

    mask = np.array(np.asarray(model.mask))
    free = np.where(~mask)[0]
    n_add = min(len(free), len(pts))
    sel = free[:n_add]
    points = np.array(np.asarray(model.points))
    normals = np.array(np.asarray(model.normals))
    weights = np.array(np.asarray(model.weights))
    points[sel] = pts[:n_add]
    normals[sel] = nrm[:n_add]
    weights[sel] = 1.0
    mask[sel] = True
    return MergedModel(
        points=jnp.asarray(points),
        normals=jnp.asarray(normals),
        weights=jnp.asarray(weights),
        mask=jnp.asarray(mask),
    )
