"""Voxel-grid downsampling of clouds (VoxelCalculator analog).

Re-design of ``pwn_core/voxelcalculator.{h,cpp}`` (``voxelcalculator.h:
12-60``): points are hashed into a regular voxel grid and each occupied
voxel keeps the centroid of its points. The reference uses an std::map
accumulator; here it is one scatter-add over linearized voxel keys with a
fixed hash-table capacity (masked, jit-safe).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("resolution", "table_size"))
def voxelize(points, valid, resolution: float = 0.1, table_size: int = 1 << 16):
    """Centroid-downsample a masked point set.

    Args:
      points: (N, 3); valid: (N,) bool; resolution: voxel edge (m).
      table_size: hash capacity (power of two). Collisions merge distinct
        voxels (acceptable for downsampling; raise table_size to reduce).

    Returns (centroids (table_size, 3), counts (table_size,), occupied mask).
    """
    key = jnp.floor(points / resolution).astype(jnp.int32)
    # 3D -> hash (large primes, power-of-two table)
    h = (
        key[:, 0] * 73856093 ^ key[:, 1] * 19349663 ^ key[:, 2] * 83492791
    ) & (table_size - 1)
    h = jnp.where(valid, h, table_size)
    w = valid.astype(points.dtype)
    cnt = jnp.zeros(table_size + 1, points.dtype).at[h].add(w)[:table_size]
    acc = jnp.zeros((table_size + 1, 3), points.dtype).at[h].add(
        points * w[:, None]
    )[:table_size]
    occ = cnt > 0
    centroids = acc / jnp.maximum(cnt, 1.0)[:, None]
    return centroids, cnt, occ


def voxel_downsample(points, valid, resolution: float = 0.1, table_size: int = 1 << 16):
    """Host convenience: compacted (M, 3) centroid array."""
    import numpy as np

    c, n, occ = voxelize(points.reshape(-1, 3), valid.reshape(-1), resolution,
                         table_size)
    occ = np.asarray(occ)
    return np.asarray(c)[occ]
