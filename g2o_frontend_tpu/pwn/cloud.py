"""Image-organized point-with-normal clouds.

The reference `pwn::Cloud` (``pwn_core/cloud.h:20-171``) is a compacted
array-of-structs: points, normals, per-point Stats (eigenvectors/values,
curvature), and two information-matrix vectors, with an index image mapping
pixels to array slots. On TPU we keep the cloud *image-organized*: every
per-point quantity is an (H, W, ...) array aligned with the depth image, and
invalid pixels are masked instead of compacted (SURVEY.md §7 hard-part 2:
masked fixed shapes instead of variable-length compaction).

A `Cloud` is a pytree and flows through jit/vmap; `transform()` returns a new
cloud (the analog of ``Cloud::transformInPlace``, ``cloud.cpp``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Cloud(NamedTuple):
    """Per-pixel point-with-normal data.

    Attributes:
      points:   (H, W, 3) 3D points in the cloud frame.
      normals:  (H, W, 3) unit normals; zero where undefined (the reference
                zeroes normals of high-curvature points,
                ``statscalculatorintegralimage.cpp:75-80``).
      curvature:(H, W) lam0/(lam0+lam1+lam2) surface curvature.
      eigenvalues: (H, W, 3) ascending local-covariance eigenvalues.
      eigenvectors:(H, W, 3, 3) columns = eigenvectors (asc. eigenvalue).
      omega_p:  (H, W, 3, 3) point information matrices
                (``informationmatrixcalculator.cpp:9-37``).
      omega_n:  (H, W, 3, 3) normal information matrices (``:39-59``).
      valid:    (H, W) bool — pixel has a valid unprojected point.
    """

    points: jnp.ndarray
    normals: jnp.ndarray
    curvature: jnp.ndarray
    eigenvalues: jnp.ndarray
    eigenvectors: jnp.ndarray
    omega_p: jnp.ndarray
    omega_n: jnp.ndarray
    valid: jnp.ndarray

    @property
    def shape(self):
        return self.points.shape[:2]

    def transform(self, T) -> "Cloud":
        """Apply a 4x4 rigid transform to all geometric quantities."""
        R = T[:3, :3]
        t = T[:3, 3]
        pts = jnp.einsum("ij,hwj->hwi", R, self.points) + t
        nrm = jnp.einsum("ij,hwj->hwi", R, self.normals)
        evec = jnp.einsum("ij,hwjk->hwik", R, self.eigenvectors)
        op = jnp.einsum("ij,hwjk,lk->hwil", R, self.omega_p, R)
        on = jnp.einsum("ij,hwjk,lk->hwil", R, self.omega_n, R)
        return self._replace(
            points=pts, normals=nrm, eigenvectors=evec, omega_p=op, omega_n=on
        )

    def n_valid(self):
        return jnp.sum(self.valid)
