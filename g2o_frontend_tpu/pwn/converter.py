"""Depth image -> point-with-normal cloud (the DepthImageConverter analog).

One fused jitted pipeline replacing the reference's multi-object chain
``DepthImageConverterIntegralImage::compute``
(``depthimageconverterintegralimage.cpp:16-57``):

  unproject -> per-pixel interval radii -> integral-image window moments
  -> closed-form 3x3 eigendecomposition -> normals/curvature
  -> point & normal information matrices -> optional sensor-offset transform

Semantics preserved from the reference:
- per-pixel window radius clamped to [min_image_radius, max_image_radius]
  (``statscalculatorintegralimage.cpp:45-49``),
- windows with fewer than min_points valid points produce no normal (``:53``),
- normals flipped toward the viewpoint, and ZEROED where curvature exceeds
  curvature_threshold (``:72-80``),
- point omegas U diag(flat | 1/eigenvalues) U^T, normal omegas flat/non-flat
  diagonal, zero where the normal is zero
  (``informationmatrixcalculator.cpp:9-59``).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.eigh3x3 import eigh3x3
from ..ops.integral_image import window_moments
from .cloud import Cloud
from .projector import PinholeProjector


@dataclass(frozen=True)
class ConverterConfig:
    """Defaults follow ``StatsCalculatorIntegralImage`` /
    ``InformationMatrixCalculator`` constructors and the reference conf files
    (``pwn_core/conf/pwn_aligner_1_1.conf``)."""

    world_radius: float = 0.1
    min_image_radius: int = 10
    max_image_radius: int = 30
    min_points: int = 50
    curvature_threshold: float = 0.02
    # Number of static window-radius levels (geometric between min/max image
    # radius). Per-pixel-exact radii need arbitrary gathers that serialize on
    # TPU; a few shifted-slice passes + select run at VPU speed. 0 = exact.
    n_radius_levels: int = 4
    # point information (tangent-frame diagonal): strong along normal
    point_flat_info: tuple = (1000.0, 1.0, 1.0)
    # normal information diagonals
    normal_flat_info: tuple = (100.0, 100.0, 100.0)
    normal_nonflat_info: tuple = (1.0, 1.0, 1.0)


@partial(jax.jit, static_argnames=("projector", "config"))
def depth_to_cloud(
    depth,
    projector: PinholeProjector,
    config: ConverterConfig = ConverterConfig(),
    sensor_offset=None,
) -> Cloud:
    """Convert a (H, W) depth image to an image-organized Cloud."""
    cfg = config
    points, valid = projector.unproject(depth)

    radii = projector.project_intervals(depth, cfg.world_radius)
    radii = jnp.clip(radii, cfg.min_image_radius, cfg.max_image_radius)

    levels = None
    if cfg.n_radius_levels > 0:
        lo, hi = cfg.min_image_radius, cfg.max_image_radius
        n_lev = min(cfg.n_radius_levels, hi - lo + 1)
        levels = tuple(
            sorted(
                {
                    int(round(lo * (hi / lo) ** (k / max(n_lev - 1, 1))))
                    for k in range(n_lev)
                }
            )
        )
    n, mean, cov = window_moments(points, valid, radii, levels=levels)
    enough = valid & (n >= cfg.min_points)

    lam, V = eigh3x3(cov)
    lam = jnp.maximum(lam, 0.0)
    normal = V[..., :, 0]  # smallest-eigenvalue direction
    # flip toward the viewpoint (camera at origin): n . p < 0
    flip = jnp.sum(normal * points, axis=-1) > 0
    normal = jnp.where(flip[..., None], -normal, normal)
    # (omega = U diag U^T is invariant to eigenvector sign; V left as-is)

    curv = lam[..., 0] / jnp.maximum(lam[..., 0] + lam[..., 1] + lam[..., 2], 1e-12)
    flat = curv < cfg.curvature_threshold
    has_normal = enough & flat  # reference zeroes normals on curved areas
    normal = jnp.where(has_normal[..., None], normal, 0.0)

    # point information matrices: U diag(info) U^T in the local frame
    flat_diag = jnp.asarray(cfg.point_flat_info, depth.dtype)
    inv_lam = 1.0 / jnp.maximum(lam, 1e-7)
    diag = jnp.where(flat[..., None], flat_diag, inv_lam)
    omega_p = jnp.einsum("...ij,...j,...kj->...ik", V, diag, V)
    omega_p = jnp.where(has_normal[..., None, None], omega_p, 0.0)

    nf = jnp.asarray(cfg.normal_flat_info, depth.dtype)
    nn = jnp.asarray(cfg.normal_nonflat_info, depth.dtype)
    omega_n_diag = jnp.where(flat[..., None], nf, nn)
    omega_n = (
        jnp.eye(3, dtype=depth.dtype) * omega_n_diag[..., None, :]
    )
    omega_n = jnp.where(has_normal[..., None, None], omega_n, 0.0)

    cloud = Cloud(
        points=points,
        normals=normal,
        curvature=jnp.where(enough, curv, 1.0),
        eigenvalues=jnp.where(enough[..., None], lam, 0.0),
        eigenvectors=V,
        omega_p=omega_p,
        omega_n=omega_n,
        valid=valid,
    )
    if sensor_offset is not None:
        cloud = cloud.transform(sensor_offset)
    return cloud
