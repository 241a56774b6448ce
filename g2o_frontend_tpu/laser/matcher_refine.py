"""Hierarchical and gradient scan-match refinement (mapper/matcher parity).

Completes the matcher family of ``mapper/matcher/matching/``:
- `HierarchicalMatcher` (``hierarchical_matcher.h``): coarse-to-fine
  correlative search — run the FFT correlative matcher on pooled maps, then
  refine the argmax on the fine grid with a narrow window,
- `GradientMatcher` (``gradient_matcher.h``): continuous refinement by
  gradient ascent of the bilinearly-interpolated likelihood score — here
  literally `jax.grad` of the sampled score through the interpolation, a
  jitted fixed-step ascent loop.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .scan_matcher import GridSpec, correlative_match


def _bilinear(m, u, v):
    """Sample map m at continuous (u=col, v=row); zero outside."""
    H, W = m.shape
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0
    dv = v - v0

    def at(vv, uu):
        ok = (uu >= 0) & (uu < W) & (vv >= 0) & (vv < H)
        return jnp.where(ok, m[jnp.clip(vv, 0, H - 1), jnp.clip(uu, 0, W - 1)], 0.0)

    return (
        at(v0, u0) * (1 - du) * (1 - dv)
        + at(v0, u0 + 1) * du * (1 - dv)
        + at(v0 + 1, u0) * (1 - du) * dv
        + at(v0 + 1, u0 + 1) * du * dv
    )


def score_pose(likelihood_map, scan_points, scan_valid, spec: GridSpec, pose):
    """Mean map likelihood of the scan transformed by pose [x, y, th]."""
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    R = jnp.array([[c, -s], [s, c]])
    pts = scan_points @ R.T + pose[:2]
    u = (pts[:, 0] - spec.origin_x) / spec.resolution
    v = (pts[:, 1] - spec.origin_y) / spec.resolution
    vals = _bilinear(likelihood_map, u, v)
    w = scan_valid.astype(vals.dtype)
    return jnp.sum(vals * w) / jnp.maximum(jnp.sum(w), 1.0)


@partial(jax.jit, static_argnames=("spec", "steps"))
def gradient_refine(likelihood_map, scan_points, scan_valid, spec: GridSpec,
                    pose0, steps: int = 50, lr=0.05):
    """Gradient-ascent pose refinement; returns (pose, score)."""
    grad_fn = jax.value_and_grad(
        lambda p: score_pose(likelihood_map, scan_points, scan_valid, spec, p)
    )
    # scale-balanced step: meters for x/y, radians for theta
    scale = jnp.array([spec.resolution, spec.resolution, 0.25 * spec.resolution])

    def body(k, state):
        pose, _ = state
        val, g = grad_fn(pose)
        return pose + lr * scale * g / jnp.maximum(jnp.linalg.norm(g * scale), 1e-9), val

    pose, _ = jax.lax.fori_loop(0, steps, body, (pose0, 0.0))
    return pose, score_pose(likelihood_map, scan_points, scan_valid, spec, pose)


def _pool2(m):
    H, W = m.shape
    H2, W2 = H // 2 * 2, W // 2 * 2
    m = m[:H2, :W2]
    return jnp.max(
        m.reshape(H2 // 2, 2, W2 // 2, 2), axis=(1, 3)
    )


def hierarchical_match(likelihood_map, scan_points, scan_valid, spec: GridSpec,
                       thetas, levels: int = 2, search_radius_cells: int = 48,
                       gradient_steps: int = 40):
    """Coarse-to-fine correlative match + gradient polish.

    Max-pooled coarse maps bound the fine score from above (the reference's
    multi-resolution branch-and-bound intuition); here: coarse exhaustive ->
    fine windowed -> continuous gradient refinement.
    """
    # coarse level
    m = likelihood_map
    factor = 1 << levels
    for _ in range(levels):
        m = _pool2(m)
    spec_c = GridSpec(
        rows=m.shape[0], cols=m.shape[1],
        resolution=spec.resolution * factor,
        origin_x=spec.origin_x, origin_y=spec.origin_y,
    )
    res_c = correlative_match(
        m, scan_points, scan_valid, spec_c, thetas,
        search_radius_cells=max(4, search_radius_cells // factor),
    )
    # fine refinement around the coarse pose via gradient ascent
    pose, score = gradient_refine(
        likelihood_map, scan_points, scan_valid, spec, res_c.pose,
        steps=gradient_steps,
    )
    return pose, score, res_c
