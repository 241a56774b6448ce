"""Depth-sensor calibration (pwn_utils/pwn_calibration analog).

The reference estimates a per-pixel multiplicative depth-correction image by
observing flat surfaces (``pwn_utils/pwn_calibration.cpp``). Here:

1. for each calibration frame, fit the dominant plane of the cloud
   (`pwn.planes.extract_planes`),
2. analytically ray-cast that plane to get the IDEAL depth per pixel,
3. accumulate per-pixel ratios ideal/measured; the calibration image is the
   running mean (scatter-free: pure element-wise accumulation).

`apply` multiplies a raw depth image by the calibration image.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .converter import ConverterConfig, depth_to_cloud
from .planes import PlaneExtractorConfig, extract_planes
from .projector import PinholeProjector


class DepthCalibration:
    def __init__(self, projector: PinholeProjector):
        self.projector = projector
        H, W = projector.rows, projector.cols
        self._ratio_sum = np.zeros((H, W))
        self._count = np.zeros((H, W))

    def add_frame(self, depth, plane=None, converter_config=None, plane_config=None):
        """Accumulate one flat-surface observation; returns inlier fraction.

        With `plane=(n, d)` (known geometry, e.g. a measured wall) the
        calibration recovers ABSOLUTE per-pixel multipliers. Without it the
        dominant plane is fitted from the biased data itself, so only
        spatially-varying distortion relative to the frame's own plane fit
        is observable (global depth scale cancels) — same limitation as the
        reference's self-calibration."""
        proj = self.projector
        depth = jnp.asarray(depth, jnp.float32)
        if plane is not None:
            n = np.asarray(plane[0], float)
            d0 = float(plane[1])
        else:
            ccfg = converter_config or ConverterConfig(
                min_image_radius=3, max_image_radius=8, min_points=12
            )
            pcfg = plane_config or PlaneExtractorConfig(min_inliers=200)
            cloud = depth_to_cloud(depth, proj, ccfg)
            ps = extract_planes(cloud, pcfg)
            mask = np.asarray(ps.mask)
            if not mask.any():
                return 0.0
            k = int(np.argmax(np.where(mask, np.asarray(ps.n_inliers), -1)))
            n = np.asarray(ps.normal)[k]
            d0 = float(ps.d[k])
        # ideal depth: ray r(u,v) hits n.p = d0 at z = d0 / (n . dir)
        H, W = proj.rows, proj.cols
        vs, us = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        dirs = np.stack(
            [(us - proj.cx) / proj.fx, (vs - proj.cy) / proj.fy, np.ones((H, W))], -1
        )
        denom = dirs @ n
        ideal = np.where(np.abs(denom) > 1e-6, d0 / denom, 0.0)
        meas = np.asarray(depth)
        ok = (meas > proj.min_distance) & (ideal > proj.min_distance)
        # only pixels near the plane contribute (10% relative gate so a
        # few-percent sensor bias still passes)
        ok &= np.abs(ideal - meas) < np.maximum(0.1, 0.1 * ideal)
        self._ratio_sum[ok] += ideal[ok] / meas[ok]
        self._count[ok] += 1
        return float(ok.mean())

    @property
    def calibration_image(self):
        """Per-pixel multiplier (1.0 where never observed)."""
        return np.where(self._count > 0, self._ratio_sum / np.maximum(self._count, 1), 1.0)

    def apply(self, depth):
        return jnp.asarray(depth) * jnp.asarray(self.calibration_image, jnp.float32)

    def save(self, path):
        np.savez_compressed(path, calib=self.calibration_image, count=self._count)

    @classmethod
    def load(cls, path, projector):
        data = np.load(path)
        c = cls(projector)
        c._ratio_sum = data["calib"] * np.maximum(data["count"], 1)
        c._count = data["count"]
        return c
