"""Laser subsystem tests: line extraction + correlative scan matching."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from g2o_frontend_tpu.laser.line_extraction import (
    LineExtractorConfig,
    extract_lines,
)
from g2o_frontend_tpu.laser.scan_matcher import (
    GridSpec,
    MatchResult,
    build_likelihood_map,
    correlative_match,
)

DATA = "/root/reference/datasets/2D"
rng = np.random.default_rng(11)


def square_room_scan(n_beams=360, pose=(0.0, 0.0, 0.0), half=4.0, noise=0.0):
    """Simulate a laser scan from inside a square room of half-size `half`."""
    px, py, pth = pose
    angles = np.linspace(-np.pi, np.pi, n_beams, endpoint=False)
    ranges = np.zeros(n_beams)
    for i, a in enumerate(angles):
        d = np.array([np.cos(a + pth), np.sin(a + pth)])
        ts = []
        for nrm, off in [((1, 0), half), ((-1, 0), half), ((0, 1), half), ((0, -1), half)]:
            nrm = np.array(nrm, float)
            denom = d @ nrm
            if abs(denom) > 1e-9:
                t = (off - np.array([px, py]) @ nrm) / denom
                if t > 0:
                    ts.append(t)
        ranges[i] = min(ts) if ts else 0.0
    if noise:
        ranges += rng.normal(0, noise, n_beams)
    return jnp.asarray(ranges, jnp.float32), jnp.asarray(angles, jnp.float32)


class TestLineExtraction:
    def test_square_room_four_lines(self):
        ranges, angles = square_room_scan()
        cfg = LineExtractorConfig(min_points_in_line=10)
        ls = extract_lines(ranges, angles, cfg)
        n_lines = int(np.asarray(ls.mask).sum())
        # 4 walls; endpoints of the scan may split one wall into two
        assert 4 <= n_lines <= 6, n_lines
        # every extracted line's normal must match a wall direction
        nrm = np.asarray(ls.normal)[np.asarray(ls.mask)]
        for v in nrm:
            ax = np.abs(v)
            assert max(ax) > 0.99, v
        # rho ~ 4.0 for all walls
        rho = np.asarray(ls.rho)[np.asarray(ls.mask)]
        np.testing.assert_allclose(rho, 4.0, atol=0.1)

    def test_noisy_room(self):
        ranges, angles = square_room_scan(noise=0.01)
        cfg = LineExtractorConfig(min_points_in_line=10, split_threshold=0.05**2)
        ls = extract_lines(ranges, angles, cfg)
        n_lines = int(np.asarray(ls.mask).sum())
        assert 4 <= n_lines <= 8, n_lines
        rho = np.asarray(ls.rho)[np.asarray(ls.mask)]
        np.testing.assert_allclose(rho, 4.0, atol=0.15)

    def test_point_counts_masked(self):
        ranges, angles = square_room_scan()
        ranges = ranges.at[100:120].set(0.0)  # drop-outs
        ls = extract_lines(ranges, angles)
        counted = float(np.asarray(ls.n_points)[np.asarray(ls.mask)].sum())
        assert counted <= 360 - 20

    @pytest.mark.skipif(not os.path.isdir(DATA), reason="datasets missing")
    def test_real_scan(self):
        from g2o_frontend_tpu.io.g2o import read_g2o

        log = read_g2o(os.path.join(DATA, "graphSE2.g2o"))
        scan = log.laser_scans[0]
        ls = extract_lines(
            jnp.asarray(scan.ranges), jnp.asarray(scan.angles),
            LineExtractorConfig(max_range=float(scan.max_range) - 1e-3),
        )
        n_lines = int(np.asarray(ls.mask).sum())
        assert n_lines >= 3, n_lines  # indoor scan: several wall segments


class TestCorrelativeMatcher:
    def test_recover_translation_rotation(self):
        spec = GridSpec(rows=256, cols=256, resolution=0.05,
                        origin_x=-6.4, origin_y=-6.4)
        # map built from a scan at the origin
        r0, a0 = square_room_scan()
        pts0 = np.stack(
            [np.asarray(r0) * np.cos(np.asarray(a0)),
             np.asarray(r0) * np.sin(np.asarray(a0))], -1)
        lmap = build_likelihood_map(
            jnp.asarray(pts0, jnp.float32), jnp.ones(len(pts0), bool), spec,
            sigma_cells=1.5)

        # scan from a displaced pose
        pose_gt = (0.35, -0.20, np.deg2rad(8.0))
        r1, a1 = square_room_scan(pose=pose_gt)
        pts1 = np.stack(
            [np.asarray(r1) * np.cos(np.asarray(a1)),
             np.asarray(r1) * np.sin(np.asarray(a1))], -1)
        thetas = jnp.asarray(np.deg2rad(np.arange(-15, 16, 1.0)), jnp.float32)
        res = correlative_match(
            lmap, jnp.asarray(pts1, jnp.float32), jnp.ones(len(pts1), bool),
            spec, thetas, search_radius_cells=20)
        pose = np.asarray(res.pose)
        assert abs(pose[2] - pose_gt[2]) < np.deg2rad(1.5), pose
        assert abs(pose[0] - pose_gt[0]) < 0.08, pose
        assert abs(pose[1] - pose_gt[1]) < 0.08, pose

    def test_identity(self):
        spec = GridSpec(rows=128, cols=128, resolution=0.1,
                        origin_x=-6.4, origin_y=-6.4)
        r0, a0 = square_room_scan(n_beams=180)
        pts0 = np.stack(
            [np.asarray(r0) * np.cos(np.asarray(a0)),
             np.asarray(r0) * np.sin(np.asarray(a0))], -1).astype(np.float32)
        lmap = build_likelihood_map(jnp.asarray(pts0), jnp.ones(len(pts0), bool),
                                    spec, sigma_cells=1.0)
        thetas = jnp.asarray(np.deg2rad(np.arange(-5, 6, 1.0)), jnp.float32)
        res = correlative_match(lmap, jnp.asarray(pts0),
                                jnp.ones(len(pts0), bool), spec, thetas,
                                search_radius_cells=10)
        pose = np.asarray(res.pose)
        np.testing.assert_allclose(pose, [0, 0, 0], atol=0.11)
