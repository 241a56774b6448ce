"""Jump-flood distance transform / Voronoi / skeleton tests (ref #31,
oracle = brute-force nearest-seed distances, the `diagram_test.cpp` role)."""
import numpy as np
import jax.numpy as jnp

from g2o_frontend_tpu.ops.distance_transform import (
    distance_transform,
    skeletonize,
    voronoi_edges,
)

rng = np.random.default_rng(21)


class TestDistanceTransform:
    def test_matches_bruteforce(self):
        H, W = 48, 64
        occ = np.zeros((H, W), bool)
        seeds = rng.integers(0, [H, W], (12, 2))
        occ[seeds[:, 0], seeds[:, 1]] = True
        d, nearest = distance_transform(jnp.asarray(occ))
        d = np.asarray(d)
        # brute force
        rr, cc = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        bf = np.full((H, W), np.inf)
        for r, c in seeds:
            bf = np.minimum(bf, np.sqrt((rr - r) ** 2 + (cc - c) ** 2))
        np.testing.assert_allclose(d, bf, atol=1e-4)

    def test_seed_cells_zero(self):
        occ = np.zeros((16, 16), bool)
        occ[5, 7] = True
        d, nearest = distance_transform(jnp.asarray(occ))
        assert float(d[5, 7]) == 0.0
        assert tuple(np.asarray(nearest)[5, 7]) == (5, 7)

    def test_no_seeds(self):
        occ = np.zeros((8, 8), bool)
        d, nearest = distance_transform(jnp.asarray(occ))
        assert not np.isfinite(np.asarray(d)).any()
        assert (np.asarray(nearest) == -1).all()


class TestVoronoi:
    def test_two_walls_median_line(self):
        """Two vertical walls -> Voronoi boundary near the median column."""
        H, W = 32, 64
        occ = np.zeros((H, W), bool)
        occ[:, 2] = True
        occ[:, 61] = True
        d, nearest = distance_transform(jnp.asarray(occ))
        edges = np.asarray(voronoi_edges(nearest, min_seed_separation=4.0))
        cols = np.where(edges.any(axis=0))[0]
        assert len(cols) > 0
        mid = (2 + 61) / 2
        assert np.all(np.abs(cols - mid) <= 2), cols

    def test_skeleton_corridor(self):
        H, W = 24, 60
        occ = np.zeros((H, W), bool)
        occ[0, :] = True
        occ[-1, :] = True
        d, _ = distance_transform(jnp.asarray(occ))
        sk = np.asarray(skeletonize(d, threshold=2.0))
        mid_rows = np.where(sk[:, W // 2])[0]
        assert len(mid_rows) >= 1
        assert np.all(np.abs(mid_rows - (H - 1) / 2) <= 1.5), mid_rows
