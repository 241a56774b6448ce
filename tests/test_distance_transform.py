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


class TestVoronoiGraph:
    """Diagram graph extraction (voronoi_diagram.h:40-49 semantics)."""

    def test_plus_shape(self):
        import numpy as np
        from g2o_frontend_tpu.ops.voronoi_graph import extract_graph

        mask = np.zeros((21, 21), bool)
        mask[10, 2:19] = True  # horizontal bar
        mask[2:19, 10] = True  # vertical bar
        g = extract_graph(mask)
        # one junction + four endpoints, four edges, one component
        assert g.n_vertices == 5, g.vertices
        assert g.n_edges == 4
        assert g.n_components == 1
        degs = np.zeros(g.n_vertices, int)
        for (i, j, L, path) in g.edges:
            degs[i] += 1
            degs[j] += 1
            assert L == len(path) - 1  # axis-aligned chains
        assert sorted(degs) == [1, 1, 1, 1, 4]

    def test_two_components(self):
        import numpy as np
        from g2o_frontend_tpu.ops.voronoi_graph import extract_graph

        mask = np.zeros((16, 32), bool)
        mask[4, 2:12] = True
        mask[11, 18:30] = True
        g = extract_graph(mask)
        assert g.n_vertices == 4
        assert g.n_edges == 2
        assert g.n_components == 2

    def test_floor_plan_corridor(self):
        """Synthetic two-room floor plan: the diagram skeleton of the free
        space links the rooms through the doorway."""
        import numpy as np
        import jax.numpy as jnp
        from g2o_frontend_tpu.ops.distance_transform import (
            distance_transform, voronoi_edges)
        from g2o_frontend_tpu.ops.voronoi_graph import extract_graph, region_labels

        H, W = 48, 80
        occ = np.zeros((H, W), bool)
        occ[0, :] = occ[-1, :] = True
        occ[:, 0] = occ[:, -1] = True
        occ[:, 40] = True
        occ[20:28, 40] = False  # doorway
        dist, nearest = distance_transform(jnp.asarray(occ))
        mask = np.asarray(voronoi_edges(np.asarray(nearest)))
        free = ~occ
        g = extract_graph(mask, np.asarray(dist))
        assert g.n_vertices >= 2
        assert g.n_edges >= 1
        assert g.n_components >= 1
        # the diagram reaches both rooms
        cols = g.vertices[:, 1]
        assert (cols < 40).any() and (cols > 40).any()
        # vertices sit in cleared space
        assert (g.vertex_dist > 0.5).all()
        labels, n_regions = region_labels(mask, free)
        assert n_regions >= 2
