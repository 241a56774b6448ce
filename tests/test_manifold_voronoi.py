"""Manifold Voronoi extraction: synthetic corridor with known geometry.

Pattern: plant an analytic scene (floor + two walls), check the grid
classification and the Voronoi ridge location against ground truth —
the analog of the reference's visual checks on ``ManifoldVoronoiData``
(``manifold_voronoi_extractor.cpp``, ``voronoi/diagram_test.cpp``).
"""
import jax.numpy as jnp
import numpy as np

from g2o_frontend_tpu.pwn.cloud import Cloud
from g2o_frontend_tpu.slam.graph_merge import map_entropy
from g2o_frontend_tpu.slam.manifold_voronoi import (
    ManifoldVoronoiConfig,
    ManifoldVoronoiExtractor,
    manifold_diagram,
    manifold_grid,
)


def _flat_cloud(points, normals):
    """Minimal Cloud from (N, 3) arrays, stored as a (3, 1, N) image."""
    p = jnp.asarray(points, jnp.float32).T[:, None, :]
    n = jnp.asarray(normals, jnp.float32).T[:, None, :]
    N = p.shape[-1]
    return Cloud(
        p=p,
        n=n,
        curv=jnp.zeros((1, N)),
        ev=jnp.zeros((3, 1, N)),
        evec=jnp.zeros((9, 1, N)),
        op=jnp.zeros((6, 1, N)),
        on=jnp.zeros((6, 1, N)),
        valid=jnp.ones((1, N), bool),
    )


def _corridor(n=4000, seed=0):
    """Floor z=0 (normal +z) in |y|<2, walls at y=+-2 with horizontal
    normals, x in [-8, 8]."""
    rng = np.random.default_rng(seed)
    xf = rng.uniform(-8, 8, n)
    yf = rng.uniform(-2, 2, n)
    floor_p = np.stack([xf, yf, np.zeros(n)], -1)
    floor_n = np.tile([0.0, 0.0, 1.0], (n, 1))
    xw = rng.uniform(-8, 8, n)
    zw = rng.uniform(0, 1.5, n)
    wall_p = np.concatenate(
        [
            np.stack([xw, np.full(n, 2.0), zw], -1),
            np.stack([xw, np.full(n, -2.0), zw], -1),
        ]
    )
    wall_n = np.tile([0.0, 1.0, 0.0], (2 * n, 1))
    return np.concatenate([floor_p, wall_p]), np.concatenate([floor_n, wall_n])


class TestManifoldGrid:
    def test_floor_free_walls_obstacle(self):
        pts, nrm = _corridor()
        cloud = _flat_cloud(pts, nrm)
        height, obstacle = manifold_grid(
            cloud.p[None], cloud.n[None], cloud.valid[None],
            x_size=100, y_size=100, resolution=0.2,
        )
        height = np.asarray(height)
        obstacle = np.asarray(obstacle)
        # grid x = 50 + p.x/0.2, y = 50 + p.y/0.2
        # walls at p.y = +-2 -> gy = 40, 60
        assert obstacle[20:80, 40].mean() > 0.9
        assert obstacle[20:80, 60].mean() > 0.9
        # corridor interior is free floor at height code 10000 (z=0)
        inner = height[20:80, 45:56]
        assert not obstacle[20:80, 45:56].any()
        filled = inner < 30000
        assert filled.mean() > 0.8  # sampling leaves a few empty cells
        assert np.all(inner[filled] == 10000)

    def test_min_pz_wins(self):
        # two points in one cell: deeper z (lower pz code) must win
        pts = np.array([[0.05, 0.05, 0.0], [0.05, 0.05, 1.0]])
        nrm = np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])  # floor vs wall
        cloud = _flat_cloud(pts, nrm)
        height, obstacle = manifold_grid(
            cloud.p[None], cloud.n[None], cloud.valid[None],
            x_size=10, y_size=10, resolution=0.2,
        )
        # winner is z=1.0 (pz 9000), a wall point -> obstacle
        assert int(height[5, 5]) == 9000
        assert bool(obstacle[5, 5])

    def test_diagram_ridge_on_corridor_axis(self):
        pts, nrm = _corridor()
        cloud = _flat_cloud(pts, nrm)
        _, obstacle = manifold_grid(
            cloud.p[None], cloud.n[None], cloud.valid[None],
            x_size=100, y_size=100, resolution=0.2,
        )
        dist, edges, skel = manifold_diagram(obstacle)
        dist = np.asarray(dist)
        # equidistant ridge between the two walls is the corridor axis gy=50
        ridge = np.asarray(edges) | np.asarray(skel)
        assert ridge[30:70, 48:53].any(axis=1).mean() > 0.8
        # distance field peaks at the axis
        assert dist[50, 50] > dist[50, 43]


class TestExtractor:
    def test_multi_keyframe_accumulation(self):
        pts, nrm = _corridor(n=1500)
        half = len(pts) // 2
        c1 = _flat_cloud(pts[:half], nrm[:half])
        # second keyframe shifted 1 m along x: store in its own frame
        T2 = np.eye(4)
        T2[0, 3] = 1.0
        p2 = pts[half:].copy()
        p2[:, 0] -= 1.0
        c2 = _flat_cloud(p2, nrm[half:])
        ex = ManifoldVoronoiExtractor(ManifoldVoronoiConfig(deque_size=5))
        ex.add_keyframe(0, c1, np.eye(4))
        ex.add_keyframe(1, c2, T2)
        data = ex.extract(key_node_id=0)
        assert data.node_id == 0
        obstacle = np.asarray(data.obstacle)
        # both halves of the corridor walls present in frame 0 coordinates
        assert obstacle[:, 40].sum() > 20
        assert obstacle[:, 60].sum() > 20


def test_map_entropy():
    occ = np.full((8, 8), -1.0, np.float32)
    occ[2, 2] = 0.5  # 1 bit
    occ[3, 3] = 0.0  # crisp
    occ[4, 4] = 1.0  # crisp
    total, h = map_entropy(occ)
    assert abs(float(total) - np.log(2.0)) < 1e-4
    assert float(h[5, 5]) == -1.0  # unknown marker
