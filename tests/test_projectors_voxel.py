"""Cylindrical / multi projector + voxel calculator tests."""
import numpy as np
import jax.numpy as jnp

from g2o_frontend_tpu.pwn.projector import (
    CylindricalProjector,
    MultiProjector,
    PinholeProjector,
)
from g2o_frontend_tpu.pwn.voxel import voxel_downsample, voxelize

rng = np.random.default_rng(31)


class TestCylindrical:
    def test_unproject_project_roundtrip(self):
        proj = CylindricalProjector(rows=64, cols=180, min_distance=0.2,
                                    max_distance=20.0)
        depth = jnp.asarray(rng.uniform(1.0, 8.0, (64, 180)), jnp.float32)
        pts, valid = proj.unproject(depth)
        u, v, r = proj.pixel_of(pts)
        # each pixel's point must project back to (its own column, row, range)
        vv, uu = np.meshgrid(np.arange(64), np.arange(180), indexing="ij")
        np.testing.assert_allclose(np.asarray(u), uu, atol=0.51)
        np.testing.assert_allclose(np.asarray(v), vv, atol=0.51)
        np.testing.assert_allclose(np.asarray(r), np.asarray(depth), rtol=1e-5)

    def test_project_zbuffer(self):
        proj = CylindricalProjector(rows=32, cols=90)
        pts = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]], jnp.float32)
        d, idx = proj.project(pts, jnp.ones(2, bool))
        # the nearer point wins its pixel
        hit = np.asarray(idx) >= 0
        assert hit.sum() == 1
        assert np.asarray(d)[hit][0] == 2.0


class TestMultiProjector:
    def test_two_camera_rig(self):
        cam = PinholeProjector(rows=32, cols=48, fx=40.0, fy=40.0,
                               cx=23.5, cy=15.5, min_distance=0.1, max_distance=10.0)
        eye = tuple(np.eye(4).reshape(-1))
        # second camera translated +0.5 m in x
        T2 = np.eye(4)
        T2[0, 3] = 0.5
        rig = MultiProjector(projectors=((cam, eye), (cam, tuple(T2.reshape(-1)))))
        assert rig.cols == 96 and rig.rows == 32

        depth = jnp.full((32, 96), 2.0, jnp.float32)
        pts, valid = rig.unproject(depth)
        assert bool(valid.all())
        # right-half points are offset by +0.5 in x relative to left half
        left = np.asarray(pts[:, :48])
        right = np.asarray(pts[:, 48:])
        np.testing.assert_allclose(right[:, :, 0] - left[:, :, 0], 0.5, atol=1e-5)

        # project the rig-frame points back: depth reproduced in both halves
        d, idx = rig.project(pts, valid)
        d = np.asarray(d)
        assert (np.abs(d[d > 0] - 2.0) < 1e-3).all()
        assert (d > 0).mean() > 0.9


class TestVoxel:
    def test_centroids(self):
        pts = np.array(
            [[0.01, 0.01, 0.01], [0.03, 0.02, 0.04], [1.0, 1.0, 1.0]], np.float32
        )
        out = voxel_downsample(jnp.asarray(pts), jnp.ones(3, bool), resolution=0.1)
        assert len(out) == 2
        got = sorted(map(tuple, np.round(out, 3)))
        assert np.allclose(got[0], np.mean(pts[:2], 0), atol=1e-5)

    def test_mask_respected(self):
        pts = np.array([[0, 0, 0], [5, 5, 5]], np.float32)
        out = voxel_downsample(jnp.asarray(pts), jnp.asarray([True, False]),
                               resolution=0.1)
        assert len(out) == 1

    def test_downsampling_rate(self):
        pts = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
        out = voxel_downsample(jnp.asarray(pts), jnp.ones(5000, bool),
                               resolution=0.25)
        # 4x4x4 grid => at most ~64 + hash collisions margin
        assert 30 <= len(out) <= 70
