"""Model family presets: build each family and ingest a tiny input."""
import numpy as np
import jax.numpy as jnp

from g2o_frontend_tpu import models


def test_family_registry():
    assert set(models.FAMILIES) == {
        "pwn_rgbd_odometry", "pwn_rgbd_slam", "tracker2d", "grid_slam", "line_slam",
    }
    try:
        models.build("nope")
    except ValueError as e:
        assert "unknown family" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_pwn_odometry_family_ingests():
    tr = models.build("pwn_rgbd_odometry", rows=48, cols=64)
    depth = jnp.full((48, 64), 2.0, jnp.float32)
    m = tr.process_frame(depth)
    assert m["keyframe"]
    m = tr.process_frame(depth * 1.01)
    assert m["inliers"] >= 0


def test_pwn_slam_family_composes():
    tracker, closer, reflector = models.build("pwn_rgbd_slam", rows=48, cols=64)
    assert closer.manager is tracker.manager


def test_2d_families_ingest():
    ranges = np.full(180, 4.0, np.float32)
    angles = np.linspace(-np.pi / 2, np.pi / 2, 180).astype(np.float32)
    for name in ("grid_slam", "line_slam"):
        drv = models.build(name)
        drv.process_scan(ranges, angles, np.zeros(3))
    trk = models.build("tracker2d")
    obs = np.array([[1.0, 0.5], [2.0, -0.5]], np.float32)
    trk.process_frame(np.zeros(3, np.float32), obs)
    trk.process_frame(np.array([0.1, 0.0, 0.0], np.float32), obs)


def test_tracker2d_recipes():
    """params.txt recipes are library presets (models.TRACKER2D_RECIPES)."""
    from g2o_frontend_tpu import models

    for name in ("victoria", "world2000", "world1000-dense-highnoise"):
        tr = models.tracker2d(recipe=name)
        assert tr.cfg is not None
    tr = models.tracker2d(recipe="victoria", cg_iters=99)
    assert tr.cfg.cg_iters == 99  # overrides win
    assert tr.cfg.odometry_is_good
