"""Tests: sensor synchronizer, cloud merger, world simulator."""
import numpy as np
import jax.numpy as jnp

from g2o_frontend_tpu.graph.store import graph2d_from_log
from g2o_frontend_tpu.io.sensors import (
    RobotConfiguration,
    Sensor,
    SensorData,
    SensorDataSynchronizer,
)
from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud
from g2o_frontend_tpu.pwn.merger import MergerConfig, add_cloud, collapse, empty_model
from g2o_frontend_tpu.slam.simulator import SimulatorConfig, simulate
from g2o_frontend_tpu.solvers import pose_graph as pg
from g2o_frontend_tpu.utils.synth import default_projector, render_planes_depth


class TestSynchronizer:
    def test_frames_when_conditions_hold(self):
        sync = SensorDataSynchronizer(["depth", "imu"])
        sync.add_sync_time_condition("depth", "imu", 0.05)
        assert sync.process(SensorData("depth", 1.00, "d0")) is None
        frame = sync.process(SensorData("imu", 1.02, "i0"))
        assert frame is not None and frame["depth"].payload == "d0"

    def test_out_of_window_never_fires(self):
        sync = SensorDataSynchronizer(["a", "b"])
        sync.add_sync_time_condition("a", "b", 0.01)
        assert sync.process(SensorData("a", 1.0)) is None
        assert sync.process(SensorData("b", 2.0)) is None  # too far apart

    def test_stale_partial_dropped(self):
        sync = SensorDataSynchronizer(["a", "b"])
        sync.add_sync_time_condition("a", "b", 0.05)
        sync.process(SensorData("a", 1.0))
        sync.process(SensorData("a", 2.0))  # replaces, drops partial
        assert sync.dropped == 1
        frame = sync.process(SensorData("b", 2.01))
        assert frame is not None and frame["a"].timestamp == 2.0

    def test_robot_configuration_offsets(self):
        rc = RobotConfiguration()
        rc.add_sensor(Sensor(topic="/kinect", offset=[0.1, 0, 0.3, 0, 0, 0, 1]))
        T = rc.sensor_offset("/kinect")
        np.testing.assert_allclose(T[:3, 3], [0.1, 0, 0.3])
        np.testing.assert_allclose(rc.sensor_offset("/unknown"), np.eye(4))


class TestMerger:
    def test_duplicate_points_collapse(self):
        proj = default_projector(H=96, W=128)
        ccfg = ConverterConfig(min_image_radius=3, max_image_radius=8, min_points=12)
        depth = render_planes_depth(np.eye(4), proj)
        cloud = depth_to_cloud(depth, proj, ccfg)
        model = empty_model(capacity=65536)
        model = add_cloud(model, cloud)
        n1 = model.n_points()
        # add the SAME cloud again: every point should collapse
        model = add_cloud(model, cloud)
        n2 = model.n_points()
        assert n2 > n1
        merged = collapse(model, proj, config=MergerConfig(distance_threshold=0.05))
        n3 = merged.n_points()
        assert n3 < n2 * 0.7, (n1, n2, n3)
        # fused weights: survivors of duplicated regions carry weight 2
        w = np.asarray(merged.weights)[np.asarray(merged.mask)]
        assert (w >= 2.0 - 1e-6).sum() > 0.5 * n3


class TestSimulator:
    def test_world_is_optimizable(self):
        world = simulate(SimulatorConfig(n_poses=120, n_landmarks=30, seed=3))
        assert len(world.closure_edges) > 0
        log = world.to_g2o_log(with_landmarks=False)
        g, _ = graph2d_from_log(log)
        chi2_0 = float(pg.chi2_se2(g))
        g_opt, stats = pg.optimize_se2(g, iters=10, cg_iters=100)
        chi2_1 = float(np.asarray(stats.chi2)[-1])
        assert chi2_1 < chi2_0
        # optimized trajectory closer to ground truth than odometry init
        est = np.asarray(g_opt.poses)[: len(world.gt_poses)]
        init = world.noisy_init()
        err_opt = np.linalg.norm(est[:, :2] - world.gt_poses[:, :2], axis=1).mean()
        err_init = np.linalg.norm(init[:, :2] - world.gt_poses[:, :2], axis=1).mean()
        assert err_opt <= err_init + 1e-6, (err_opt, err_init)

    def test_landmark_observations_consistent(self):
        world = simulate(SimulatorConfig(n_poses=50, n_landmarks=20, seed=4))
        for (p, l, z, _) in world.observations[:50]:
            x = world.gt_poses[p]
            c, s = np.cos(x[2]), np.sin(x[2])
            R = np.array([[c, s], [-s, c]])
            pred = R @ (world.landmarks[l] - x[:2])
            assert np.linalg.norm(pred - z) < 0.3
