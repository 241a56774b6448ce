"""End-to-end PWN SLAM: tracker + map manager + closer + reflector.

Simulated RGB-D loop inside the analytic room (the GraphSimulator-style
fixture, SURVEY.md §4): the tracker must spawn keyframes, the closer must
find and consensus-validate loop closures, and reflected optimization must
reduce accumulated drift."""
import numpy as np
import pytest
import jax.numpy as jnp

from g2o_frontend_tpu.graph.map_manager import MapManager, MapRelation
from g2o_frontend_tpu.graph.reflector import MapReflector
from g2o_frontend_tpu.pwn.aligner import AlignerConfig
from g2o_frontend_tpu.pwn.converter import ConverterConfig
from g2o_frontend_tpu.slam.map_closer import CloserConfig, MapCloser
from g2o_frontend_tpu.slam.pwn_tracker import PwnTracker, PwnTrackerConfig
from g2o_frontend_tpu.utils import lie
from g2o_frontend_tpu.utils.synth import default_projector, render_planes_depth

PROJ = default_projector(H=96, W=128)
CCFG = ConverterConfig(min_image_radius=3, max_image_radius=8, min_points=12)
ACFG = AlignerConfig(outer_iterations=6)


def camera_orbit(n_frames, radius=0.6):
    """Poses orbiting inside the room, yawing, closing a loop."""
    Ts = []
    for k in range(n_frames):
        a = 2 * np.pi * k / n_frames
        t = np.array([radius * np.cos(a), 0.0, radius * np.sin(a) * 0.5])
        yaw = 0.35 * np.sin(a)
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        Ts.append(T)
    return Ts


class TestMapManager:
    def test_select_and_partition(self):
        mgr = MapManager()
        nodes = []
        for i in range(6):
            T = np.eye(4)
            T[0, 3] = float(i)
            nodes.append(mgr.add_node(T))
        # chain 0-1-2, chain 4-5 (3 isolated)
        for a, b in [(0, 1), (1, 2), (4, 5)]:
            mgr.add_relation(
                MapRelation(nodes[a], nodes[b], np.eye(4), np.eye(6))
            )
        ref = np.eye(4)
        sel = mgr.select_nodes(ref, translational_distance=2.5)
        assert {n.seq for n in sel} == {0, 1, 2}
        parts = mgr.make_partitions(mgr.nodes)
        sizes = sorted(len(p) for p in parts)
        assert sizes == [1, 2, 3]

    def test_callbacks(self):
        mgr = MapManager()
        seen = []
        mgr.node_added_handlers.append(lambda n: seen.append(("n", n.seq)))
        mgr.relation_added_handlers.append(lambda r: seen.append(("r",)))
        a = mgr.add_node(np.eye(4))
        b = mgr.add_node(np.eye(4))
        mgr.add_relation(MapRelation(a, b, np.eye(4), np.eye(6)))
        assert seen == [("n", 0), ("n", 1), ("r",)]


class TestPwnTrackerEndToEnd:
    def test_orbit_tracking_and_closure(self):
        n_frames = 24
        gt = camera_orbit(n_frames)
        tracker = PwnTracker(
            PROJ,
            CCFG,
            ACFG,
            PwnTrackerConfig(new_frame_inliers_fraction=0.7, cache_slots=64),
        )
        for T in gt:
            depth = render_planes_depth(T, PROJ)
            tracker.process_frame(depth)

        assert 3 <= tracker.n_keyframes <= n_frames, tracker.n_keyframes
        # keyframe odometry accumulates bounded drift; the tracker's frame
        # starts at identity, so anchor estimates with gt[0]
        est = gt[0] @ tracker.trajectory_array()
        t_err_odo = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
        assert t_err_odo < 0.6, t_err_odo

        # loop closing: tight selection radius so old and new parts of the
        # orbit form disjoint partitions (reference partition semantics)
        closer = MapCloser(
            tracker.manager,
            tracker.cache,
            PROJ,
            ACFG,
            CloserConfig(
                translational_distance=0.45,
                frame_min_nonzero_threshold=2000,
                frame_max_outliers_threshold=6000,
                frame_min_inliers_threshold=2000,
                consensus_min_times_checked=1,
            ),
        )
        n_closures = 0
        for node in list(tracker.manager.nodes)[2:]:
            rels = closer.process_key_node(node)
            n_closures += len(rels)
        assert n_closures > 0, "no loop closures committed"

        last_kf = tracker.manager.nodes[-1]
        kf_frame = last_kf.payload["frame"]
        before = np.linalg.norm(
            (gt[0] @ last_kf.transform)[:3, 3] - gt[kf_frame][:3, 3]
        )
        reflector = MapReflector(tracker.manager)
        chi2 = reflector.optimize(iters=8, cg_iters=50)
        assert np.isfinite(chi2)
        after = np.linalg.norm(
            (gt[0] @ last_kf.transform)[:3, 3] - gt[kf_frame][:3, 3]
        )
        # optimization with committed closures must not worsen the endpoint
        assert after <= before + 0.05, (before, after)

    def test_keyframe_relations_consistent(self):
        n_frames = 12
        gt = camera_orbit(n_frames, radius=0.4)
        tracker = PwnTracker(
            PROJ, CCFG, ACFG, PwnTrackerConfig(new_frame_inliers_fraction=0.9)
        )
        for T in gt:
            tracker.process_frame(render_planes_depth(T, PROJ))
        mgr = tracker.manager
        assert len(mgr.relations) == len(mgr.nodes) - 1
        # each relation's transform must match the node estimates
        for r in mgr.relations:
            pred = np.linalg.inv(r.node_from.transform) @ r.node_to.transform
            err = np.linalg.inv(r.transform) @ pred
            assert np.linalg.norm(err[:3, 3]) < 5e-2


def test_odometry_scan_matches_host_tracker():
    """On-device lax.scan odometry == host-loop PwnTracker (same policy)."""
    import jax.numpy as jnp

    from g2o_frontend_tpu.pwn.aligner import AlignerConfig
    from g2o_frontend_tpu.pwn.converter import ConverterConfig
    from g2o_frontend_tpu.slam.pwn_tracker import (
        PwnTracker, PwnTrackerConfig, odometry_scan)
    from g2o_frontend_tpu.utils.synth import default_projector, render_planes_depth

    proj = default_projector(H=48, W=64)
    ccfg = ConverterConfig(min_image_radius=2, max_image_radius=5, min_points=8)
    acfg = AlignerConfig(outer_iterations=6)
    depths = []
    K = 6
    for k in range(K):
        T = np.eye(4)
        # motion along y/z: both well-observed by the floor + back wall
        # (x is weakly constrained at this FOV - the side wall grazes the
        # image edge)
        T[:3, 3] = [0.0, 0.02 * k, 0.04 * k]
        depths.append(np.asarray(render_planes_depth(T, proj)))
    depths = np.stack(depths)

    traj, metrics = odometry_scan(
        jnp.asarray(depths), proj, ccfg, acfg, kf_fraction=0.4,
        min_cloud_inliers=200)
    traj = np.asarray(traj)
    assert traj.shape == (K, 4, 4)

    host = PwnTracker(proj, ccfg, acfg,
                      PwnTrackerConfig(new_frame_inliers_fraction=0.4,
                                       min_cloud_inliers=200))
    for k in range(K):
        host.process_frame(jnp.asarray(depths[k], jnp.float32))
    host_traj = host.trajectory_array()

    # same keyframe decisions and trajectories (both f32 compute)
    host_kf = np.asarray([m["keyframe"] for m in host.metrics])
    np.testing.assert_array_equal(np.asarray(metrics["keyframe"]), host_kf)
    np.testing.assert_allclose(traj, host_traj, atol=5e-3)
    # recovered motion close to ground truth along the observable axes
    assert abs(traj[-1][2, 3] - 0.04 * (K - 1)) < 0.02
    assert abs(traj[-1][1, 3] - 0.02 * (K - 1)) < 0.02
