"""SE3 world simulator + distributed-solver accuracy gates at scale.

VERDICT r4 Next 3: graphSE3.g2o is a chain with optimum ~0 and the SE3
ring fixtures are 48 poses — the distributed SE3 path needed a large 3D
multi-loop world with a NONZERO pinned optimum (the
``graph_merge/graph_simulator.h:91-108`` pattern lifted to SE3). Oracle
strategy: the float64 control solver pins the optimum; the mesh solvers
must reach <= 1.01x it; ATE vs the simulator's ground truth certifies the
optimum is the RIGHT basin, not just a stationary point.
"""
import numpy as np
import pytest

from g2o_frontend_tpu.parallel.mesh import make_mesh
from g2o_frontend_tpu.slam.simulator import (
    Simulator3DConfig,
    simulate_se3,
)
from g2o_frontend_tpu.solvers.control import control_optimize_se3


# dense-closure test world: 11 closures over 300 poses, odometry ATE ~1 m,
# optimum ATE ~0.18 m (measured) — a genuinely loop-constrained fixture
_SIM_CFG = Simulator3DConfig(n_poses=300, seed=0, world_size=20.0,
                             closure_min_gap=50, closure_radius=3.5,
                             closure_prob=0.9)


def _ate_trans(T_est, T_gt):
    d = T_est[:, :3, 3] - T_gt[:, :3, 3]
    return float(np.sqrt(np.mean(np.sum(d * d, -1))))


def _pose7_to_T(p):
    p = np.asarray(p, np.float64)
    x, y, z, qx, qy, qz, qw = p
    n = np.linalg.norm([qx, qy, qz, qw])
    qx, qy, qz, qw = qx / n, qy / n, qz / n, qw / n
    R = np.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
         2 * (qx * qz + qy * qw)],
        [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qx * qw)],
        [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
         1 - 2 * (qx * qx + qy * qy)],
    ])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = (x, y, z)
    return T


def test_se3_sim_world_structure():
    g, info = simulate_se3(_SIM_CFG)
    assert info["n_closures"] >= 8  # multi-loop, not a chain
    assert info["n_edges"] >= 300
    # noisy init drifts measurably from ground truth
    assert _ate_trans(info["init_T"], info["gt_T"]) > 0.3


def test_se3_sim_control_pins_nonzero_optimum_in_right_basin():
    g, info = simulate_se3(_SIM_CFG)
    ctl = control_optimize_se3(g, max_iters=60)
    assert ctl["chi2"] > 1.0  # noisy edges: genuinely nonzero optimum
    assert ctl["chi2"] < 0.2 * ctl["trace"][0]  # converged well below init
    # the optimum is the TRUE basin: ATE vs simulator ground truth beats
    # the odometry init by a wide margin
    n = info["n_poses"]
    T_opt = np.stack([_pose7_to_T(p) for p in ctl["poses"][:n]])
    ate_opt = _ate_trans(T_opt, info["gt_T"])
    ate_init = _ate_trans(info["init_T"], info["gt_T"])
    assert ate_opt < 0.5 * ate_init


@pytest.mark.parametrize("precond", ["jacobi", "spike"])
def test_se3_sim_partitioned_reaches_control(precond):
    """The distributed SE3 solver must clear the float64 control on a
    multi-loop nonzero-optimum world over the 8-device mesh."""
    from g2o_frontend_tpu.parallel.partitioned_pose_graph import (
        optimize_se3_partitioned,
    )

    g, info = simulate_se3(_SIM_CFG)
    ctl = control_optimize_se3(g, max_iters=60)
    mesh = make_mesh(8)
    _g2, trace = optimize_se3_partitioned(
        g, mesh, iters=25, cg_iters=100, precond=precond
    )
    chi = float(np.asarray(trace)[-1])
    assert np.isfinite(chi)
    assert chi <= 1.01 * ctl["chi2"], (chi, ctl["chi2"])


def test_ba_sharded_reaches_control_at_scale():
    """Sharded BA vs the float64 BA control on a >=10k-observation
    problem (VERDICT r4 Next 3's BA half)."""
    from tests.test_ba import make_problem

    from g2o_frontend_tpu.parallel.sharded_ba import optimize_ba_sharded
    from g2o_frontend_tpu.solvers.ba import make_ba_problem
    from g2o_frontend_tpu.solvers.control import control_optimize_ba

    poses_gt, points_gt, poses7, points_init, obs = make_problem(
        n_poses=40, n_points=300, noise=0.01, init_noise=0.05
    )
    assert len(obs) >= 10000
    ba = make_ba_problem(poses7, points_init, obs)
    ctl = control_optimize_ba(ba, max_iters=40)
    mesh = make_mesh(8)
    ba2, trace = optimize_ba_sharded(ba, mesh, iters=15, cg_iters=60)
    chi = float(np.asarray(trace)[-1])
    assert np.isfinite(chi)
    assert chi <= 1.01 * max(ctl["chi2"], 1e-8), (chi, ctl["chi2"])
