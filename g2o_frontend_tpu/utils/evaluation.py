"""Trajectory evaluation: ATE / RPE (the external evaluation the reference
delegates to the TUM benchmark scripts, ``pwn_odometry.cpp:43-46`` context).

ATE: associate stamps, Horn-align estimated to ground-truth positions
(reusing the RANSAC module's closed-form weighted Kabsch), report RMSE.
RPE: per-delta relative pose error statistics.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..io.tum import associate
from ..ransac.solvers import fit_se3_points
from . import lie


def pose7_to_T(p):
    T = np.eye(4)
    q = np.asarray(p[3:7], float)
    w, x, y, z = q[3], q[0], q[1], q[2]
    n = np.sqrt(w * w + x * x + y * y + z * z) + 1e-12
    w, x, y, z = w / n, x / n, y / n, z / n
    T[:3, :3] = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    T[:3, 3] = p[:3]
    return T


def ate(
    ts_est,
    poses_est7,
    ts_gt,
    poses_gt7,
    max_difference=0.02,
    align=True,
):
    """Absolute trajectory error.

    Returns dict with rmse/mean/median/std (meters) and the number of
    associated pairs; `align=True` Horn-aligns est to gt first (the TUM
    protocol).
    """
    pairs = associate(ts_est, ts_gt, max_difference)
    if not pairs:
        return {"rmse": np.inf, "pairs": 0}
    ia = [a for a, _ in pairs]
    ib = [b for _, b in pairs]
    P_est = np.asarray(poses_est7)[ia, :3]
    P_gt = np.asarray(poses_gt7)[ib, :3]
    if align and len(pairs) >= 3:
        T = np.asarray(
            fit_se3_points(
                jnp.asarray(P_gt, jnp.float32),
                jnp.asarray(P_est, jnp.float32),
                jnp.ones(len(pairs), jnp.float32),
            )
        )
        P_est = P_est @ T[:3, :3].T + T[:3, 3]
    err = np.linalg.norm(P_est - P_gt, axis=1)
    return {
        "rmse": float(np.sqrt(np.mean(err**2))),
        "mean": float(err.mean()),
        "median": float(np.median(err)),
        "std": float(err.std()),
        "max": float(err.max()),
        "pairs": len(pairs),
    }


def rpe(ts_est, poses_est7, ts_gt, poses_gt7, delta=1, max_difference=0.02):
    """Relative pose error over index delta (translational part)."""
    pairs = associate(ts_est, ts_gt, max_difference)
    if len(pairs) <= delta:
        return {"rmse": np.inf, "pairs": 0}
    errs = []
    for k in range(len(pairs) - delta):
        ia0, ib0 = pairs[k]
        ia1, ib1 = pairs[k + delta]
        Te = np.linalg.inv(pose7_to_T(poses_est7[ia0])) @ pose7_to_T(poses_est7[ia1])
        Tg = np.linalg.inv(pose7_to_T(poses_gt7[ib0])) @ pose7_to_T(poses_gt7[ib1])
        E = np.linalg.inv(Tg) @ Te
        errs.append(np.linalg.norm(E[:3, 3]))
    errs = np.asarray(errs)
    return {
        "rmse": float(np.sqrt(np.mean(errs**2))),
        "mean": float(errs.mean()),
        "pairs": len(pairs),
    }


def ate_xy(est_xy, gt_xy, align=True):
    """2D ATE for the planar SLAM configs (datasets/2D evaluation)."""
    from ..ransac.solvers import fit_se2_points

    est = np.asarray(est_xy, np.float32)
    gt = np.asarray(gt_xy, np.float32)
    n = min(len(est), len(gt))
    est, gt = est[:n], gt[:n]
    if align and n >= 2:
        x = np.asarray(
            fit_se2_points(
                jnp.asarray(gt), jnp.asarray(est), jnp.ones(n, jnp.float32)
            )
        )
        c, s = np.cos(x[2]), np.sin(x[2])
        est = est @ np.array([[c, -s], [s, c]]).T + x[:2]
    err = np.linalg.norm(est - gt, axis=1)
    return {
        "rmse": float(np.sqrt(np.mean(err**2))),
        "mean": float(err.mean()),
        "max": float(err.max()),
        "pairs": n,
    }
