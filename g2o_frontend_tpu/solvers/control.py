"""Float64 host control solver — the trusted accuracy reference.

BASELINE.md requires accuracy "established by running the reference protocol
as the control"; the reference's backend is g2o + CHOLMOD sparse Cholesky
(``map_g2o_reflector.h:50-74``, ``CMakeLists.txt:105-112``). This module
plays that role in-tree: a float64 sparse-Cholesky Gauss-Newton/LM solver
(scipy.sparse) over the same SE2 pose+landmark graphs, run to convergence on
the host. It is deliberately NOT the TPU path — different precision,
different linear algebra, independent code — so agreement is evidence, not
tautology. Results are pinned in EVAL.md ("chi2 @ control vs chi2 @ ours").
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def _wrap(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def _se2_rel(xi, xj):
    c, s = np.cos(xi[..., 2]), np.sin(xi[..., 2])
    dx = xj[..., 0] - xi[..., 0]
    dy = xj[..., 1] - xi[..., 1]
    return np.stack(
        [c * dx + s * dy, -s * dx + c * dy, _wrap(xj[..., 2] - xi[..., 2])], -1
    )


def _pp_residual_jac(xi, xj, z):
    """Batched residual + analytic Jacobians for SE2 pose-pose edges."""
    c, s = np.cos(xi[:, 2]), np.sin(xi[:, 2])
    dx = xj[:, 0] - xi[:, 0]
    dy = xj[:, 1] - xi[:, 1]
    e = np.stack(
        [c * dx + s * dy, -s * dx + c * dy, _wrap(xj[:, 2] - xi[:, 2] - z[:, 2])],
        -1,
    )
    e[:, :2] -= z[:, :2]
    E = len(xi)
    Ji = np.zeros((E, 3, 3))
    Jj = np.zeros((E, 3, 3))
    Ji[:, 0, 0] = -c
    Ji[:, 0, 1] = -s
    Ji[:, 0, 2] = -s * dx + c * dy
    Ji[:, 1, 0] = s
    Ji[:, 1, 1] = -c
    Ji[:, 1, 2] = -c * dx - s * dy
    Ji[:, 2, 2] = -1.0
    Jj[:, 0, 0] = c
    Jj[:, 0, 1] = s
    Jj[:, 1, 0] = -s
    Jj[:, 1, 1] = c
    Jj[:, 2, 2] = 1.0
    return e, Ji, Jj


def _pl_residual_jac(xp, ll, z):
    """Batched residual + Jacobians for SE2 pose -> XY landmark edges."""
    c, s = np.cos(xp[:, 2]), np.sin(xp[:, 2])
    dx = ll[:, 0] - xp[:, 0]
    dy = ll[:, 1] - xp[:, 1]
    e = np.stack([c * dx + s * dy - z[:, 0], -s * dx + c * dy - z[:, 1]], -1)
    E = len(xp)
    Jp = np.zeros((E, 2, 3))
    Jl = np.zeros((E, 2, 2))
    Jp[:, 0, 0] = -c
    Jp[:, 0, 1] = -s
    Jp[:, 0, 2] = -s * dx + c * dy
    Jp[:, 1, 0] = s
    Jp[:, 1, 1] = -c
    Jp[:, 1, 2] = -c * dx - s * dy
    Jl[:, 0, 0] = c
    Jl[:, 0, 1] = s
    Jl[:, 1, 0] = -s
    Jl[:, 1, 1] = c
    return e, Jp, Jl


def control_optimize_se2(
    g,
    max_iters: int = 100,
    tol: float = 1e-9,
    lm_lambda0: float = 1e-6,
):
    """LM to convergence in float64 with sparse Cholesky (splu).

    Args:
      g: a PoseGraph2D (jax or numpy arrays).
    Returns dict with optimized poses/landmarks, chi2 trace, final chi2.
    """
    poses = np.asarray(g.poses, np.float64).copy()
    lms = np.asarray(g.landmarks, np.float64).copy()
    pose_mask = np.asarray(g.pose_mask)
    lm_mask = np.asarray(g.landmark_mask)
    fixed = np.asarray(g.fixed)
    pp_ij = np.asarray(g.pp_ij)[np.asarray(g.pp_mask)]
    pp_z = np.asarray(g.pp_meas, np.float64)[np.asarray(g.pp_mask)]
    pp_w = np.asarray(g.pp_info, np.float64)[np.asarray(g.pp_mask)]
    pl_ij = np.asarray(g.pl_ij)[np.asarray(g.pl_mask)]
    pl_z = np.asarray(g.pl_meas, np.float64)[np.asarray(g.pl_mask)]
    pl_w = np.asarray(g.pl_info, np.float64)[np.asarray(g.pl_mask)]

    NP = len(poses)
    NL = len(lms)
    n_dof = 3 * NP + 2 * NL
    free = np.zeros(n_dof, bool)
    for p in range(NP):
        free[3 * p : 3 * p + 3] = pose_mask[p] and not fixed[p]
    for l in range(NL):
        free[3 * NP + 2 * l : 3 * NP + 2 * l + 2] = lm_mask[l]
    free_idx = np.where(free)[0]

    def chi2_of(poses, lms):
        e = _se2_rel(poses[pp_ij[:, 0]], poses[pp_ij[:, 1]]) - pp_z
        e[:, 2] = _wrap(e[:, 2])
        c = np.einsum("ki,kij,kj->", e, pp_w, e)
        if len(pl_ij):
            ep, _, _ = _pl_residual_jac(poses[pl_ij[:, 0]], lms[pl_ij[:, 1]], pl_z)
            c += np.einsum("ki,kij,kj->", ep, pl_w, ep)
        return float(c)

    lam = lm_lambda0
    trace = [chi2_of(poses, lms)]
    for it in range(max_iters):
        e, Ji, Jj = _pp_residual_jac(poses[pp_ij[:, 0]], poses[pp_ij[:, 1]], pp_z)
        rows, cols, vals = [], [], []
        bvec = np.zeros(n_dof)

        def add_block(r0, c0, blk):
            rr, cc = np.meshgrid(
                np.arange(blk.shape[-2]), np.arange(blk.shape[-1]), indexing="ij"
            )
            rows.append((r0[:, None, None] + rr[None]).ravel())
            cols.append((c0[:, None, None] + cc[None]).ravel())
            vals.append(blk.ravel())

        i0 = 3 * pp_ij[:, 0]
        j0 = 3 * pp_ij[:, 1]
        WJi = np.einsum("kde,kei->kdi", pp_w, Ji)
        WJj = np.einsum("kde,kei->kdi", pp_w, Jj)
        add_block(i0, i0, np.einsum("kdi,kdj->kij", Ji, WJi))
        add_block(i0, j0, np.einsum("kdi,kdj->kij", Ji, WJj))
        add_block(j0, i0, np.einsum("kdi,kdj->kij", Jj, WJi))
        add_block(j0, j0, np.einsum("kdi,kdj->kij", Jj, WJj))
        We = np.einsum("kde,ke->kd", pp_w, e)
        np.add.at(bvec, (i0[:, None] + np.arange(3)[None]).ravel(),
                  np.einsum("kdi,kd->ki", Ji, We).ravel())
        np.add.at(bvec, (j0[:, None] + np.arange(3)[None]).ravel(),
                  np.einsum("kdi,kd->ki", Jj, We).ravel())

        if len(pl_ij):
            ep, Jp, Jl = _pl_residual_jac(
                poses[pl_ij[:, 0]], lms[pl_ij[:, 1]], pl_z
            )
            p0 = 3 * pl_ij[:, 0]
            l0 = 3 * NP + 2 * pl_ij[:, 1]
            WJp = np.einsum("kde,kei->kdi", pl_w, Jp)
            WJl = np.einsum("kde,kei->kdi", pl_w, Jl)
            add_block(p0, p0, np.einsum("kdi,kdj->kij", Jp, WJp))
            add_block(p0, l0, np.einsum("kdi,kdj->kij", Jp, WJl))
            add_block(l0, p0, np.einsum("kdi,kdj->kij", Jl, WJp))
            add_block(l0, l0, np.einsum("kdi,kdj->kij", Jl, WJl))
            Wep = np.einsum("kde,ke->kd", pl_w, ep)
            np.add.at(bvec, (p0[:, None] + np.arange(3)[None]).ravel(),
                      np.einsum("kdi,kd->ki", Jp, Wep).ravel())
            np.add.at(bvec, (l0[:, None] + np.arange(2)[None]).ravel(),
                      np.einsum("kdi,kd->ki", Jl, Wep).ravel())

        H = sp.coo_matrix(
            (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
            shape=(n_dof, n_dof),
        ).tocsc()
        Hff = H[free_idx][:, free_idx]
        bf = bvec[free_idx]
        Hff = Hff + lam * sp.diags(Hff.diagonal() + 1e-12)
        try:
            dx_f = spla.splu(Hff.tocsc()).solve(-bf)
        except RuntimeError:
            lam = min(lam * 10, 1e8)
            continue
        dx = np.zeros(n_dof)
        dx[free_idx] = dx_f

        new_poses = poses + dx[: 3 * NP].reshape(NP, 3)
        new_poses[:, 2] = _wrap(new_poses[:, 2])
        new_lms = lms + dx[3 * NP :].reshape(NL, 2)
        new_chi2 = chi2_of(new_poses, new_lms)
        if new_chi2 < trace[-1]:
            poses, lms = new_poses, new_lms
            rel_drop = (trace[-1] - new_chi2) / max(trace[-1], 1e-300)
            trace.append(new_chi2)
            lam = max(lam * 0.3, 1e-12)
            if rel_drop < tol:
                break
        else:
            lam = min(lam * 10, 1e8)
            trace.append(trace[-1])
            if lam >= 1e8:
                break
    return {
        "poses": poses,
        "landmarks": lms,
        "chi2": trace[-1],
        "trace": np.asarray(trace),
        "iters": len(trace) - 1,
    }
