"""SE3 pose graph with plane landmarks (the plane-SLAM backend, ref #33).

The reference builds g2o graphs with `VertexPlane` landmarks and
pose-plane calibration edges (``PlaneEx/plane_g2o.cpp:216-241,383-391``,
``planeAlignerTest``). Here planes are first-class landmarks in the batched
LM solver:

- plane state: Hessian form [n(3), d] with unit n; local chart is 3-dof
  (two tangent rotations of n + offset delta), so the Gauss-Newton system
  stays full-rank without gauge tricks on the normal length,
- pose-plane edge: measurement is the plane observed in the pose frame;
  prediction for pose X=(R,t) and global plane (n,d) is
  ``n_local = R^T n, d_local = d - n . t``; residual is the 4-vector
  difference weighted by a 4x4 information,
- pose-pose edges identical to `pose_graph.optimize_se3`,
- everything vmapped/jitted; solved matrix-free with block-Jacobi PCG
  (6-blocks for poses, 3-blocks for planes).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import lie
from .pcg import pcg
from .pose_graph import _pose7_to_T, _T_to_pose7, se3_pp_residual_local


class PlaneGraph(NamedTuple):
    """Fixed-capacity SE3 + plane-landmark graph (pytree)."""

    poses: jnp.ndarray  # (NP, 7) [t, qxyzw]
    pose_mask: jnp.ndarray  # (NP,)
    planes: jnp.ndarray  # (NL, 4) [n, d]
    plane_mask: jnp.ndarray  # (NL,)
    pp_ij: jnp.ndarray  # (EP, 2)
    pp_meas: jnp.ndarray  # (EP, 7)
    pp_info: jnp.ndarray  # (EP, 6, 6)
    pp_mask: jnp.ndarray  # (EP,)
    # pose-plane edges
    pl_ij: jnp.ndarray  # (EL, 2) (pose idx, plane idx)
    pl_meas: jnp.ndarray  # (EL, 4) local plane [n, d]
    pl_info: jnp.ndarray  # (EL, 4, 4)
    pl_mask: jnp.ndarray  # (EL,)
    fixed: jnp.ndarray  # (NP,)


def _plane_tangent(n):
    """Two unit tangent vectors orthogonal to n (branchless)."""
    ref = jnp.where(
        jnp.abs(n[2]) < 0.9,
        jnp.array([0.0, 0.0, 1.0], n.dtype),
        jnp.array([1.0, 0.0, 0.0], n.dtype),
    )
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def _apply_plane_update(plane, dp):
    """3-dof chart: rotate n in its tangent plane, shift d."""
    n, d = plane[:3], plane[3]
    t1, t2 = _plane_tangent(n)
    n_new = n + dp[0] * t1 + dp[1] * t2
    n_new = n_new / jnp.maximum(jnp.linalg.norm(n_new), 1e-9)
    return jnp.concatenate([n_new, jnp.array([d + dp[2]], plane.dtype)])


def _pl_residual_local(dpose, dplane, T, plane, meas):
    """Residual as a function of local increments at zero (for jacfwd)."""
    X = T @ lie.se3_exp(dpose)
    pl = _apply_plane_update(plane, dplane)
    n, d = pl[:3], pl[3]
    R = X[:3, :3]
    t = X[:3, 3]
    n_l = R.T @ n
    d_l = d - jnp.dot(n, t)
    return jnp.concatenate([n_l, jnp.array([d_l], plane.dtype)]) - meas


def _linearize(g: PlaneGraph):
    # pose-pose part (same as pose_graph.linearize_se3)
    Ti = jax.vmap(_pose7_to_T)(g.poses[g.pp_ij[:, 0]])
    Tj = jax.vmap(_pose7_to_T)(g.poses[g.pp_ij[:, 1]])
    Zinv = jax.vmap(lambda z: lie.se3_inverse(_pose7_to_T(z)))(g.pp_meas)

    def one_pp(Ti, Tj, Zinv):
        zero = jnp.zeros(6, Ti.dtype)
        e = se3_pp_residual_local(zero, zero, Ti, Tj, Zinv)
        Ji = jax.jacfwd(lambda d: se3_pp_residual_local(d, zero, Ti, Tj, Zinv))(zero)
        Jj = jax.jacfwd(lambda d: se3_pp_residual_local(zero, d, Ti, Tj, Zinv))(zero)
        return e, Ji, Jj

    e_pp, Ji_pp, Jj_pp = jax.vmap(one_pp)(Ti, Tj, Zinv)
    w_pp = g.pp_info * g.pp_mask[:, None, None]
    chi2 = jnp.sum(
        jnp.where(g.pp_mask, jnp.einsum("ki,kij,kj->k", e_pp, g.pp_info, e_pp), 0.0)
    )

    # pose-plane part
    Tp = jax.vmap(_pose7_to_T)(g.poses[g.pl_ij[:, 0]])
    pls = g.planes[g.pl_ij[:, 1]]

    def one_pl(T, pl, z):
        z6 = jnp.zeros(6, T.dtype)
        z3 = jnp.zeros(3, T.dtype)
        e = _pl_residual_local(z6, z3, T, pl, z)
        Jp = jax.jacfwd(lambda d: _pl_residual_local(d, z3, T, pl, z))(z6)
        Jl = jax.jacfwd(lambda d: _pl_residual_local(z6, d, T, pl, z))(z3)
        return e, Jp, Jl

    e_pl, Jp_pl, Jl_pl = jax.vmap(one_pl)(Tp, pls, g.pl_meas)
    w_pl = g.pl_info * g.pl_mask[:, None, None]
    chi2 = chi2 + jnp.sum(
        jnp.where(g.pl_mask, jnp.einsum("ki,kij,kj->k", e_pl, g.pl_info, e_pl), 0.0)
    )
    return (e_pp, Ji_pp, Jj_pp, w_pp), (e_pl, Jp_pl, Jl_pl, w_pl), chi2


@partial(jax.jit, static_argnames=("iters", "cg_iters"))
def optimize_plane_graph(g: PlaneGraph, iters: int = 10, cg_iters: int = 60,
                         lm_lambda0: float = 1e-4):
    """LM over poses + plane landmarks; returns (graph, chi2 trace)."""
    NP, NL = g.poses.shape[0], g.planes.shape[0]
    free_p = (g.pose_mask & ~g.fixed).astype(g.poses.dtype)
    free_l = g.plane_mask.astype(g.poses.dtype)

    def chi2_of(poses, planes):
        return _linearize(g._replace(poses=poses, planes=planes))[2]

    def step(k, state):
        poses, planes, lam, trace = state
        gk = g._replace(poses=poses, planes=planes)
        (e_pp, Ji, Jj, w_pp), (e_pl, Jp, Jl, w_pl), chi2 = _linearize(gk)

        we_pp = jnp.einsum("kij,kj->ki", w_pp, e_pp)
        gp = jax.ops.segment_sum(
            jnp.einsum("kdi,kd->ki", Ji, we_pp), g.pp_ij[:, 0], NP
        ) + jax.ops.segment_sum(
            jnp.einsum("kdi,kd->ki", Jj, we_pp), g.pp_ij[:, 1], NP
        )
        we_pl = jnp.einsum("kij,kj->ki", w_pl, e_pl)
        gp = gp + jax.ops.segment_sum(
            jnp.einsum("kdi,kd->ki", Jp, we_pl), g.pl_ij[:, 0], NP
        )
        gl = jax.ops.segment_sum(
            jnp.einsum("kdi,kd->ki", Jl, we_pl), g.pl_ij[:, 1], NL
        )

        Dp = jax.ops.segment_sum(
            jnp.einsum("kdi,kde,kej->kij", Ji, w_pp, Ji), g.pp_ij[:, 0], NP
        ) + jax.ops.segment_sum(
            jnp.einsum("kdi,kde,kej->kij", Jj, w_pp, Jj), g.pp_ij[:, 1], NP
        ) + jax.ops.segment_sum(
            jnp.einsum("kdi,kde,kej->kij", Jp, w_pl, Jp), g.pl_ij[:, 0], NP
        )
        Dl = jax.ops.segment_sum(
            jnp.einsum("kdi,kde,kej->kij", Jl, w_pl, Jl), g.pl_ij[:, 1], NL
        )

        def hvp(v):
            vp, vl = v
            vp = vp * free_p[:, None]
            vl = vl * free_l[:, None]
            Jv = jnp.einsum("kdi,ki->kd", Ji, vp[g.pp_ij[:, 0]]) + jnp.einsum(
                "kdi,ki->kd", Jj, vp[g.pp_ij[:, 1]]
            )
            WJv = jnp.einsum("kde,ke->kd", w_pp, Jv)
            hp = jax.ops.segment_sum(
                jnp.einsum("kdi,kd->ki", Ji, WJv), g.pp_ij[:, 0], NP
            ) + jax.ops.segment_sum(
                jnp.einsum("kdi,kd->ki", Jj, WJv), g.pp_ij[:, 1], NP
            )
            Jv2 = jnp.einsum("kdi,ki->kd", Jp, vp[g.pl_ij[:, 0]]) + jnp.einsum(
                "kdi,ki->kd", Jl, vl[g.pl_ij[:, 1]]
            )
            WJv2 = jnp.einsum("kde,ke->kd", w_pl, Jv2)
            hp = hp + jax.ops.segment_sum(
                jnp.einsum("kdi,kd->ki", Jp, WJv2), g.pl_ij[:, 0], NP
            )
            hl = jax.ops.segment_sum(
                jnp.einsum("kdi,kd->ki", Jl, WJv2), g.pl_ij[:, 1], NL
            )
            hp = hp + lam * jnp.einsum("kij,kj->ki", Dp, vp)
            hl = hl + lam * jnp.einsum("kij,kj->ki", Dl, vl)
            hp = hp * free_p[:, None] + (1.0 - free_p)[:, None] * v[0]
            hl = hl * free_l[:, None] + (1.0 - free_l)[:, None] * v[1]
            return (hp, hl)

        eye6 = jnp.eye(6, dtype=Dp.dtype)
        eye3 = jnp.eye(3, dtype=Dp.dtype)
        Dp_d = (1.0 + lam) * Dp + 1e-6 * eye6
        Dl_d = (1.0 + lam) * Dl + 1e-6 * eye3
        Dp_d = jnp.where(free_p[:, None, None] > 0, Dp_d, eye6)
        Dl_d = jnp.where(free_l[:, None, None] > 0, Dl_d, eye3)
        Dp_inv = jnp.linalg.inv(Dp_d)
        Dl_inv = jnp.linalg.inv(Dl_d)

        def precond(r):
            return (
                jnp.einsum("kij,kj->ki", Dp_inv, r[0]),
                jnp.einsum("kij,kj->ki", Dl_inv, r[1]),
            )

        b = (-gp * free_p[:, None], -gl * free_l[:, None])
        (dp, dl), _, _ = pcg(hvp, b, precond, max_iters=cg_iters, rtol=1e-8)

        new_poses = jax.vmap(lambda p, d: _T_to_pose7(_pose7_to_T(p) @ lie.se3_exp(d)))(
            poses, dp * free_p[:, None]
        )
        new_planes = jax.vmap(_apply_plane_update)(planes, dl * free_l[:, None])
        new_chi2 = chi2_of(new_poses, new_planes)
        accept = new_chi2 < chi2
        poses = jnp.where(accept, new_poses, poses)
        planes = jnp.where(accept, new_planes, planes)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-10),
                        jnp.minimum(lam * 4.0, 1e8))
        trace = trace.at[k + 1].set(jnp.where(accept, new_chi2, chi2))
        return poses, planes, lam, trace

    trace0 = jnp.zeros(iters + 1, g.poses.dtype).at[0].set(
        chi2_of(g.poses, g.planes)
    )
    poses, planes, lam, trace = jax.lax.fori_loop(
        0, iters, step,
        (g.poses, g.planes, jnp.asarray(lm_lambda0, g.poses.dtype), trace0),
    )
    return g._replace(poses=poses, planes=planes), trace


def make_plane_graph(poses7, planes4, pp_edges, pl_edges, fixed_idx=(0,),
                     dtype=jnp.float32) -> PlaneGraph:
    """Convenience constructor from host lists (pads to pow2 capacity)."""
    from ..graph.store import _cap

    n, nl = len(poses7), len(planes4)
    ep, el = len(pp_edges), len(pl_edges)
    NP, NL = _cap(max(n, 1)), _cap(max(nl, 1))
    EP, EL = _cap(max(ep, 1)), _cap(max(el, 1))
    poses = np.zeros((NP, 7)); poses[:, 6] = 1.0
    poses[:n] = poses7
    planes = np.zeros((NL, 4)); planes[:, 2] = 1.0
    if nl:
        planes[:nl] = planes4
    pp_ij = np.zeros((EP, 2), np.int32)
    pp_z = np.zeros((EP, 7)); pp_z[:, 6] = 1.0
    pp_w = np.zeros((EP, 6, 6))
    for k, (i, j, z, w) in enumerate(pp_edges):
        pp_ij[k] = (i, j); pp_z[k] = z; pp_w[k] = w
    pl_ij = np.zeros((EL, 2), np.int32)
    pl_z = np.zeros((EL, 4)); pl_z[:, 2] = 1.0
    pl_w = np.zeros((EL, 4, 4))
    for k, (i, l, z, w) in enumerate(pl_edges):
        pl_ij[k] = (i, l); pl_z[k] = z; pl_w[k] = w
    fixed = np.zeros(NP, bool)
    for i in fixed_idx:
        if i < n:
            fixed[i] = True
    return PlaneGraph(
        poses=jnp.asarray(poses, dtype),
        pose_mask=jnp.asarray(np.arange(NP) < n),
        planes=jnp.asarray(planes, dtype),
        plane_mask=jnp.asarray(np.arange(NL) < nl),
        pp_ij=jnp.asarray(pp_ij),
        pp_meas=jnp.asarray(pp_z, dtype),
        pp_info=jnp.asarray(pp_w, dtype),
        pp_mask=jnp.asarray(np.arange(EP) < ep),
        pl_ij=jnp.asarray(pl_ij),
        pl_meas=jnp.asarray(pl_z, dtype),
        pl_info=jnp.asarray(pl_w, dtype),
        pl_mask=jnp.asarray(np.arange(EL) < el),
        fixed=jnp.asarray(fixed),
    )
