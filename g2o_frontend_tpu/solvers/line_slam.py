"""SE2 pose graph with 2D line landmarks (line_alignment / g2o_line_addons).

The reference's line SLAM builds SE2 graphs with `VertexLine2D` landmarks
(angle, rho) plus extreme points (``line_alignment/line_alignment.cpp:
122-650``, ``g2o_line_addons/vertex_extreme_point_xy.h:38``). Here lines are
first-class landmarks of the batched LM solver:

- line state: (alpha, rho) — world normal angle + signed offset,
  ``n(alpha) . p = rho``,
- pose-line edge: the line observed in the robot frame,
  prediction for pose (t, th): ``alpha_l = alpha - th``,
  ``rho_l = rho - n(alpha) . t``; residual wraps the angle,
- same matrix-free block-Jacobi PCG machinery (3-blocks poses, 2-blocks
  lines), fully jitted.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import lie
from .pcg import pcg
from .pose_graph import se2_pp_residual


class LineGraph(NamedTuple):
    poses: jnp.ndarray  # (NP, 3)
    pose_mask: jnp.ndarray
    lines: jnp.ndarray  # (NL, 2) [alpha, rho]
    line_mask: jnp.ndarray
    pp_ij: jnp.ndarray
    pp_meas: jnp.ndarray  # (EP, 3)
    pp_info: jnp.ndarray  # (EP, 3, 3)
    pp_mask: jnp.ndarray
    pl_ij: jnp.ndarray  # (EL, 2) (pose, line)
    pl_meas: jnp.ndarray  # (EL, 2) local [alpha, rho]
    pl_info: jnp.ndarray  # (EL, 2, 2)
    pl_mask: jnp.ndarray
    fixed: jnp.ndarray


def line_graph_from_log(log, dtype=jnp.float32):
    """Build a `LineGraph` from a parsed .g2o with VERTEX_LINE2D /
    EDGE_SE2_LINE2D records (the `line_alignment` output graphs, e.g.
    `datasets/2D/martina/*`). Returns (graph, pose_ids, line_ids)."""
    pose_ids = np.asarray(log.se2_ids, np.int64)
    line_ids = np.asarray(log.line2d_ids, np.int64)
    pid = {int(v): k for k, v in enumerate(pose_ids)}
    lid = {int(v): k for k, v in enumerate(line_ids)}

    pp_ij = np.array(
        [[pid[int(i)], pid[int(j)]] for i, j in log.edge_se2_ij
         if int(i) in pid and int(j) in pid], np.int32,
    ).reshape(-1, 2)
    pp_meas = np.asarray(log.edge_se2_meas, np.float64).reshape(-1, 3)
    pp_info = np.asarray(log.edge_se2_info, np.float64).reshape(-1, 3, 3)

    keep = [k for k, (i, j) in enumerate(log.edge_se2line_ij)
            if int(i) in pid and int(j) in lid]
    pl_ij = np.array(
        [[pid[int(log.edge_se2line_ij[k][0])], lid[int(log.edge_se2line_ij[k][1])]]
         for k in keep], np.int32,
    ).reshape(-1, 2)
    pl_meas = np.asarray(log.edge_se2line_meas, np.float64)[keep].reshape(-1, 2)
    pl_info = np.asarray(log.edge_se2line_info, np.float64)[keep].reshape(-1, 2, 2)

    fixed = np.zeros(len(pose_ids), bool)
    for v in log.fixed_ids:
        if int(v) in pid:
            fixed[pid[int(v)]] = True
    if not fixed.any() and len(fixed):
        fixed[0] = True

    g = LineGraph(
        poses=jnp.asarray(log.se2_poses, dtype),
        pose_mask=jnp.ones(len(pose_ids), bool),
        lines=jnp.asarray(log.line2d_params, dtype),
        line_mask=jnp.ones(len(line_ids), bool),
        pp_ij=jnp.asarray(pp_ij),
        pp_meas=jnp.asarray(pp_meas, dtype),
        pp_info=jnp.asarray(pp_info, dtype),
        pp_mask=jnp.ones(len(pp_ij), bool),
        pl_ij=jnp.asarray(pl_ij),
        pl_meas=jnp.asarray(pl_meas, dtype),
        pl_info=jnp.asarray(pl_info, dtype),
        pl_mask=jnp.ones(len(pl_ij), bool),
        fixed=jnp.asarray(fixed),
    )
    return g, pose_ids, line_ids


def line_observation(pose, line):
    """World line -> local line seen from pose [x, y, th]."""
    alpha, rho = line[0], line[1]
    n = jnp.stack([jnp.cos(alpha), jnp.sin(alpha)])
    a_l = alpha - pose[2]
    r_l = rho - n[0] * pose[0] - n[1] * pose[1]
    return jnp.stack([a_l, r_l])


def _pl_residual(pose, line, meas):
    pred = line_observation(pose, line)
    e = pred - meas
    return jnp.stack([lie.wrap_angle(e[0]), e[1]])


def _linearize(g: LineGraph):
    xi = g.poses[g.pp_ij[:, 0]]
    xj = g.poses[g.pp_ij[:, 1]]

    def one_pp(xi, xj, z):
        e = se2_pp_residual(xi, xj, z)
        Ji = jax.jacfwd(lambda a: se2_pp_residual(a, xj, z))(xi)
        Jj = jax.jacfwd(lambda b: se2_pp_residual(xi, b, z))(xj)
        return e, Ji, Jj

    e_pp, Ji, Jj = jax.vmap(one_pp)(xi, xj, g.pp_meas)
    w_pp = g.pp_info * g.pp_mask[:, None, None]
    chi2 = jnp.sum(
        jnp.where(g.pp_mask, jnp.einsum("ki,kij,kj->k", e_pp, g.pp_info, e_pp), 0.0)
    )

    xp = g.poses[g.pl_ij[:, 0]]
    ll = g.lines[g.pl_ij[:, 1]]

    def one_pl(xp, ll, z):
        e = _pl_residual(xp, ll, z)
        Jp = jax.jacfwd(lambda a: _pl_residual(a, ll, z))(xp)
        Jl = jax.jacfwd(lambda b: _pl_residual(xp, b, z))(ll)
        return e, Jp, Jl

    e_pl, Jp, Jl = jax.vmap(one_pl)(xp, ll, g.pl_meas)
    w_pl = g.pl_info * g.pl_mask[:, None, None]
    chi2 = chi2 + jnp.sum(
        jnp.where(g.pl_mask, jnp.einsum("ki,kij,kj->k", e_pl, g.pl_info, e_pl), 0.0)
    )
    return (e_pp, Ji, Jj, w_pp), (e_pl, Jp, Jl, w_pl), chi2


@partial(jax.jit, static_argnames=("iters", "cg_iters"))
def optimize_line_graph(g: LineGraph, iters: int = 10, cg_iters: int = 60,
                        lm_lambda0: float = 1e-4):
    NP, NL = g.poses.shape[0], g.lines.shape[0]
    free_p = (g.pose_mask & ~g.fixed).astype(g.poses.dtype)
    free_l = g.line_mask.astype(g.poses.dtype)

    def chi2_of(poses, lines):
        return _linearize(g._replace(poses=poses, lines=lines))[2]

    def step(k, state):
        poses, lines, lam, trace = state
        gk = g._replace(poses=poses, lines=lines)
        (e_pp, Ji, Jj, w_pp), (e_pl, Jp, Jl, w_pl), chi2 = _linearize(gk)

        we_pp = jnp.einsum("kij,kj->ki", w_pp, e_pp)
        gp = jax.ops.segment_sum(jnp.einsum("kdi,kd->ki", Ji, we_pp), g.pp_ij[:, 0], NP)
        gp = gp + jax.ops.segment_sum(jnp.einsum("kdi,kd->ki", Jj, we_pp), g.pp_ij[:, 1], NP)
        we_pl = jnp.einsum("kij,kj->ki", w_pl, e_pl)
        gp = gp + jax.ops.segment_sum(jnp.einsum("kdi,kd->ki", Jp, we_pl), g.pl_ij[:, 0], NP)
        gl = jax.ops.segment_sum(jnp.einsum("kdi,kd->ki", Jl, we_pl), g.pl_ij[:, 1], NL)

        Dp = (
            jax.ops.segment_sum(jnp.einsum("kdi,kde,kej->kij", Ji, w_pp, Ji), g.pp_ij[:, 0], NP)
            + jax.ops.segment_sum(jnp.einsum("kdi,kde,kej->kij", Jj, w_pp, Jj), g.pp_ij[:, 1], NP)
            + jax.ops.segment_sum(jnp.einsum("kdi,kde,kej->kij", Jp, w_pl, Jp), g.pl_ij[:, 0], NP)
        )
        Dl = jax.ops.segment_sum(jnp.einsum("kdi,kde,kej->kij", Jl, w_pl, Jl), g.pl_ij[:, 1], NL)

        def hvp(v):
            vp, vl = v
            vp = vp * free_p[:, None]
            vl = vl * free_l[:, None]
            Jv = jnp.einsum("kdi,ki->kd", Ji, vp[g.pp_ij[:, 0]]) + jnp.einsum(
                "kdi,ki->kd", Jj, vp[g.pp_ij[:, 1]]
            )
            WJv = jnp.einsum("kde,ke->kd", w_pp, Jv)
            hp = jax.ops.segment_sum(jnp.einsum("kdi,kd->ki", Ji, WJv), g.pp_ij[:, 0], NP)
            hp = hp + jax.ops.segment_sum(jnp.einsum("kdi,kd->ki", Jj, WJv), g.pp_ij[:, 1], NP)
            Jv2 = jnp.einsum("kdi,ki->kd", Jp, vp[g.pl_ij[:, 0]]) + jnp.einsum(
                "kdi,ki->kd", Jl, vl[g.pl_ij[:, 1]]
            )
            WJv2 = jnp.einsum("kde,ke->kd", w_pl, Jv2)
            hp = hp + jax.ops.segment_sum(jnp.einsum("kdi,kd->ki", Jp, WJv2), g.pl_ij[:, 0], NP)
            hl = jax.ops.segment_sum(jnp.einsum("kdi,kd->ki", Jl, WJv2), g.pl_ij[:, 1], NL)
            hp = hp + lam * jnp.einsum("kij,kj->ki", Dp, vp)
            hl = hl + lam * jnp.einsum("kij,kj->ki", Dl, vl)
            hp = hp * free_p[:, None] + (1.0 - free_p)[:, None] * v[0]
            hl = hl * free_l[:, None] + (1.0 - free_l)[:, None] * v[1]
            return (hp, hl)

        eye3 = jnp.eye(3, dtype=poses.dtype)
        eye2 = jnp.eye(2, dtype=poses.dtype)
        Dp_d = jnp.where(free_p[:, None, None] > 0, (1 + lam) * Dp + 1e-6 * eye3, eye3)
        Dl_d = jnp.where(free_l[:, None, None] > 0, (1 + lam) * Dl + 1e-6 * eye2, eye2)
        Dp_inv = jnp.linalg.inv(Dp_d)
        Dl_inv = jnp.linalg.inv(Dl_d)

        def precond(r):
            return (
                jnp.einsum("kij,kj->ki", Dp_inv, r[0]),
                jnp.einsum("kij,kj->ki", Dl_inv, r[1]),
            )

        b = (-gp * free_p[:, None], -gl * free_l[:, None])
        (dp, dl), _, _ = pcg(hvp, b, precond, max_iters=cg_iters, rtol=1e-8)

        new_poses = poses + dp * free_p[:, None]
        new_poses = new_poses.at[:, 2].set(lie.wrap_angle(new_poses[:, 2]))
        new_lines = lines + dl * free_l[:, None]
        new_lines = new_lines.at[:, 0].set(lie.wrap_angle(new_lines[:, 0]))
        new_chi2 = chi2_of(new_poses, new_lines)
        accept = new_chi2 < chi2
        poses = jnp.where(accept, new_poses, poses)
        lines = jnp.where(accept, new_lines, lines)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-10),
                        jnp.minimum(lam * 4.0, 1e8))
        trace = trace.at[k + 1].set(jnp.where(accept, new_chi2, chi2))
        return poses, lines, lam, trace

    trace0 = jnp.zeros(iters + 1, g.poses.dtype).at[0].set(chi2_of(g.poses, g.lines))
    poses, lines, lam, trace = jax.lax.fori_loop(
        0, iters, step,
        (g.poses, g.lines, jnp.asarray(lm_lambda0, g.poses.dtype), trace0),
    )
    return g._replace(poses=poses, lines=lines), trace


def make_line_graph(poses, lines, pp_edges, pl_edges, fixed_idx=(0,),
                    dtype=jnp.float32) -> LineGraph:
    from ..graph.store import _cap

    n, nl = len(poses), len(lines)
    ep, el = len(pp_edges), len(pl_edges)
    NP, NL = _cap(max(n, 1)), _cap(max(nl, 1))
    EP, EL = _cap(max(ep, 1)), _cap(max(el, 1))
    P = np.zeros((NP, 3)); P[:n] = poses
    L = np.zeros((NL, 2))
    if nl:
        L[:nl] = lines
    pp_ij = np.zeros((EP, 2), np.int32); pp_z = np.zeros((EP, 3)); pp_w = np.zeros((EP, 3, 3))
    for k, (i, j, z, w) in enumerate(pp_edges):
        pp_ij[k] = (i, j); pp_z[k] = z; pp_w[k] = w
    pl_ij = np.zeros((EL, 2), np.int32); pl_z = np.zeros((EL, 2)); pl_w = np.zeros((EL, 2, 2))
    for k, (i, l, z, w) in enumerate(pl_edges):
        pl_ij[k] = (i, l); pl_z[k] = z; pl_w[k] = w
    fixed = np.zeros(NP, bool)
    for i in fixed_idx:
        if i < n:
            fixed[i] = True
    return LineGraph(
        poses=jnp.asarray(P, dtype),
        pose_mask=jnp.asarray(np.arange(NP) < n),
        lines=jnp.asarray(L, dtype),
        line_mask=jnp.asarray(np.arange(NL) < nl),
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
