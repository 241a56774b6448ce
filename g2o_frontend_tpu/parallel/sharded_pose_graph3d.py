"""Edge-sharded distributed SE3 pose-graph optimization (3D counterpart of
sharded_pose_graph.py — same psum-per-matvec communication pattern)."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..graph.store import PoseGraph3D
from ..solvers.pcg import pcg
from ..solvers.pose_graph import (
    _pose7_to_T,
    _T_to_pose7,
    linearize_se3,
)
from ..utils import lie
from .mesh import EDGE_AXIS, pad_to_multiple


def _psum(x):
    return jax.lax.psum(x, EDGE_AXIS)


def optimize_se3_sharded(g: PoseGraph3D, mesh, iters: int = 10,
                         cg_iters: int = 100, lm_lambda0: float = 1e-4):
    n_dev = mesh.devices.size
    pp_ij = pad_to_multiple(g.pp_ij, n_dev)
    pp_meas = pad_to_multiple(g.pp_meas, n_dev)
    pp_info = pad_to_multiple(g.pp_info, n_dev)
    pp_mask = pad_to_multiple(g.pp_mask, n_dev)
    NP = g.poses.shape[0]
    free_p = (g.pose_mask & ~g.fixed).astype(g.poses.dtype)

    e_spec = P(EDGE_AXIS)
    rep = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep, e_spec, e_spec, e_spec, e_spec, rep),
        out_specs=(rep, rep),
    )
    def run(poses0, pp_ij, pp_meas, pp_info, pp_mask, free_p):
        def local_graph(poses):
            return PoseGraph3D(poses, g.pose_mask, pp_ij, pp_meas, pp_info,
                               pp_mask, g.fixed)

        def chi2_of(poses):
            return _psum(linearize_se3(local_graph(poses)).chi2)

        def step(k, state):
            poses, lam, trace = state
            lin = linearize_se3(local_graph(poses))
            chi2 = _psum(lin.chi2)
            we = jnp.einsum("kij,kj->ki", lin.w_pp, lin.e_pp)
            gp = _psum(
                jax.ops.segment_sum(
                    jnp.einsum("kdi,kd->ki", lin.Ji_pp, we), pp_ij[:, 0], NP
                )
                + jax.ops.segment_sum(
                    jnp.einsum("kdi,kd->ki", lin.Jj_pp, we), pp_ij[:, 1], NP
                )
            )
            Dp = _psum(
                jax.ops.segment_sum(
                    jnp.einsum("kdi,kde,kej->kij", lin.Ji_pp, lin.w_pp, lin.Ji_pp),
                    pp_ij[:, 0], NP,
                )
                + jax.ops.segment_sum(
                    jnp.einsum("kdi,kde,kej->kij", lin.Jj_pp, lin.w_pp, lin.Jj_pp),
                    pp_ij[:, 1], NP,
                )
            )

            def hvp(v):
                (vp,) = v
                vp = vp * free_p[:, None]
                Jv = jnp.einsum("kdi,ki->kd", lin.Ji_pp, vp[pp_ij[:, 0]]) + jnp.einsum(
                    "kdi,ki->kd", lin.Jj_pp, vp[pp_ij[:, 1]]
                )
                WJv = jnp.einsum("kde,ke->kd", lin.w_pp, Jv)
                hp = _psum(
                    jax.ops.segment_sum(
                        jnp.einsum("kdi,kd->ki", lin.Ji_pp, WJv), pp_ij[:, 0], NP
                    )
                    + jax.ops.segment_sum(
                        jnp.einsum("kdi,kd->ki", lin.Jj_pp, WJv), pp_ij[:, 1], NP
                    )
                )
                hp = hp + lam * jnp.einsum("kij,kj->ki", Dp, vp)
                return (hp * free_p[:, None] + (1.0 - free_p)[:, None] * v[0],)

            eye6 = jnp.eye(6, dtype=poses.dtype)
            Dp_d = jnp.where(
                free_p[:, None, None] > 0, (1 + lam) * Dp + 1e-6 * eye6, eye6
            )
            Dp_inv = jnp.linalg.inv(Dp_d)

            def precond(r):
                return (jnp.einsum("kij,kj->ki", Dp_inv, r[0]),)

            b = (-gp * free_p[:, None],)
            (dp,), _, _ = pcg(hvp, b, precond, max_iters=cg_iters, rtol=1e-8)
            new_poses = jax.vmap(
                lambda p, d: _T_to_pose7(_pose7_to_T(p) @ lie.se3_exp(d))
            )(poses, dp * free_p[:, None])
            new_chi2 = chi2_of(new_poses)
            accept = new_chi2 < chi2
            poses = jnp.where(accept, new_poses, poses)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-10),
                            jnp.minimum(lam * 4.0, 1e8))
            trace = trace.at[k + 1].set(jnp.where(accept, new_chi2, chi2))
            return poses, lam, trace

        trace0 = jnp.zeros(iters + 1, poses0.dtype).at[0].set(chi2_of(poses0))
        poses, lam, trace = jax.lax.fori_loop(
            0, iters, step,
            (poses0, jnp.asarray(lm_lambda0, poses0.dtype), trace0),
        )
        return poses, trace

    poses, trace = jax.jit(run)(g.poses, pp_ij, pp_meas, pp_info, pp_mask, free_p)
    return g.with_poses(poses), trace
