"""Distributed block-tridiagonal solves: local cyclic reduction + SPIKE.

The round-3 single-device LM solver beat the float64 control on victoriaPark
because its preconditioner contains the *global* odometry-chain tridiagonal
(solvers/tridiag.py cyclic reduction) — but that factorization only existed
on one device. This module distributes it: the chain is block-partitioned in
trajectory order (the same partition as parallel/partitioned_pose_graph.py),
each device cyclic-reduction-factors its OWN B-block tridiagonal, and the
(D-1) boundary couplings are handled by the SPIKE algorithm [Polizzi &
Sameh 2006]:

    T = diag(T_s) + boundary couplings
    x_s = T_s^-1 r_s - W_s x_{s-1}[B-1] - V_s x_{s+1}[0]

with spikes ``W_s = T_s^-1 (e_0 (x) L_bnd)`` and
``V_s = T_s^-1 (e_{B-1} (x) U_bnd)`` factored once. Taking the first/last
block rows of each device yields a tiny replicated interface system over the
2D boundary unknowns (``(2D*d)^2`` dense, e.g. 48x48 for D=8 SE2 blocks) —
assembled with one `psum`, LU-factored identically on every device. A solve
then costs: one local CR solve + one `psum` of 2 boundary blocks + one
replicated dense triangular solve + one local rank-2 correction. Per-solve
communication is O(D * d) bytes — independent of N.

This is exact (up to fp roundoff): the distributed T^-1 equals the
single-device T^-1, so preconditioners built from it converge identically.
The reference's counterpart is the sequential CHOLMOD factorization inside
g2o (``boss_map_building/map_g2o_reflector.h:50-74``); the structural analog
of the partition is ``boss_map/map_utils.cpp:167`` makePartitions.

All functions here are *per-device* code: call them inside `shard_map` over
a 1-D mesh axis. The global chain is assumed symmetric (U_bnd of device s
equals the transpose of the L coupling seen by device s+1), which holds for
Gauss-Newton Hessians.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..solvers.tridiag import CRFactor, cr_factor, cr_solve


class SpikeFactor(NamedTuple):
    fac: CRFactor  # local cyclic-reduction factor of T_s (B blocks)
    W: jnp.ndarray  # (B, d, d) left spike  T_s^-1 (e_0 (x) L_bnd)
    V: jnp.ndarray  # (B, d, d) right spike T_s^-1 (e_{B-1} (x) U_bnd)
    int_lu: tuple  # replicated LU of the (2D*d, 2D*d) interface matrix
    s_idx: jnp.ndarray  # this device's mesh position
    n_dev: int
    d: int


def spike_factor(L, Dm, U, U_bnd, axis: str, n_dev: int) -> SpikeFactor:
    """Factor the distributed chain for repeated solves (inside shard_map).

    Args:
      L, Dm, U: (B, d, d) this device's local block tridiagonal (internal
        couplings only; U[B-1] and L[0] must be zero — boundary couplings go
        through U_bnd).
      U_bnd: (d, d) coupling of this device's LAST block to the NEXT
        device's first block (zero on the last device / where no boundary
        edge exists). The left coupling is derived by symmetry via one
        `ppermute` of U_bnd.
      axis: mesh axis name.
      n_dev: mesh size D (static).
    """
    d = Dm.shape[1]
    B = Dm.shape[0]
    dtype = Dm.dtype
    fac = cr_factor(L, Dm, U)

    # left coupling L_bnd of device s = (U_bnd of device s-1)^T; the ring
    # wraps the last device's (zero) U_bnd to device 0, which is exactly the
    # "no left neighbor" case.
    perm = [(t, (t + 1) % n_dev) for t in range(n_dev)]
    L_bnd = jnp.swapaxes(jax.lax.ppermute(U_bnd, axis, perm), 0, 1)

    rhsW = jnp.zeros((B, d, d), dtype).at[0].set(L_bnd)
    rhsV = jnp.zeros((B, d, d), dtype).at[B - 1].set(U_bnd)
    W = cr_solve(fac, rhsW)
    V = cr_solve(fac, rhsV)

    # interface system over u = [x_0[0], x_0[B-1], ..., x_{D-1}[B-1]]:
    #   x_s[0]     + W_s[0]   x_{s-1}[B-1] + V_s[0]   x_{s+1}[0] = y_s[0]
    #   x_s[B-1]   + W_s[B-1] x_{s-1}[B-1] + V_s[B-1] x_{s+1}[0] = y_s[B-1]
    # Each device scatters its four coupling blocks; the extra row/col D2 is
    # a dump slot for the (zero) blocks of the chain ends.
    s_idx = jax.lax.axis_index(axis)
    D2 = 2 * n_dev
    colL = jnp.where(s_idx > 0, 2 * s_idx - 1, D2)
    colR = jnp.where(s_idx < n_dev - 1, 2 * s_idx + 2, D2)
    Aloc = jnp.zeros((D2 + 1, D2 + 1, d, d), dtype)
    Aloc = Aloc.at[2 * s_idx, colL].set(W[0])
    Aloc = Aloc.at[2 * s_idx + 1, colL].set(W[B - 1])
    Aloc = Aloc.at[2 * s_idx, colR].set(V[0])
    Aloc = Aloc.at[2 * s_idx + 1, colR].set(V[B - 1])
    A = jax.lax.psum(Aloc, axis)[:D2, :D2]
    A = jnp.transpose(A, (0, 2, 1, 3)).reshape(D2 * d, D2 * d)
    A = A + jnp.eye(D2 * d, dtype=dtype)
    int_lu = jax.scipy.linalg.lu_factor(A)
    return SpikeFactor(fac, W, V, int_lu, s_idx, n_dev, d)


def spike_solve(sf: SpikeFactor, r, axis: str):
    """Solve the factored distributed system for this device's rows.

    Args:
      r: (B, d) or (B, d, m) local right-hand-side rows.
    Returns the local solution rows, same shape. Communication: one psum of
    2 boundary blocks (O(D*d*m) replicated bytes), nothing else.
    """
    squeeze = r.ndim == 2
    rr = r[..., None] if squeeze else r
    B, d, m = rr.shape
    y = cr_solve(sf.fac, rr)
    D2 = 2 * sf.n_dev
    rhs_loc = (
        jnp.zeros((D2, d, m), rr.dtype)
        .at[2 * sf.s_idx].set(y[0])
        .at[2 * sf.s_idx + 1].set(y[B - 1])
    )
    rhs = jax.lax.psum(rhs_loc, axis).reshape(D2 * d, m)
    u = jax.scipy.linalg.lu_solve(sf.int_lu, rhs).reshape(D2, d, m)
    xl = u[jnp.clip(2 * sf.s_idx - 1, 0, D2 - 1)]  # W=0 on device 0
    xr = u[jnp.clip(2 * sf.s_idx + 2, 0, D2 - 1)]  # V=0 on the last device
    x = y - jnp.einsum("bij,jm->bim", sf.W, xl) - jnp.einsum(
        "bij,jm->bim", sf.V, xr
    )
    return x[..., 0] if squeeze else x


def spike_solve_bytes(n_dev: int, d: int, m: int = 1, itemsize: int = 4):
    """Replicated psum payload per solve (the only wire traffic)."""
    return 2 * n_dev * d * m * itemsize
