"""SPIKE distributed block-tridiagonal solver vs dense float64 oracles.

Pattern per SURVEY §4: synthetic known systems, numpy ground truth
(octave-oracle style), exercised on the 8-virtual-device CPU mesh.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from functools import partial
from jax import shard_map
from jax.sharding import PartitionSpec as P

from g2o_frontend_tpu.parallel.mesh import EDGE_AXIS, make_mesh
from g2o_frontend_tpu.parallel.spike import spike_factor, spike_solve


def _chain_system(n_blocks, d, seed=0):
    """Random SPD-ish block tridiagonal: heavy diagonal + symmetric
    couplings, global dense assembly as the oracle."""
    rng = np.random.default_rng(seed)
    D = np.zeros((n_blocks, d, d))
    U = np.zeros((n_blocks, d, d))
    for i in range(n_blocks):
        M = rng.normal(0, 1, (d, d))
        D[i] = M @ M.T + (d + 2.0) * np.eye(d)
    for i in range(n_blocks - 1):
        U[i] = rng.normal(0, 0.4, (d, d))
    A = np.zeros((n_blocks * d, n_blocks * d))
    for i in range(n_blocks):
        A[i * d:(i + 1) * d, i * d:(i + 1) * d] = D[i]
        if i + 1 < n_blocks:
            A[i * d:(i + 1) * d, (i + 1) * d:(i + 2) * d] = U[i]
            A[(i + 1) * d:(i + 2) * d, i * d:(i + 1) * d] = U[i].T
    return D, U, A


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("d", [3, 6])
def test_spike_matches_dense(n_dev, d):
    n_blocks = 8 * n_dev  # B = 8 blocks per device
    B = n_blocks // n_dev
    D, U, A = _chain_system(n_blocks, d, seed=n_dev * 10 + d)
    rng = np.random.default_rng(1)
    r = rng.normal(0, 1, (n_blocks, d))
    x_ref = np.linalg.solve(A, r.reshape(-1)).reshape(n_blocks, d)

    # shard: local internal tridiag + boundary coupling per device
    D_blk = D.reshape(n_dev, B, d, d).astype(np.float32)
    U_loc = np.zeros((n_dev, B, d, d), np.float32)
    L_loc = np.zeros((n_dev, B, d, d), np.float32)
    U_bnd = np.zeros((n_dev, d, d), np.float32)
    for s in range(n_dev):
        lo = s * B
        for i in range(B - 1):
            U_loc[s, i] = U[lo + i]
            L_loc[s, i + 1] = U[lo + i].T
        if s < n_dev - 1:
            U_bnd[s] = U[lo + B - 1]
    r_blk = r.reshape(n_dev, B, d).astype(np.float32)

    mesh = make_mesh(n_dev)
    shard = P(EDGE_AXIS)

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(shard,) * 5,
             out_specs=shard)
    def solve(Db, Ub, Lb, Ubnd, rb):
        sf = spike_factor(Lb[0], Db[0], Ub[0], Ubnd[0], EDGE_AXIS, n_dev)
        return spike_solve(sf, rb[0], EDGE_AXIS)[None]

    with jax.default_matmul_precision("highest"):
        x = solve(D_blk, U_loc, L_loc, U_bnd, r_blk)
    x = np.asarray(x).reshape(n_blocks, d)
    np.testing.assert_allclose(x, x_ref, rtol=2e-4, atol=2e-4)


def test_spike_multi_rhs():
    n_dev, d, B = 4, 3, 8
    n_blocks = n_dev * B
    D, U, A = _chain_system(n_blocks, d, seed=7)
    rng = np.random.default_rng(2)
    m = 5
    R = rng.normal(0, 1, (n_blocks, d, m))
    X_ref = np.linalg.solve(A, R.reshape(n_blocks * d, m)).reshape(
        n_blocks, d, m
    )
    D_blk = D.reshape(n_dev, B, d, d).astype(np.float32)
    U_loc = np.zeros((n_dev, B, d, d), np.float32)
    L_loc = np.zeros((n_dev, B, d, d), np.float32)
    U_bnd = np.zeros((n_dev, d, d), np.float32)
    for s in range(n_dev):
        lo = s * B
        for i in range(B - 1):
            U_loc[s, i] = U[lo + i]
            L_loc[s, i + 1] = U[lo + i].T
        if s < n_dev - 1:
            U_bnd[s] = U[lo + B - 1]
    R_blk = R.reshape(n_dev, B, d, m).astype(np.float32)

    mesh = make_mesh(n_dev)
    shard = P(EDGE_AXIS)

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(shard,) * 5, out_specs=shard)
    def solve(Db, Ub, Lb, Ubnd, Rb):
        sf = spike_factor(Lb[0], Db[0], Ub[0], Ubnd[0], EDGE_AXIS, n_dev)
        return spike_solve(sf, Rb[0], EDGE_AXIS)[None]

    with jax.default_matmul_precision("highest"):
        X = solve(D_blk, U_loc, L_loc, U_bnd, R_blk)
    np.testing.assert_allclose(
        np.asarray(X).reshape(n_blocks, d, m), X_ref, rtol=2e-4, atol=2e-4
    )


def test_spike_single_device_degenerates_to_cr():
    """D=1: no boundary, spike must equal the plain cyclic reduction."""
    n_blocks, d = 16, 3
    D, U, A = _chain_system(n_blocks, d, seed=3)
    rng = np.random.default_rng(4)
    r = rng.normal(0, 1, (n_blocks, d))
    x_ref = np.linalg.solve(A, r.reshape(-1)).reshape(n_blocks, d)
    U_loc = np.concatenate([U[:-1], np.zeros((1, d, d))]).astype(np.float32)
    L_loc = np.concatenate(
        [np.zeros((1, d, d)), np.swapaxes(U[:-1], 1, 2)]
    ).astype(np.float32)
    mesh = make_mesh(1)
    shard = P(EDGE_AXIS)

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(shard,) * 5, out_specs=shard)
    def solve(Db, Ub, Lb, Ubnd, rb):
        sf = spike_factor(Lb[0], Db[0], Ub[0], Ubnd[0], EDGE_AXIS, 1)
        return spike_solve(sf, rb[0], EDGE_AXIS)[None]

    with jax.default_matmul_precision("highest"):
        x = solve(
            D[None].astype(np.float32), U_loc[None], L_loc[None],
            np.zeros((1, d, d), np.float32), r[None].astype(np.float32)
        )
    np.testing.assert_allclose(
        np.asarray(x)[0], x_ref, rtol=2e-4, atol=2e-4
    )
