"""Unit tests for the O(boundary) ppermute halo exchange (parallel/halo.py).

Oracle: direct numpy indexing over the ghost directory. The full-solver
parity tests (test_partitioned.py) cover the integration; these pin the
schedule builder and both exchange directions in isolation.
"""
import numpy as np
import pytest
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from g2o_frontend_tpu.parallel.halo import (
    build_halo_spec, halo_bytes_per_exchange, halo_gather, halo_reduce)
from g2o_frontend_tpu.parallel.mesh import EDGE_AXIS, make_mesh


def _random_ghosts(n_dev, B, G, seed):
    """Random ghost directories: each shard reads a few remote poses."""
    rng = np.random.default_rng(seed)
    ghosts = []
    for s in range(n_dev):
        own = set(range(s * B, (s + 1) * B))
        pool = [p for p in range(n_dev * B) if p not in own]
        n = int(rng.integers(0, G + 1))
        ghosts.append(sorted(rng.choice(pool, size=n, replace=False).tolist()))
    return ghosts


@pytest.mark.parametrize("n_dev,B,G,seed,mode", [
    (2, 4, 3, 0, "auto"), (4, 8, 5, 1, "auto"), (8, 16, 7, 2, "auto"),
    (4, 8, 5, 1, "a2a"), (8, 16, 7, 2, "a2a"),
    (8, 16, 7, 2, "ppermute"),
])
def test_halo_gather_and_reduce_match_oracle(n_dev, B, G, seed, mode):
    ghosts = _random_ghosts(n_dev, B, G, seed)
    spec = build_halo_spec(ghosts, B, n_dev, G, mode=mode)
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(seed + 100)
    v = rng.normal(size=(n_dev, B, 3)).astype(np.float32)
    contrib_ghost = np.zeros((n_dev, G, 3), np.float32)
    for s in range(n_dev):
        contrib_ghost[s, : len(ghosts[s])] = rng.normal(
            size=(len(ghosts[s]), 3)
        )
    own0 = rng.normal(size=(n_dev, B, 3)).astype(np.float32)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(EDGE_AXIS),) * 5,
             out_specs=(P(EDGE_AXIS), P(EDGE_AXIS)))
    def run(v_blk, own, gh, sidx, rpos):
        g = halo_gather(v_blk[0], sidx[0], rpos[0], spec, EDGE_AXIS)
        r = halo_reduce(own[0], gh[0], sidx[0], rpos[0], spec, EDGE_AXIS)
        return g[None], r[None]

    g_out, r_out = jax.jit(run)(
        jnp.asarray(v), jnp.asarray(own0), jnp.asarray(contrib_ghost),
        jnp.asarray(spec.send_idx), jnp.asarray(spec.recv_pos),
    )
    g_out, r_out = np.asarray(g_out), np.asarray(r_out)

    # oracle: gather reads owner values; reduce scatter-adds ghost rows back
    v_flat = v.reshape(-1, 3)
    r_ref = own0.copy()
    for s in range(n_dev):
        for pos, gid in enumerate(ghosts[s]):
            assert np.allclose(g_out[s, pos], v_flat[gid]), (s, pos, gid)
            t, loc = gid // B, gid % B
            r_ref[t, loc] += contrib_ghost[s, pos]
        # padded ghost slots must be exactly zero
        assert np.all(g_out[s, len(ghosts[s]):] == 0.0)
    assert np.allclose(r_out, r_ref, rtol=1e-6, atol=1e-6)


def test_halo_bytes_accounting():
    ghosts = _random_ghosts(4, 8, 5, 3)
    spec = build_halo_spec(ghosts, 8, 4, 5)
    b = halo_bytes_per_exchange(spec, 3)
    assert b == sum(spec.sizes) * 3 * 4
    # strictly less than a full-field all_gather per device
    assert b < 4 * 8 * 3 * 4
