"""Vectorized generalized RANSAC: K hypotheses scored on-chip in one program.

Replaces the reference's serial `GeneralizedRansac` loop
(``ransac/ransac.h:130-208``: recursive minimal-set enumeration, one
hypothesis at a time, early stop at `inlierStopFraction`) with the BASELINE
"RANSAC hypothesis scoring ... on-chip kernels" design:

1. sample K minimal index sets at once (`jax.random`),
2. solve all K minimal problems with one `vmap` of the closed-form solver,
3. score ALL correspondences against ALL hypotheses — an (K, N) error matrix
   computed in one shot,
4. pick the best hypothesis by masked inlier count (ties by error),
5. refine: re-fit on the best inlier set with the same weighted solver, and
   re-score (two guarded refinement rounds ≈ the reference's
   `keepBestFriend`/refinement behavior).

Everything is fixed-shape; rejected/invalid correspondences are masked, never
compacted. The same engine serves points/poses/lines/planes by passing the
matching (fit_fn, err_fn) pair from `solvers.py`.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    transform: jnp.ndarray  # best refined transform
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # () int
    error: jnp.ndarray  # () mean inlier error
    ok: jnp.ndarray  # () bool — enough inliers found


def _sample_minimal_sets(key, n_hyp, minimal_size, n, mask):
    """(n_hyp, minimal_size) index sets, biased to valid entries, distinct
    within each set via the Gumbel top-k trick."""
    g = jax.random.gumbel(key, (n_hyp, n))
    # invalid entries get -inf so they are never picked (unless all invalid)
    g = jnp.where(mask[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, minimal_size)
    return idx


@partial(
    jax.jit,
    static_argnames=("fit_fn", "err_fn", "minimal_size", "n_hypotheses"),
)
def ransac(
    key,
    data1,
    data2,
    mask,
    fit_fn: Callable,
    err_fn: Callable,
    minimal_size: int,
    inlier_threshold: float,
    n_hypotheses: int = 256,
    min_inliers: int = 4,
) -> RansacResult:
    """Run vectorized RANSAC over masked correspondence arrays.

    Args:
      key: PRNG key.
      data1, data2: (N, D...) corresponding measurement arrays.
      mask: (N,) bool valid-correspondence mask.
      fit_fn(d1, d2, w) -> transform (weighted fit).
      err_fn(T, d1, d2) -> (N,) squared errors.
      minimal_size: size of the minimal set.
      inlier_threshold: error threshold (same units as err_fn output).
      n_hypotheses: number of parallel hypotheses.
      min_inliers: success gate.
    """
    n = data1.shape[0]
    fmask = mask.astype(data1.dtype)
    idx = _sample_minimal_sets(key, n_hypotheses, minimal_size, n, mask)

    def solve_one(ids):
        w = jnp.zeros(n, data1.dtype).at[ids].set(1.0) * fmask
        return fit_fn(data1, data2, w)

    hyps = jax.vmap(solve_one)(idx)  # (K, ...)

    def score_one(T):
        e = err_fn(T, data1, data2)
        inl = (e < inlier_threshold) & mask
        cnt = jnp.sum(inl)
        err = jnp.sum(jnp.where(inl, e, 0.0)) / jnp.maximum(cnt, 1)
        return cnt, err

    counts, errs = jax.vmap(score_one)(hyps)
    # best: max count, break ties by low error
    score = counts.astype(data1.dtype) - 1e-3 * errs / (1.0 + errs)
    best = jnp.argmax(score)
    T_best = jax.tree_util.tree_map(lambda h: h[best], hyps)

    # two refinement rounds on the running inlier set (guarded: keep the
    # refit only if it does not lose inliers)
    def refine(T, _):
        e = err_fn(T, data1, data2)
        inl = (e < inlier_threshold) & mask
        w = inl.astype(data1.dtype)
        T_new = fit_fn(data1, data2, w)
        e_new = err_fn(T_new, data1, data2)
        inl_new = (e_new < inlier_threshold) & mask
        better = jnp.sum(inl_new) >= jnp.sum(inl)
        T = jax.tree_util.tree_map(
            lambda a, b: jnp.where(better, a, b), T_new, T
        )
        return T, None

    T_ref, _ = jax.lax.scan(refine, T_best, None, length=2)
    e = err_fn(T_ref, data1, data2)
    inliers = (e < inlier_threshold) & mask
    cnt = jnp.sum(inliers)
    err = jnp.sum(jnp.where(inliers, e, 0.0)) / jnp.maximum(cnt, 1)
    return RansacResult(T_ref, inliers, cnt, err, cnt >= min_inliers)
