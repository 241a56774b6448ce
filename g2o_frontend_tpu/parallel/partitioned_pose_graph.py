"""Partitioned-state distributed SE2 pose-graph optimization.

SURVEY §7 Phase 6 proper (the structural analog of the reference's map
partitions ``boss_map/map_utils.cpp:167`` + submaps
``mapper/graph_slam/sub_map.h``): poses are block-partitioned across the
device mesh — NOT replicated — together with their Hessian diagonal blocks,
per-edge linearizations, and all CG state. Each device owns:

- a contiguous block of B = ceil(NP/D) poses (trajectory order, so chain
  edges stay shard-local),
- the edges whose lower endpoint falls in its block, with endpoints
  re-encoded as local slots: [0, B) = own poses, [B, B+G) = ghost slots for
  remote endpoints (loop closures / block-boundary odometry),
- the ghost directory: global pose ids of its G ghost slots.

Communication per CG matvec (the halo exchange, parallel/halo.py):
- point-to-point `ppermute` rounds moving ONLY the boundary pose blocks the
  ghost directory names (one round per active ring shift; a chain partition
  has a single shift), and
- the same schedule in reverse to scatter-reduce ghost Hessian/gradient
  contributions back to their owners.
Per-device bytes are O(ghosts) per direction — independent of N and
shrinking as D grows at fixed N — versus round 2's full-field
`all_gather`+`psum` whose per-device volume grew with mesh size. Landmark
state (small: L x 2) stays replicated and is psum'd.

Memory per device is O(E/D + NP/D + NL) versus the replicated solver's
O(E/D + NP + NL) per-edge/diag/CG footprint, with no O(N) transients — see
``partition_stats()`` for the exact byte accounting, and EVAL.md §7 for the
measured communication volume.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..graph.store import PoseGraph2D
from ..solvers import pose_graph as pg
from ..solvers.pcg import pcg
from ..utils import lie
from .halo import (HaloSpec, build_halo_spec, halo_bytes_per_exchange,
                   halo_collectives_per_exchange, halo_gather, halo_reduce)
from .mesh import EDGE_AXIS


class PartitionedSE2(NamedTuple):
    """Host-built shard-stacked problem; leading dim D on sharded arrays."""

    poses_blk: np.ndarray  # (D, B, 3)
    free_p_blk: np.ndarray  # (D, B) f32
    ghost_ids: np.ndarray  # (D, G) int32 global pose ids (0-padded)
    pp_ij: np.ndarray  # (D, E, 2) int32 LOCAL slot ids (own < B, ghost >= B)
    pp_meas: np.ndarray  # (D, E, 3)
    pp_info: np.ndarray  # (D, E, 3, 3)
    pp_mask: np.ndarray  # (D, E) bool
    pp_chain: np.ndarray  # (D, E) bool: block-INTERNAL consecutive odometry
    pp_bnd: np.ndarray  # (D, E) bool: the right-BOUNDARY consecutive edge
    # (global i = lo+B-1 -> j = lo+B; feeds the SPIKE interface coupling)
    pl_ij: np.ndarray  # (D, EL, 2) int32 (local pose slot, LOCAL lm slot)
    pl_meas: np.ndarray  # (D, EL, 2)
    pl_info: np.ndarray  # (D, EL, 2, 2)
    pl_mask: np.ndarray  # (D, EL) bool
    lms_blk: np.ndarray  # (D, BL, 2) landmark blocks — sharded, NOT replicated
    free_l_blk: np.ndarray  # (D, BL) f32
    lm_ghost_ids: np.ndarray  # (D, GL) int32 global landmark ids (0-padded)
    lm_gid: np.ndarray  # (D, BL+GL) int32 global lm id per local slot
    # (own slots then ghost slots; padding slots 0 — only reached by edges
    # whose mask already zeroes their weight)
    n_poses: int  # true NP (before block padding)
    n_landmarks: int  # true NL
    lm_owner: np.ndarray  # (NL,) int32 owning device per landmark
    lm_local: np.ndarray  # (NL,) int32 owner-local slot per landmark
    halo: HaloSpec  # pose-block exchange schedule (parallel/halo.py)
    halo_l: HaloSpec  # landmark-block exchange schedule


def partition_se2(g: PoseGraph2D, n_dev: int,
                  halo_mode: str = "auto") -> PartitionedSE2:
    """Block-partition a PoseGraph2D over n_dev shards (host-side).

    halo_mode picks the exchange wire format (parallel/halo.py): "ppermute"
    minimizes bytes, "a2a" minimizes collective launches, "auto" trades off.
    """
    poses = np.asarray(g.poses)
    pose_mask = np.asarray(g.pose_mask)
    fixed = np.asarray(g.fixed)
    NP = int(pose_mask.sum())
    B = -(-NP // n_dev)
    NPp = B * n_dev

    pp_ij = np.asarray(g.pp_ij)
    pp_mask = np.asarray(g.pp_mask)
    pl_ij = np.asarray(g.pl_ij)
    pl_mask = np.asarray(g.pl_mask)

    def shard_of(p):
        return p // B

    # bucket edges by owner = shard of the lower endpoint
    own_pp = [[] for _ in range(n_dev)]
    for k in np.where(pp_mask)[0]:
        own_pp[shard_of(min(pp_ij[k, 0], pp_ij[k, 1]))].append(k)
    own_pl = [[] for _ in range(n_dev)]
    for k in np.where(pl_mask)[0]:
        own_pl[shard_of(pl_ij[k, 0])].append(k)

    E = max(8, max((len(b) for b in own_pp), default=0))
    EL = max(8, max((len(b) for b in own_pl), default=0))

    # ghost directory per shard
    ghosts = []
    for s in range(n_dev):
        lo, hi = s * B, (s + 1) * B
        gset = set()
        for k in own_pp[s]:
            for p in pp_ij[k]:
                if not (lo <= p < hi):
                    gset.add(int(p))
        for k in own_pl[s]:
            p = pl_ij[k, 0]
            if not (lo <= p < hi):
                gset.add(int(p))
        ghosts.append(sorted(gset))
    G = max(8, max((len(gl) for gl in ghosts), default=0))

    # landmark blocks + ghost directory. Each landmark is OWNED by the pose
    # block that observes it most (the reference groups landmarks with their
    # submaps the same way — ``boss_map/map_utils.cpp:167`` partitions carry
    # their local features); only landmarks co-observed across blocks
    # (revisits / loop closures) become ghosts — O(boundary), not O(NL).
    NL = g.landmarks.shape[0]
    obs_count = np.zeros((NL, n_dev), np.int64)
    for s in range(n_dev):
        for k in own_pl[s]:
            obs_count[pl_ij[k, 1], s] += 1
    observed = obs_count.sum(axis=1) > 0
    lm_owner = np.where(
        observed, obs_count.argmax(axis=1), np.arange(NL) % n_dev
    ).astype(np.int32)
    owned_ls = [np.where(lm_owner == s)[0] for s in range(n_dev)]
    BL = max(1, max(len(o) for o in owned_ls))
    lm_local = np.zeros(NL, np.int32)
    for s in range(n_dev):
        lm_local[owned_ls[s]] = np.arange(len(owned_ls[s]))
    lm_ghosts = []
    for s in range(n_dev):
        lset = {
            int(pl_ij[k, 1])
            for k in own_pl[s]
            if lm_owner[pl_ij[k, 1]] != s
        }
        lm_ghosts.append(sorted(lset))
    GL = max(4, max((len(gl) for gl in lm_ghosts), default=0))

    poses_blk = np.zeros((n_dev, B, 3), np.float32)
    free_p_blk = np.zeros((n_dev, B), np.float32)
    ghost_ids = np.zeros((n_dev, G), np.int32)
    pp_ij_l = np.zeros((n_dev, E, 2), np.int32)
    pp_meas_l = np.zeros((n_dev, E, 3), np.float32)
    pp_info_l = np.zeros((n_dev, E, 3, 3), np.float32)
    pp_mask_l = np.zeros((n_dev, E), bool)
    pp_chain_l = np.zeros((n_dev, E), bool)
    pp_bnd_l = np.zeros((n_dev, E), bool)
    pl_ij_l = np.zeros((n_dev, EL, 2), np.int32)
    pl_meas_l = np.zeros((n_dev, EL, 2), np.float32)
    pl_info_l = np.zeros((n_dev, EL, 2, 2), np.float32)
    pl_mask_l = np.zeros((n_dev, EL), bool)

    pp_meas = np.asarray(g.pp_meas)
    pp_info = np.asarray(g.pp_info)
    pl_meas = np.asarray(g.pl_meas)
    pl_info = np.asarray(g.pl_info)

    lms = np.asarray(g.landmarks, np.float32)
    lmask = np.asarray(g.landmark_mask)
    lms_blk = np.zeros((n_dev, BL, 2), np.float32)
    free_l_blk = np.zeros((n_dev, BL), np.float32)
    lm_ghost_ids = np.zeros((n_dev, GL), np.int32)
    lm_gid = np.zeros((n_dev, BL + GL), np.int32)

    for s in range(n_dev):
        lo = s * B
        blk = poses[lo : lo + B]
        poses_blk[s, : len(blk)] = blk
        fm = (pose_mask & ~fixed)[lo : lo + B]
        free_p_blk[s, : len(blk)] = fm.astype(np.float32)
        gmap = {p: B + r for r, p in enumerate(ghosts[s])}
        ghost_ids[s, : len(ghosts[s])] = ghosts[s]
        mine = owned_ls[s]
        lms_blk[s, : len(mine)] = lms[mine]
        free_l_blk[s, : len(mine)] = lmask[mine].astype(np.float32)
        lgmap = {l: BL + r for r, l in enumerate(lm_ghosts[s])}
        lm_ghost_ids[s, : len(lm_ghosts[s])] = lm_ghosts[s]
        lm_gid[s, : len(mine)] = mine
        lm_gid[s, BL : BL + len(lm_ghosts[s])] = lm_ghosts[s]

        def loc(p):
            return p - lo if lo <= p < lo + B else gmap[int(p)]

        def loc_l(l):
            return lm_local[l] if lm_owner[l] == s else lgmap[int(l)]

        for r, k in enumerate(own_pp[s]):
            pp_ij_l[s, r] = (loc(pp_ij[k, 0]), loc(pp_ij[k, 1]))
            pp_meas_l[s, r] = pp_meas[k]
            pp_info_l[s, r] = pp_info[k]
            pp_mask_l[s, r] = True
            # block-internal consecutive odometry edge (feeds the optional
            # per-device chain preconditioner; boundary edges stay out)
            pp_chain_l[s, r] = (
                pp_ij[k, 1] == pp_ij[k, 0] + 1
                and lo <= pp_ij[k, 0] < lo + B - 1
            )
            pp_bnd_l[s, r] = (
                pp_ij[k, 1] == pp_ij[k, 0] + 1 and pp_ij[k, 0] == lo + B - 1
            )
        for r, k in enumerate(own_pl[s]):
            pl_ij_l[s, r] = (loc(pl_ij[k, 0]), loc_l(pl_ij[k, 1]))
            pl_meas_l[s, r] = pl_meas[k]
            pl_info_l[s, r] = pl_info[k]
            pl_mask_l[s, r] = True

    return PartitionedSE2(
        poses_blk=poses_blk,
        free_p_blk=free_p_blk,
        ghost_ids=ghost_ids,
        pp_ij=pp_ij_l,
        pp_meas=pp_meas_l,
        pp_info=pp_info_l,
        pp_mask=pp_mask_l,
        pp_chain=pp_chain_l,
        pp_bnd=pp_bnd_l,
        pl_ij=pl_ij_l,
        pl_meas=pl_meas_l,
        pl_info=pl_info_l,
        pl_mask=pl_mask_l,
        lms_blk=lms_blk,
        free_l_blk=free_l_blk,
        lm_ghost_ids=lm_ghost_ids,
        lm_gid=lm_gid,
        n_poses=NP,
        n_landmarks=NL,
        lm_owner=lm_owner,
        lm_local=lm_local,
        halo=build_halo_spec(ghosts, B, n_dev, G, mode=halo_mode),
        halo_l=build_halo_spec(lm_ghosts, BL, n_dev, GL, mode=halo_mode,
                               owner=lm_owner, local=lm_local),
    )


def partition_stats(p: PartitionedSE2) -> dict:
    """Per-device memory accounting (bytes) vs the full-graph footprint."""
    per_dev = 0
    full = 0
    for a in [getattr(p, name) for name in
              ("poses_blk", "free_p_blk", "ghost_ids", "pp_ij", "pp_meas",
               "pp_info", "pp_mask", "pp_chain", "pp_bnd", "pl_ij", "pl_meas",
               "pl_info", "pl_mask", "lms_blk", "free_l_blk",
               "lm_ghost_ids", "lm_gid")] + [
              p.halo.send_idx, p.halo.recv_pos,
              p.halo_l.send_idx, p.halo_l.recv_pos]:
        per_dev += a.nbytes // a.shape[0]
        full += a.nbytes
    D, B = p.poses_blk.shape[0], p.poses_blk.shape[1]
    G = p.ghost_ids.shape[1]
    BL, GL = p.lms_blk.shape[1], p.lm_ghost_ids.shape[1]
    # CG state: 4 block vectors (x, r, z, p) + the B+G / BL+GL aug vectors
    # + the packed halo buffers — O(N/D + ghosts), no O(N) transient
    cg_per_dev = (4 * B + B + G + sum(p.halo.sizes)) * 3 * 4 + (
        (4 * BL + BL + GL + sum(p.halo_l.sizes)) * 2 * 4
    )
    return {
        "devices": D,
        "block_poses": B,
        "block_landmarks": BL,
        "bytes_sharded_per_device": per_dev,
        "bytes_replicated_per_device": 0,
        "bytes_full_graph": full,
        "bytes_cg_state_per_device": cg_per_dev,
    }


def comm_volume(p: PartitionedSE2, lm_iters: int, cg_matvecs: int) -> dict:
    """Per-device communication bytes for a run, from the halo schedules.

    Per CG matvec: forward halo exchanges of the pose + landmark search
    directions' boundary blocks + reverse exchanges of ghost Hv
    contributions (each O(ghosts) bytes) + 2 scalar psums (dots). Per LM
    iteration: gradient + diagonal-block halo reduces, the state halo
    gathers, and the chi2 scalar. Nothing is O(N); nothing is replicated.
    """
    halo_vec = halo_bytes_per_exchange(p.halo, 3)  # (S, 3) block vectors
    halo_diag = halo_bytes_per_exchange(p.halo, 9)  # (S, 3, 3) blocks
    halo_lvec = halo_bytes_per_exchange(p.halo_l, 2)  # (S, 2)
    halo_ldiag = halo_bytes_per_exchange(p.halo_l, 4)  # (S, 2, 2)
    per_matvec = 2 * (halo_vec + halo_lvec)
    per_lm = 3 * (halo_vec + halo_lvec) + halo_diag + halo_ldiag
    return {
        "bytes_per_matvec": per_matvec,
        "bytes_per_lm_iter": per_lm,
        "bytes_total": per_matvec * cg_matvecs + per_lm * lm_iters,
        "cg_matvecs": cg_matvecs,
        "halo_shifts": list(p.halo.shifts),
        "halo_slots": int(sum(p.halo.sizes)),
        "halo_lm_slots": int(sum(p.halo_l.sizes)),
        "halo_mode": p.halo.mode,
        "halo_lm_mode": p.halo_l.mode,
        # true boundary traffic (without wire padding): worst device's
        # received ghost slots — the information-theoretic floor
        "true_ghost_slots_max_dev": int(
            (p.halo.recv_pos < p.halo.n_ghost)
            .reshape(p.poses_blk.shape[0], -1).sum(1).max()
        ),
        "true_lm_ghost_slots_max_dev": int(
            (p.halo_l.recv_pos < p.halo_l.n_ghost)
            .reshape(p.poses_blk.shape[0], -1).sum(1).max()
        ),
        "collectives_per_matvec": 2 * (
            halo_collectives_per_exchange(p.halo)
            + halo_collectives_per_exchange(p.halo_l)
        ) + 2,
    }


def optimize_se2_partitioned(
    g: PoseGraph2D,
    mesh,
    iters: int = 10,
    cg_iters: int = 100,
    lm_lambda0: float = 1e-4,
    halo_mode: str = "auto",
    precond: str = "jacobi",
):
    """LM over a pose-block partition; returns (graph, chi2_trace, stats).

    Convergence matches `optimize_se2` up to reduction order; state, edges,
    diagonal blocks and CG vectors are sharded per device.

    precond: "jacobi" (default; trajectory-identical to the single-device
    solver) or "chain" — each device cyclic-reduction-factors ITS OWN
    block's odometry-chain tridiagonal (solvers/tridiag.py) with ZERO extra
    communication; boundary chain edges stay unpreconditioned. Better
    convergence per CG iteration on chain-heavy graphs at identical
    per-matvec comm.
    """
    n_dev = mesh.devices.size
    part = partition_se2(g, n_dev, halo_mode=halo_mode)
    B = part.poses_blk.shape[1]
    G = part.ghost_ids.shape[1]
    BL = part.lms_blk.shape[1]
    GL = part.lm_ghost_ids.shape[1]
    spec = part.halo
    spec_l = part.halo_l
    dtype = jnp.float32

    shard = P(EDGE_AXIS)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(shard,) * 17,
        out_specs=(shard, shard, P(), P()),
    )
    def run(poses_blk, free_p_blk, h_send, h_recv, hl_send, hl_recv,
            pp_ij, pp_meas, pp_info, pp_mask, pp_chain,
            pl_ij, pl_meas, pl_info, pl_mask, lms_blk0, free_l_blk):
        # shard_map passes (1, ...) blocks; drop the shard dim
        poses_blk = poses_blk[0]
        free_p = free_p_blk[0]
        free_l = free_l_blk[0]
        sidx, rpos = h_send[0], h_recv[0]
        lsidx, lrpos = hl_send[0], hl_recv[0]
        pp_ij_l, pp_meas_l = pp_ij[0], pp_meas[0]
        pp_info_l, pp_mask_l = pp_info[0], pp_mask[0]
        pp_chain_l = pp_chain[0]
        pl_ij_l, pl_meas_l = pl_ij[0], pl_meas[0]
        pl_info_l, pl_mask_l = pl_info[0], pl_mask[0]
        lms_blk0 = lms_blk0[0]

        def gather_aug(v_blk):
            """(B, d) -> (B+G, d): own block + ghost values — point-to-point
            halo exchange of ONLY the boundary blocks (O(ghosts) bytes)."""
            gh = halo_gather(v_blk, sidx, rpos, spec, EDGE_AXIS)
            return jnp.concatenate([v_blk, gh], axis=0)

        def ghost_reduce(contrib):
            """(B+G, ...) -> (B, ...): ghost rows sent back to their owners
            and scatter-added — no O(N) transient, O(ghosts) bytes."""
            return halo_reduce(contrib[:B], contrib[B:], sidx, rpos, spec,
                               EDGE_AXIS)

        def gather_aug_l(v_blk):
            gh = halo_gather(v_blk, lsidx, lrpos, spec_l, EDGE_AXIS)
            return jnp.concatenate([v_blk, gh], axis=0)

        def ghost_reduce_l(contrib):
            return halo_reduce(contrib[:BL], contrib[BL:], lsidx, lrpos,
                               spec_l, EDGE_AXIS)

        def local_graph(aug_poses, aug_lms):
            return PoseGraph2D(
                poses=aug_poses,
                pose_mask=jnp.ones(B + G, bool),
                landmarks=aug_lms,
                landmark_mask=jnp.ones(BL + GL, bool),
                pp_ij=pp_ij_l,
                pp_meas=pp_meas_l,
                pp_info=pp_info_l,
                pp_mask=pp_mask_l,
                pl_ij=pl_ij_l,
                pl_meas=pl_meas_l,
                pl_info=pl_info_l,
                pl_mask=pl_mask_l,
                fixed=jnp.zeros(B + G, bool),
            )

        def chi2_of(poses_blk, lms_blk):
            gk = local_graph(gather_aug(poses_blk), gather_aug_l(lms_blk))
            return jax.lax.psum(pg.linearize_se2(gk).chi2, EDGE_AXIS)

        def step(k, state):
            poses_blk, lms_blk, lam, trace, cg_tot = state
            aug = gather_aug(poses_blk)
            gk = local_graph(aug, gather_aug_l(lms_blk))
            lin = pg.linearize_se2(gk)
            chi2 = jax.lax.psum(lin.chi2, EDGE_AXIS)
            gp_aug, gl_aug = pg._grad_se2(gk, lin)
            gp = ghost_reduce(gp_aug)
            gl = ghost_reduce_l(gl_aug)
            Dp_aug, Dl_aug = pg._diag_blocks_se2(gk, lin)
            Dp = ghost_reduce(Dp_aug)
            Dl = ghost_reduce_l(Dl_aug)
            edge_hvp = pg._hvp_edges_se2(gk, lin)

            def hvp(v):
                vp, vl = v
                vp = vp * free_p[:, None]
                vl = vl * free_l[:, None]
                hp_aug, hl_aug = edge_hvp((gather_aug(vp), gather_aug_l(vl)))
                hp = ghost_reduce(hp_aug)
                hl = ghost_reduce_l(hl_aug)
                hp = hp + lam * jnp.einsum("kij,kj->ki", Dp, vp)
                hl = hl + lam * jnp.einsum("kij,kj->ki", Dl, vl)
                hp = hp * free_p[:, None] + (1.0 - free_p)[:, None] * v[0]
                hl = hl * free_l[:, None] + (1.0 - free_l)[:, None] * v[1]
                return (hp, hl)

            if precond == "chain":
                # per-device block-local chain tridiagonal: factored with
                # cyclic reduction, applied shard-locally — no communication
                from ..solvers.tridiag import cr_factor, cr_solve

                ci = jnp.where(pp_chain_l, pp_ij_l[:, 0], B - 1)
                U_chain = jax.ops.segment_sum(
                    jnp.einsum(
                        "kdi,kde,kej->kij", lin.Ji_pp,
                        lin.w_pp * pp_chain_l[:, None, None], lin.Jj_pp,
                    ),
                    ci, B,
                )
                fnext = jnp.concatenate([free_p[1:], jnp.zeros(1, dtype)])
                U_pre = U_chain * (free_p * fnext)[:, None, None]
                L_pre = jnp.concatenate(
                    [jnp.zeros((1, 3, 3), dtype),
                     jnp.swapaxes(U_pre, 1, 2)[:-1]]
                )
                eye3 = jnp.eye(3, dtype=dtype)
                Dp_d = (1.0 + lam) * Dp + 1e-6 * eye3
                Dp_d = jnp.where(free_p[:, None, None] > 0, Dp_d, eye3)
                fac = cr_factor(L_pre, Dp_d, U_pre)
                eye2 = jnp.eye(2, dtype=dtype)
                Dl_d = (1.0 + lam) * Dl + 1e-6 * eye2
                Dl_d = jnp.where(free_l[:, None, None] > 0, Dl_d, eye2)
                Dl_inv = jnp.linalg.inv(Dl_d)

                def pre(r):
                    return (cr_solve(fac, r[0]),
                            jnp.einsum("kij,kj->ki", Dl_inv, r[1]))
            else:
                pre = pg._block_jacobi_precond(Dp, Dl, free_p, free_l, lam)

            def tree_dot(a, b):
                (ap, al), (bp, bl) = a, b
                return jax.lax.psum(
                    jnp.vdot(ap, bp) + jnp.vdot(al, bl), EDGE_AXIS
                )

            b = (-gp * free_p[:, None], -gl * free_l[:, None])
            (dp_, dl_), cg_k, _ = pcg(
                hvp, b, pre, max_iters=cg_iters, rtol=1e-8,
                tree_dot=tree_dot,
            )

            new_poses = poses_blk + dp_ * free_p[:, None]
            new_poses = new_poses.at[:, 2].set(lie.wrap_angle(new_poses[:, 2]))
            new_lms = lms_blk + dl_ * free_l[:, None]
            new_chi2 = chi2_of(new_poses, new_lms)
            accept = new_chi2 < chi2
            poses_blk = jnp.where(accept, new_poses, poses_blk)
            lms_blk = jnp.where(accept, new_lms, lms_blk)
            lam = jnp.where(
                accept, jnp.maximum(lam * 0.5, 1e-10), jnp.minimum(lam * 4.0, 1e8)
            )
            trace = trace.at[k + 1].set(jnp.where(accept, new_chi2, chi2))
            return poses_blk, lms_blk, lam, trace, cg_tot + cg_k

        trace0 = jnp.zeros(iters + 1, dtype).at[0].set(
            chi2_of(poses_blk, lms_blk0)
        )
        poses_blk, lms_blk, lam, trace, cg_tot = jax.lax.fori_loop(
            0, iters, step,
            (poses_blk, lms_blk0, jnp.asarray(lm_lambda0, dtype), trace0,
             jnp.asarray(0, jnp.int32)),
        )
        return poses_blk[None], lms_blk[None], trace, cg_tot

    poses_blk, lms_blk, trace, cg_tot = jax.jit(run)(
        jnp.asarray(part.poses_blk),
        jnp.asarray(part.free_p_blk),
        jnp.asarray(part.halo.send_idx),
        jnp.asarray(part.halo.recv_pos),
        jnp.asarray(part.halo_l.send_idx),
        jnp.asarray(part.halo_l.recv_pos),
        jnp.asarray(part.pp_ij), jnp.asarray(part.pp_meas),
        jnp.asarray(part.pp_info), jnp.asarray(part.pp_mask),
        jnp.asarray(part.pp_chain),
        jnp.asarray(part.pl_ij), jnp.asarray(part.pl_meas),
        jnp.asarray(part.pl_info), jnp.asarray(part.pl_mask),
        jnp.asarray(part.lms_blk), jnp.asarray(part.free_l_blk),
    )
    NP_full = g.poses.shape[0]
    poses_flat = np.asarray(poses_blk).reshape(-1, 3)[:NP_full]
    poses_out = jnp.asarray(
        np.concatenate(
            [poses_flat,
             np.asarray(g.poses)[len(poses_flat):]], axis=0)
        if len(poses_flat) < NP_full else poses_flat
    )
    # un-permute landmark blocks (ownership follows observation, not id)
    lms = jnp.asarray(
        np.asarray(lms_blk)[part.lm_owner, part.lm_local]
    )
    g_out = g.with_poses(poses_out, lms)
    stats = {
        "partition": partition_stats(part),
        "comm": comm_volume(part, iters, int(np.asarray(cg_tot))),
        "cg_total": int(np.asarray(cg_tot)),
    }
    return g_out, trace, stats


# ---------------------------------------------------------------------------
# SE3 variant (pose-only graphs; 7-dim state, 6-DOF twist updates)
# ---------------------------------------------------------------------------


class PartitionedSE3(NamedTuple):
    poses_blk: np.ndarray  # (D, B, 7)
    free_p_blk: np.ndarray  # (D, B) f32
    ghost_ids: np.ndarray  # (D, G) int32
    pp_ij: np.ndarray  # (D, E, 2) int32 local slots
    pp_meas: np.ndarray  # (D, E, 7)
    pp_info: np.ndarray  # (D, E, 6, 6)
    pp_mask: np.ndarray  # (D, E) bool
    pp_chain: np.ndarray  # (D, E) bool: block-internal consecutive edges
    pp_bnd: np.ndarray  # (D, E) bool: right-boundary consecutive edge
    n_poses: int
    halo: HaloSpec


def partition_se3(g, n_dev: int) -> PartitionedSE3:
    """Block-partition a PoseGraph3D over n_dev shards (host-side)."""
    poses = np.asarray(g.poses)
    pose_mask = np.asarray(g.pose_mask)
    fixed = np.asarray(g.fixed)
    NP = int(pose_mask.sum())
    B = -(-NP // n_dev)

    pp_ij = np.asarray(g.pp_ij)
    pp_mask = np.asarray(g.pp_mask)
    own = [[] for _ in range(n_dev)]
    for k in np.where(pp_mask)[0]:
        own[min(pp_ij[k, 0], pp_ij[k, 1]) // B].append(k)
    E = max(8, max((len(b) for b in own), default=0))

    ghosts = []
    for s in range(n_dev):
        lo, hi = s * B, (s + 1) * B
        gset = {
            int(p)
            for k in own[s]
            for p in pp_ij[k]
            if not (lo <= p < hi)
        }
        ghosts.append(sorted(gset))
    G = max(8, max((len(gl) for gl in ghosts), default=0))

    poses_blk = np.zeros((n_dev, B, 7), np.float32)
    poses_blk[..., 6] = 1.0  # identity quaternion w for padding slots
    free_p_blk = np.zeros((n_dev, B), np.float32)
    ghost_ids = np.zeros((n_dev, G), np.int32)
    pp_ij_l = np.zeros((n_dev, E, 2), np.int32)
    pp_meas_l = np.zeros((n_dev, E, 7), np.float32)
    pp_meas_l[..., 6] = 1.0
    pp_info_l = np.zeros((n_dev, E, 6, 6), np.float32)
    pp_mask_l = np.zeros((n_dev, E), bool)
    pp_chain_l = np.zeros((n_dev, E), bool)
    pp_bnd_l = np.zeros((n_dev, E), bool)
    pp_meas = np.asarray(g.pp_meas)
    pp_info = np.asarray(g.pp_info)

    for s in range(n_dev):
        lo = s * B
        blk = poses[lo : lo + B]
        poses_blk[s, : len(blk)] = blk
        free_p_blk[s, : len(blk)] = (pose_mask & ~fixed)[lo : lo + B]
        gmap = {p: B + r for r, p in enumerate(ghosts[s])}
        ghost_ids[s, : len(ghosts[s])] = ghosts[s]

        def loc(p):
            return p - lo if lo <= p < lo + B else gmap[int(p)]

        for r, k in enumerate(own[s]):
            pp_ij_l[s, r] = (loc(pp_ij[k, 0]), loc(pp_ij[k, 1]))
            pp_meas_l[s, r] = pp_meas[k]
            pp_info_l[s, r] = pp_info[k]
            pp_mask_l[s, r] = True
            pp_chain_l[s, r] = (
                pp_ij[k, 1] == pp_ij[k, 0] + 1
                and lo <= pp_ij[k, 0] < lo + B - 1
            )
            pp_bnd_l[s, r] = (
                pp_ij[k, 1] == pp_ij[k, 0] + 1 and pp_ij[k, 0] == lo + B - 1
            )
    return PartitionedSE3(
        poses_blk, free_p_blk, ghost_ids,
        pp_ij_l, pp_meas_l, pp_info_l, pp_mask_l, pp_chain_l, pp_bnd_l, NP,
        build_halo_spec(ghosts, B, n_dev, G),
    )


def optimize_se3_partitioned(
    g,
    mesh,
    iters: int = 10,
    cg_iters: int = 100,
    lm_lambda0: float = 1e-4,
    precond: str = "jacobi",
):
    """SE3 twin of `optimize_se2_partitioned`: pose blocks + ghost halos.

    precond: "jacobi" (block-diagonal) or "spike" — the distributed chain
    preconditioner of parallel/partitioned_schur.py in its SE3 form: each
    device cyclic-reduction-factors its local 6x6 block tridiagonal and the
    boundary couplings form the replicated SPIKE interface system
    (parallel/spike.py). On chain-dominated SE3 graphs (keyframe odometry,
    the PWN-SLAM reflector output) CG then converges in a handful of
    iterations, mirroring the single-device chain preconditioner's
    graphSE3 win (18 matvecs vs 480).
    """
    from ..graph.store import PoseGraph3D
    from .spike import spike_factor, spike_solve

    n_dev = mesh.devices.size
    part = partition_se3(g, n_dev)
    B = part.poses_blk.shape[1]
    G = part.ghost_ids.shape[1]
    spec = part.halo
    dtype = jnp.float32
    free_next0 = np.zeros((n_dev, 1), np.float32)
    for s_ in range(n_dev - 1):
        free_next0[s_, 0] = part.free_p_blk[s_ + 1, 0]

    shard = P(EDGE_AXIS)
    rep = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(shard,) * 11,
        out_specs=(shard, rep),
    )
    def run(poses_blk, free_p_blk, free_next0, h_send, h_recv, pp_ij,
            pp_meas, pp_info, pp_mask, pp_chain, pp_bnd):
        poses_blk = poses_blk[0]
        free_p = free_p_blk[0]
        fnext0 = free_next0[0, 0]
        sidx, rpos = h_send[0], h_recv[0]
        pp_ij_l, pp_meas_l = pp_ij[0], pp_meas[0]
        pp_info_l, pp_mask_l = pp_info[0], pp_mask[0]
        pp_chain_l, pp_bnd_l = pp_chain[0], pp_bnd[0]

        def gather_aug(v_blk):
            gh = halo_gather(v_blk, sidx, rpos, spec, EDGE_AXIS)
            return jnp.concatenate([v_blk, gh], axis=0)

        def ghost_reduce(contrib):
            return halo_reduce(contrib[:B], contrib[B:], sidx, rpos, spec,
                               EDGE_AXIS)

        def local_graph(aug_poses):
            return PoseGraph3D(
                poses=aug_poses,
                pose_mask=jnp.ones(B + G, bool),
                pp_ij=pp_ij_l,
                pp_meas=pp_meas_l,
                pp_info=pp_info_l,
                pp_mask=pp_mask_l,
                fixed=jnp.zeros(B + G, bool),
            )

        def apply_update(poses, dp):
            def one(p, d):
                T = pg._pose7_to_T(p) @ lie.se3_exp(d)
                return pg._T_to_pose7(T)

            return jax.vmap(one)(poses, dp)

        def chi2_of(poses_blk):
            gk = local_graph(gather_aug(poses_blk))
            return jax.lax.psum(pg.linearize_se3(gk).chi2, EDGE_AXIS)

        def step(k, state):
            poses_blk, lam, trace = state
            aug = gather_aug(poses_blk)
            gk = local_graph(aug)
            lin = pg.linearize_se3(gk)
            chi2 = jax.lax.psum(lin.chi2, EDGE_AXIS)
            we = jnp.einsum("kij,kj->ki", lin.w_pp, lin.e_pp)
            NPl = B + G
            gp_aug = jax.ops.segment_sum(
                jnp.einsum("kdi,kd->ki", lin.Ji_pp, we), pp_ij_l[:, 0], NPl
            ) + jax.ops.segment_sum(
                jnp.einsum("kdi,kd->ki", lin.Jj_pp, we), pp_ij_l[:, 1], NPl
            )
            gp = ghost_reduce(gp_aug)
            Hii = jnp.einsum("kdi,kde,kej->kij", lin.Ji_pp, lin.w_pp, lin.Ji_pp)
            Hjj = jnp.einsum("kdi,kde,kej->kij", lin.Jj_pp, lin.w_pp, lin.Jj_pp)
            Dp_aug = jax.ops.segment_sum(Hii, pp_ij_l[:, 0], NPl) + (
                jax.ops.segment_sum(Hjj, pp_ij_l[:, 1], NPl)
            )
            Dp = ghost_reduce(Dp_aug)

            def hvp(v):
                (vp,) = v
                vp = vp * free_p[:, None]
                va = gather_aug(vp)
                vi = va[pp_ij_l[:, 0]]
                vj = va[pp_ij_l[:, 1]]
                Jv = jnp.einsum("kdi,ki->kd", lin.Ji_pp, vi) + jnp.einsum(
                    "kdi,ki->kd", lin.Jj_pp, vj
                )
                WJv = jnp.einsum("kde,ke->kd", lin.w_pp, Jv)
                hp_aug = jax.ops.segment_sum(
                    jnp.einsum("kdi,kd->ki", lin.Ji_pp, WJv), pp_ij_l[:, 0], NPl
                ) + jax.ops.segment_sum(
                    jnp.einsum("kdi,kd->ki", lin.Jj_pp, WJv), pp_ij_l[:, 1], NPl
                )
                hp = ghost_reduce(hp_aug)
                hp = hp + lam * jnp.einsum("kij,kj->ki", Dp, vp)
                hp = hp * free_p[:, None] + (1.0 - free_p)[:, None] * v[0]
                return (hp,)

            eye6 = jnp.eye(6, dtype=dtype)
            Dp_d = (1.0 + lam) * Dp + 1e-6 * eye6
            Dp_d = jnp.where(free_p[:, None, None] > 0, Dp_d, eye6)
            if precond == "spike":
                # distributed chain preconditioner (see docstring)
                ci = jnp.where(pp_chain_l, pp_ij_l[:, 0], B - 1)
                U_chain = jax.ops.segment_sum(
                    jnp.einsum(
                        "kdi,kde,kej->kij", lin.Ji_pp,
                        lin.w_pp * pp_chain_l[:, None, None], lin.Jj_pp,
                    ),
                    ci, B,
                )
                fnext = jnp.concatenate([free_p[1:], jnp.zeros(1, dtype)])
                U_pre = U_chain * (free_p * fnext)[:, None, None]
                L_pre = jnp.concatenate(
                    [jnp.zeros((1, 6, 6), dtype),
                     jnp.swapaxes(U_pre, 1, 2)[:-1]]
                )
                U_bnd = jnp.einsum(
                    "kdi,kde,kej->ij", lin.Ji_pp,
                    lin.w_pp * pp_bnd_l[:, None, None], lin.Jj_pp,
                ) * (free_p[B - 1] * fnext0)
                sf = spike_factor(L_pre, Dp_d, U_pre, U_bnd, EDGE_AXIS,
                                  n_dev)

                def apply_pre(r):
                    return (spike_solve(sf, r[0], EDGE_AXIS),)
            else:
                Dp_inv = jnp.linalg.inv(Dp_d)

                def apply_pre(r):
                    return (jnp.einsum("kij,kj->ki", Dp_inv, r[0]),)

            def tree_dot(a, b):
                return jax.lax.psum(jnp.vdot(a[0], b[0]), EDGE_AXIS)

            b = (-gp * free_p[:, None],)
            (dp_,), cg_k, _ = pcg(hvp, b, apply_pre, max_iters=cg_iters,
                                  rtol=1e-8, tree_dot=tree_dot)
            new_poses = apply_update(poses_blk, dp_ * free_p[:, None])
            new_chi2 = chi2_of(new_poses)
            accept = new_chi2 < chi2
            poses_blk = jnp.where(accept, new_poses, poses_blk)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-10),
                            jnp.minimum(lam * 4.0, 1e8))
            trace = trace.at[k + 1].set(jnp.where(accept, new_chi2, chi2))
            return poses_blk, lam, trace

        trace0 = jnp.zeros(iters + 1, dtype).at[0].set(chi2_of(poses_blk))
        poses_blk, lam, trace = jax.lax.fori_loop(
            0, iters, step,
            (poses_blk, jnp.asarray(lm_lambda0, dtype), trace0),
        )
        return poses_blk[None], trace

    # f32-pinned: bf16 4x4 products explode se3_log's V^-1 (see
    # solvers/pose_graph.optimize_se3)
    with jax.default_matmul_precision("highest"):
        poses_blk, trace = jax.jit(run)(
            jnp.asarray(part.poses_blk),
            jnp.asarray(part.free_p_blk),
            jnp.asarray(free_next0),
            jnp.asarray(part.halo.send_idx),
            jnp.asarray(part.halo.recv_pos),
            jnp.asarray(part.pp_ij), jnp.asarray(part.pp_meas),
            jnp.asarray(part.pp_info), jnp.asarray(part.pp_mask),
            jnp.asarray(part.pp_chain), jnp.asarray(part.pp_bnd),
        )
    NP_full = g.poses.shape[0]
    poses_flat = np.asarray(poses_blk).reshape(-1, 7)[:NP_full]
    if len(poses_flat) < NP_full:
        poses_flat = np.concatenate(
            [poses_flat, np.asarray(g.poses)[len(poses_flat):]], axis=0
        )
    g_out = g.with_poses(jnp.asarray(poses_flat))
    return g_out, trace
