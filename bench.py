"""Benchmark harness. Prints ONE JSON line with the headline metric.

Headline: PWN dense aligner frames/s at the reference's compute envelope —
640x480 depth, 10 outer x 1 inner iterations (``pwn_core/aligner.cpp:19-20``,
BASELINE.md "Aligner compute envelope"). Also reports the depth->cloud
converter throughput and the pose-graph LM throughput on victoriaPark.

``vs_baseline`` compares aligner frames/s against the same workload on the
host CPU backend (the reference's platform class; the reference publishes no
numbers — BASELINE.md).

NOTE: on the tunneled axon TPU platform ``block_until_ready`` does not
synchronize; all timings force ``np.asarray`` transfers.
"""
import json
import os
import sys
import time

import numpy as np

DATA = "/root/reference/datasets/2D"

# Persistent XLA compilation cache: repeat bench invocations skip the
# multi-minute tunnel compiles.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _make_depth_pair(H=480, W=640):
    """Synthetic room-corner depth pair with a known small motion."""
    import jax.numpy as jnp

    from g2o_frontend_tpu.utils import lie

    planes = [
        (np.array([0.0, 0.0, -1.0]), -2.5),
        (np.array([-1.0, 0.0, 0.0]), -1.2),
        (np.array([0.0, -1.0, 0.0]), -0.9),
    ]
    fx = fy = 525.0 * (W / 640.0)
    cx, cy = W / 2 - 0.5, H / 2 - 0.5

    def render(T_wc):
        vs, us = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        dirs = np.stack([(us - cx) / fx, (vs - cy) / fy, np.ones_like(us, float)], -1)
        R, t = T_wc[:3, :3], T_wc[:3, 3]
        dirs_w = dirs @ R.T
        depth = np.full((H, W), np.inf)
        for n, d in planes:
            denom = dirs_w @ n
            z = np.where(np.abs(denom) > 1e-9, (d - t @ n) / denom, np.inf)
            depth = np.minimum(depth, np.where(z > 0.05, z, np.inf))
        depth[~np.isfinite(depth)] = 0.0
        return jnp.asarray(depth, jnp.float32)

    xi = np.array([0.04, -0.02, 0.05, 0.01, 0.03, -0.02], np.float32)
    T_gt = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    from g2o_frontend_tpu.pwn.projector import PinholeProjector

    proj = PinholeProjector(rows=H, cols=W, fx=fx, fy=fy, cx=cx, cy=cy,
                            min_distance=0.1, max_distance=10.0)
    return render(np.eye(4)), render(T_gt), proj, T_gt


def bench_pwn_aligner(device=None, H=480, W=640, reps=5):
    import jax

    from g2o_frontend_tpu.pwn.aligner import AlignerConfig, align
    from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud

    d_ref, d_cur, proj, T_gt = _make_depth_pair(H, W)
    if device is not None:
        d_ref = jax.device_put(d_ref, device)
        d_cur = jax.device_put(d_cur, device)
    if H >= 240:
        ccfg = ConverterConfig()
    else:  # reference scale-4 stats radii (conf pwn_slam_catacombs_gui.conf)
        ccfg = ConverterConfig(min_image_radius=3, max_image_radius=8, min_points=12)
    acfg = AlignerConfig(outer_iterations=10, inner_iterations=1)

    import jax.numpy as jnp

    ref = depth_to_cloud(d_ref, proj, ccfg)
    cur = depth_to_cloud(d_cur, proj, ccfg)
    res = align(ref, cur, proj, config=acfg)
    np.asarray(res.T)  # sync after compile

    # On-device chained loops: each align warm-starts from the previous
    # estimate (the tracker's steady-state pattern), each convert depends on
    # the previous cloud. Two-point timing (n_hi - n_lo) cancels the
    # tunnel's per-dispatch latency, leaving pure device throughput.
    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def align_chain(ref, cur, n):
        # consume the statistics outputs too (omega/chi2/validity are
        # per-frame production work; without this XLA would DCE them)
        def body(i, T_guess):
            r = align(ref, cur, proj, initial_guess=T_guess, config=acfg)
            stats = (
                jnp.sum(r.omega) + r.chi2 + r.inliers
                + r.translational_ratio + r.rotational_ratio + jnp.sum(r.mean)
            )
            return r.T + (1e-30 * stats).astype(r.T.dtype)

        return jax.lax.fori_loop(0, n, body, jnp.eye(4, dtype=ref.p.dtype))

    @partial(jax.jit, static_argnames=("n",))
    def convert_chain(depth, n):
        # 1e-30*carry: numerically nil but a true loop-carried dependence,
        # so XLA cannot hoist the convert out of the loop (0.0*carry folds).
        # consume a reduction over EVERY field — consuming one element would
        # let XLA dead-code-eliminate the pipeline down to a single pixel
        def body(i, carry):
            c = depth_to_cloud(depth + 1e-30 * carry, proj, ccfg)
            return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(c))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def two_point(chain_fn, *args, lo=2, hi=2 + 4 * reps, tries=3):
        np.asarray(chain_fn(*args, n=lo))
        np.asarray(chain_fn(*args, n=hi))
        deltas = []
        for _ in range(tries):
            t0 = time.perf_counter()
            np.asarray(chain_fn(*args, n=lo))
            t1 = time.perf_counter()
            np.asarray(chain_fn(*args, n=hi))
            t2 = time.perf_counter()
            deltas.append(((t2 - t1) - (t1 - t0)) / (hi - lo))
        return float(np.median(deltas))

    dt_align = two_point(align_chain, ref, cur)
    # convert is fast; a wide spread lifts the delta above dispatch jitter
    dt_conv = two_point(convert_chain, d_cur, lo=5, hi=5 + 24 * reps)
    res = align(ref, cur, proj, config=acfg)

    T_est = np.asarray(res.T)
    err = np.linalg.inv(T_gt) @ T_est
    t_err = float(np.linalg.norm(err[:3, 3]))
    return {
        "align_fps": 1.0 / dt_align,
        "convert_fps": 1.0 / dt_conv,
        "t_err_m": t_err,
        "inliers": int(res.inliers),
    }


def bench_tracker(H=480, W=640, lo=6, hi=26):
    """End-to-end odometry frames/s: depth->cloud + 10-outer align +
    keyframe policy per frame, as one on-device scan (odometry_scan).
    Two scan lengths cancel dispatch + the first frame's conversion."""
    import jax
    import jax.numpy as jnp

    from g2o_frontend_tpu.slam.pwn_tracker import odometry_scan
    from g2o_frontend_tpu.pwn.converter import ConverterConfig
    from g2o_frontend_tpu.pwn.aligner import AlignerConfig

    d_ref, d_cur, proj, _ = _make_depth_pair(H, W)
    ccfg = ConverterConfig()
    acfg = AlignerConfig(outer_iterations=10)
    rng = np.random.default_rng(0)

    def seq(n):
        # alternate with slight scaling so every frame differs
        frames = [
            np.asarray(d_ref) * (1.0 + 0.002 * (k % 5)) for k in range(n)
        ]
        return jnp.asarray(np.stack(frames), jnp.float32)

    def run(depths):
        traj, m = odometry_scan(depths, proj, ccfg, acfg)
        np.asarray(traj)

    s_lo, s_hi = seq(lo), seq(hi)
    run(s_lo)
    run(s_hi)
    t0 = time.perf_counter()
    run(s_lo)
    t1 = time.perf_counter()
    run(s_hi)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (hi - lo)
    return {"tracker_fps": 1.0 / dt}


def bench_pose_graph(device=None):
    import os

    import jax

    from g2o_frontend_tpu.graph.store import graph2d_from_log
    from g2o_frontend_tpu.io.g2o import read_g2o
    from g2o_frontend_tpu.solvers.pose_graph import optimize_se2

    log = read_g2o(os.path.join(DATA, "victoriaPark-full.g2o.gz"))
    g, _ = graph2d_from_log(log)
    if device is not None:
        g = jax.device_put(g, device)
    ITERS, CG = 30, 300  # convergence-quality setting (chi2 8.4e7 -> ~1e5)

    def run():
        g_out, stats = optimize_se2(g, iters=ITERS, cg_iters=CG)
        return np.asarray(g_out.poses), stats

    run()
    t0 = time.perf_counter()
    for _ in range(3):
        poses, stats = run()
    dt = (time.perf_counter() - t0) / 3
    chi2 = np.asarray(stats.chi2)
    return {
        "lm_iters_per_s": ITERS / dt,
        "chi2_final": float(chi2[-1]),
    }


def main():
    import jax

    plat = jax.devices()[0].platform
    pwn = bench_pwn_aligner()
    pwn4 = bench_pwn_aligner(H=120, W=160, reps=10)  # ref tracker scale=4
    trk = bench_tracker()
    pgo = bench_pose_graph()

    vs = 1.0
    if "--no-cpu-control" not in sys.argv:
        try:
            cpu_dev = jax.local_devices(backend="cpu")[0]
            pwn_cpu = bench_pwn_aligner(device=cpu_dev, reps=2)
            vs = pwn["align_fps"] / pwn_cpu["align_fps"]
        except Exception:
            vs = 1.0

    out = {
        "metric": "pwn_align_fps_640x480_10outer",
        "value": round(pwn["align_fps"], 3),
        "unit": "aligner frames/s (640x480, 10 outer x 1 inner, ref envelope)",
        "vs_baseline": round(vs, 3),
        "platform": plat,
        "align_fps_scale4": round(pwn4["align_fps"], 3),
        "convert_fps": round(pwn["convert_fps"], 3),
        "tracker_fps_e2e": round(trk["tracker_fps"], 3),
        "align_t_err_m": round(pwn["t_err_m"], 5),
        "align_inliers": pwn["inliers"],
        "pose_graph_lm_iters_per_s": round(pgo["lm_iters_per_s"], 3),
        "pose_graph_chi2_final": round(pgo["chi2_final"], 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
