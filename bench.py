"""Benchmark harness. Prints ONE JSON line with the headline metric.

Run on whatever the default JAX platform is (real TPU under the driver).
Headline metric (BASELINE.md): pose-graph LM optimizer throughput on the
largest bundled 2D dataset — LM iterations/second where each LM iteration is
a full relinearize + up-to-100-iteration PCG solve + accept/reject. As the
PWN stack lands, this harness grows aligner frames/s alongside.

``vs_baseline`` compares against the same workload on the host CPU backend
(the reference's execution platform class; the reference itself publishes no
numbers — BASELINE.md).
"""
import json
import os
import sys
import time

import numpy as np

DATA = "/root/reference/datasets/2D"
# Host-CPU control measurement for the same victoriaPark LM workload
# (measured on this container via JAX CPU backend; see bench history).
CPU_BASELINE_LM_ITERS_PER_S = None  # computed live unless --no-cpu-control


def _load_graph():
    from g2o_frontend_tpu.graph.store import graph2d_from_log
    from g2o_frontend_tpu.io.g2o import read_g2o

    path = os.path.join(DATA, "victoriaPark-full.g2o.gz")
    log = read_g2o(path)
    g, _ = graph2d_from_log(log)
    return g


def bench_pose_graph(device=None):
    import jax

    from g2o_frontend_tpu.solvers.pose_graph import optimize_se2

    g = _load_graph()
    if device is not None:
        g = jax.device_put(g, device)
    ITERS = 10

    def run():
        g_out, stats = optimize_se2(g, iters=ITERS, cg_iters=100)
        # np.asarray forces device->host sync (block_until_ready is not
        # reliable on the tunneled axon platform)
        return np.asarray(g_out.poses), stats

    run()  # warmup/compile
    t0 = time.perf_counter()
    n_rep = 3
    for _ in range(n_rep):
        poses, stats = run()
    dt = (time.perf_counter() - t0) / n_rep
    chi2 = np.asarray(stats.chi2)
    return {
        "lm_iters_per_s": ITERS / dt,
        "wall_s_per_opt": dt,
        "chi2_first": float(chi2[0]),
        "chi2_last": float(chi2[-1]),
    }


def main():
    import jax

    plat = jax.devices()[0].platform
    res = bench_pose_graph()

    vs = 1.0
    if "--no-cpu-control" not in sys.argv:
        try:
            cpu_dev = jax.local_devices(backend="cpu")[0]
            cpu = bench_pose_graph(device=cpu_dev)
            vs = res["lm_iters_per_s"] / cpu["lm_iters_per_s"]
        except Exception:
            vs = 1.0

    out = {
        "metric": "pose_graph_lm_iters_per_s_victoriaPark",
        "value": round(res["lm_iters_per_s"], 3),
        "unit": "LM iters/s (6969 poses, 6968 edges, 100 CG/iter)",
        "vs_baseline": round(vs, 3),
        "platform": plat,
        "chi2_first": res["chi2_first"],
        "chi2_last": res["chi2_last"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
