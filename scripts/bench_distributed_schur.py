"""Distributed Schur/chain/Woodbury accuracy + comm table (EVAL §7).

Runs parallel/partitioned_schur.py on victoriaPark-full at D=2/4/8 on the
virtual CPU mesh and records chi2 vs the float64 control, per-matvec halo
bytes, and the replicated psum payload. Writes eval_out/distributed_schur.json.

Run on a quiet host: python scripts/bench_distributed_schur.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

DATA = "/root/reference/datasets/2D"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "eval_out")


def main():
    from g2o_frontend_tpu.graph.store import graph2d_from_log
    from g2o_frontend_tpu.io.g2o import read_g2o
    from g2o_frontend_tpu.parallel.mesh import make_mesh
    from g2o_frontend_tpu.parallel.partitioned_schur import (
        optimize_se2_schur_partitioned)

    ctl_path = os.path.join(OUT, "control_victoria.json")
    control = json.load(open(ctl_path))["chi2_control"]
    g, _ = graph2d_from_log(
        read_g2o(os.path.join(DATA, "victoriaPark-full.g2o.gz"))
    )
    rows = []
    for nd in (2, 4, 8):
        mesh = make_mesh(nd)
        t0 = time.perf_counter()
        g_o, tr, st = optimize_se2_schur_partitioned(
            g, mesh, iters=60, cg_iters=100
        )
        wall = time.perf_counter() - t0
        chi2 = float(np.asarray(tr)[-1])
        rows.append({
            "devices": nd,
            "chi2": round(chi2, 1),
            "chi2_vs_control": round(chi2 / control, 4),
            "lm_iters": st["lm_iters"],
            "cg_total": st["cg_total"],
            "halo_bytes_per_matvec": st["comm"]["bytes_per_matvec"],
            "replicated_psum_floats_per_cg_iter":
                st["replicated_psum_floats_per_cg_iter"],
            "wall_s": round(wall, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
        assert chi2 <= 1.01 * control, (chi2, control)
    # replicated-arrow probe at NL ~ 600 (VERDICT r4 Next 4 / Missing 4):
    # world-1000's reference output graph (589 landmarks, 108k obs edges)
    # is the landmark-richest bundled graph — measure the Woodbury arrow
    # there instead of arguing about it. The (2NL)^2 replicated K is
    # 5.5 MB; the guard in partitioned_schur caps the regime at NL=4096.
    from g2o_frontend_tpu.solvers.control import control_optimize_se2

    g_w, _ = graph2d_from_log(read_g2o(os.path.join(
        DATA, "world-1000-dense-highnoise_default.g2o.gz")))
    ctl_w = control_optimize_se2(g_w, max_iters=60)
    mesh = make_mesh(8)
    t0 = time.perf_counter()
    _go, tr_w, st_w = optimize_se2_schur_partitioned(
        g_w, mesh, iters=40, cg_iters=100)
    wall_w = time.perf_counter() - t0
    chi2_w = float(np.asarray(tr_w)[-1])
    arrow = {
        "dataset": "world-1000-dense-highnoise_default",
        "landmarks": int(np.asarray(g_w.landmark_mask).sum()),
        "devices": 8,
        "chi2": round(chi2_w, 1),
        "chi2_control": round(float(ctl_w["chi2"]), 1),
        "chi2_vs_control": round(chi2_w / float(ctl_w["chi2"]), 4),
        "replicated_psum_floats_per_cg_iter":
            st_w["replicated_psum_floats_per_cg_iter"],
        "wall_s": round(wall_w, 1),
    }
    print(json.dumps(arrow), flush=True)
    assert chi2_w <= 1.01 * float(ctl_w["chi2"]), arrow
    with open(os.path.join(OUT, "distributed_schur.json"), "w") as fh:
        json.dump({"control": control, "rows": rows,
                   "arrow_probe_nl600": arrow,
                   "note": "virtual CPU mesh; wall is host-bound "
                           "(2 cores), accuracy/comm are the claims"}, fh)


if __name__ == "__main__":
    main()
