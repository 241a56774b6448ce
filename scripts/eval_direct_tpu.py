"""Dense exact-Newton solve of a bundled graph on the TPU MXU.

The CPU eval backend caps the dense-direct path at 8k DOF;
victoriaPark-full (21k DOF, ~1.7 GB dense Hessian) is an MXU workload.
This runner produces the sidecar eval_out/direct_<dataset>.json that
scripts/evaluate.py folds into the EVAL.md pose-graph table.

Run (on the TPU host):  python scripts/eval_direct_tpu.py [dataset ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/datasets/2D"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "eval_out")


def main(argv=None):
    datasets = (argv or sys.argv[1:]) or ["victoriaPark-full.g2o.gz"]
    import jax

    from g2o_frontend_tpu.graph.store import graph2d_from_log
    from g2o_frontend_tpu.io.g2o import read_g2o
    from g2o_frontend_tpu.solvers import pose_graph as pg

    os.makedirs(OUT, exist_ok=True)
    for name in datasets:
        log = read_g2o(os.path.join(DATA, name))
        g, _ = graph2d_from_log(log)
        t0 = time.perf_counter()
        _, st = pg.optimize_se2_direct(g, iters=40)
        chi2 = float(np.asarray(st.chi2)[-1])
        wall = round(time.perf_counter() - t0, 1)
        out = {
            "dataset": name,
            "chi2_direct": chi2,
            "iters": 40,
            "wall_s": wall,
            "platform": jax.default_backend(),
        }
        with open(os.path.join(OUT, f"direct_{name}.json"), "w") as fh:
            json.dump(out, fh)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
