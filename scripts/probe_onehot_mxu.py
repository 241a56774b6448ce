"""One-shot measurement: MXU one-hot gather vs the banded lane-gather sweep.

EVAL §6 claimed analytically that reformulating the fused aligner's
reference-window association as one-hot matmuls on the MXU "trades 5x more
FLOPs for the shuffles and loses at this window size". VERDICT r3 Next 9
asks for ONE measurement to close the thread.

The one-hot formulation at the production tile config (TR=16, TC=128, DMA
window BR=32 x BC=256 -> K=8192 window cells, P=2048 pixels/tile, 150 tiles
at 480x640): each pixel's (row, col) window target becomes a one-hot row of
a (P, K) bf16 matrix; association = OH @ win. Costs per association pass:
  - build: 150 * P * K = 2.5e9 bf16 compares (VPU),
  - matmul: 150 * P * K * C * 2 = 15.1 GFLOP bf16 (MXU) for C=3 channels,
vs the production sweep whose ENTIRE fused iteration (association + H/b
accumulation + reduction) is ~284 us. Both phases are timed separately
(matmul-only uses a precomputed OH) so the conclusion does not hinge on
the compare cost.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "")

T_TILES, P, K, C = 150, 16 * 128, 32 * 256, 3
BATCH = 10


def main():
    dev = jax.devices()[0]
    print("platform:", dev.platform)
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.normal(0, 1, (T_TILES, K, C)), jnp.bfloat16)
    kidx = jnp.asarray(rng.integers(0, K, (T_TILES, P)), jnp.int32)

    @jax.jit
    def assoc_build_and_matmul(win, kidx):
        def tile(args):
            w, k = args
            oh = (k[:, None] == jnp.arange(K, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
            return jnp.dot(oh, w, preferred_element_type=jnp.float32)

        return jax.lax.map(tile, (win, kidx), batch_size=BATCH)

    # precomputed OH: matmul-only cost (memory forbids materializing all
    # 150 OH tiles at bf16=2.5 GB -> time a BATCH and scale)
    oh_b = jnp.asarray(
        rng.integers(0, 2, (BATCH, P, K)), jnp.bfloat16
    )
    win_b = win[:BATCH]

    @jax.jit
    def matmul_only(oh, w):
        return jnp.einsum("tpk,tkc->tpc", oh, w,
                          preferred_element_type=jnp.float32)

    def timed(fn, *a, reps=5):
        np.asarray(fn(*a))  # compile + sync
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_full = timed(assoc_build_and_matmul, win, kidx)
    t_mm_b = timed(matmul_only, oh_b, win_b)
    t_mm = t_mm_b * (T_TILES / BATCH)
    flops = T_TILES * P * K * C * 2
    print(f"one-hot build+matmul association pass: {t_full*1e6:.0f} us")
    print(f"one-hot matmul-only (scaled from {BATCH} tiles): "
          f"{t_mm*1e6:.0f} us  ({flops/t_mm/1e12:.1f} TFLOP/s effective)")
    print("production fused iteration (association+H/b+reduce), r3 "
          "measured: ~284 us; banded-sweep ceiling claim: ~250 us")
    print(f"verdict: one-hot association alone is "
          f"{t_full/284e-6:.1f}x the WHOLE fused iteration")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "eval_out")
    with open(os.path.join(out_dir, "onehot_mxu.json"), "w") as fh:
        json.dump({
            "platform": dev.platform,
            "onehot_full_us": round(t_full * 1e6),
            "onehot_matmul_only_us": round(t_mm * 1e6),
            "matmul_tflops_effective": round(flops / t_mm / 1e12, 2),
            "fused_iteration_us_r3": 284,
            "ratio_vs_fused_iteration": round(t_full / 284e-6, 1),
            "tiles": T_TILES, "pixels_per_tile": P, "window_cells": K,
            "channels": C,
        }, fh)


if __name__ == "__main__":
    main()
