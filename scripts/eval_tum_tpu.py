"""TUM odometry protocol ON THE TPU (VERDICT r3 Next 5).

EVAL §4's 189 ms/frame was CPU-only while the bare aligner does 300+ fps
on-chip; the host decode/transfer boundary had never been measured. This
sidecar runs the same pwn_odometry CLI (PNG decode -> convert -> align ->
emit, ``pwn_odometry.cpp:27-46``) on the tunneled chip and records the
HONEST end-to-end number (decode + H2D + align per frame) next to the
in-tracker frame time. Writes eval_out/tum_tpu.json for EVAL §4.

Run on a quiet host (tunnel handshake starves under CPU load):
    python scripts/eval_tum_tpu.py
"""
import contextlib
import io
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "")

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "eval_out")


def run_cli(seq, scale, scan=False):
    from g2o_frontend_tpu.apps.pwn_odometry import main as odo_main

    args = [seq, "--out", os.path.join(OUT, "tum_traj_tpu.txt"),
            "--scale", str(scale), "--sensor", "kinect",
            "--kf-fraction", "0.75",
            "--benchmark-out", os.path.join(OUT, "tum_benchmark_tpu.txt")]
    if scan:
        args.append("--scan")
    buf = io.StringIO()
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(buf):
        odo_main(args)
    wall = time.perf_counter() - t0
    res = json.loads(buf.getvalue().strip().splitlines()[-1])
    return res, wall


def main():
    plat = jax.devices()[0].platform
    print("platform:", plat, flush=True)
    seq = os.path.join(OUT, "tum_seq")
    if not os.path.isfile(os.path.join(seq, "depth.txt")):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from make_tum_sequence import main as make_seq

        make_seq([seq, "--frames", "120"])

    # cold run (compiles), then the steady-state run we report
    res_cold, wall_cold = run_cli(seq, scale=2)
    res, wall = run_cli(seq, scale=2)
    # whole-sequence on-device scan mode: the TPU-native fix for the
    # per-frame dispatch latency (one lax.scan program, one H2D transfer)
    run_cli(seq, scale=2, scan=True)
    res_scan, wall_scan = run_cli(seq, scale=2, scan=True)
    out = {
        "platform": plat,
        "frames": res["frames"],
        "keyframes": res["keyframes"],
        "ate_rmse_m": res.get("ate", {}).get("rmse"),
        # in-tracker frame time (process_frame only, decode excluded)
        "frame_ms_tracker": round(res["mean_frame_time_s"] * 1e3, 2),
        # HONEST e2e: total warm wall / frames — includes PNG decode,
        # host->device transfer, trajectory + benchmark emission
        "frame_ms_e2e": round(wall / res["frames"] * 1e3, 2),
        "fps_e2e": round(res["frames"] / wall, 2),
        "wall_cold_s": round(wall_cold, 1),
        "wall_warm_s": round(wall, 1),
        # scan mode (PNG decode + ONE transfer + on-device keyframe loop)
        "fps_e2e_scan": round(res_scan["frames"] / wall_scan, 2),
        "frame_ms_e2e_scan": round(wall_scan / res_scan["frames"] * 1e3, 2),
        "ate_rmse_m_scan": res_scan.get("ate", {}).get("rmse"),
        "benchmark_file": "eval_out/tum_benchmark_tpu.txt",
    }

    # e2e BREAKDOWN (VERDICT r4 Next 5): where does the scan-mode wall
    # live? Measured floors: host PNG decode, H2D transfer of the raw
    # uint16 batch (half the f32 bytes; converted on device), on-chip
    # execution. On the tunneled chip the wire dominates — the breakdown
    # makes that claim measured rather than argued.
    import numpy as np

    from g2o_frontend_tpu.io import tum as _tum

    index = _tum.read_depth_index(seq)
    t0 = time.perf_counter()
    raw = [
        _tum.load_depth_png_raw(os.path.join(seq, rel))[::2, ::2]
        for _ts, rel in index
    ]
    batch = np.stack(raw)
    t_decode = time.perf_counter() - t0
    import jax.numpy as jnp

    t0 = time.perf_counter()
    dev = jax.device_put(jnp.asarray(batch))
    np.asarray(dev[0, 0, 0])
    t_h2d = time.perf_counter() - t0
    out["breakdown"] = {
        "decode_ms_per_frame": round(t_decode / len(raw) * 1e3, 2),
        "h2d_mb": round(batch.nbytes / 1e6, 1),
        "h2d_s": round(t_h2d, 2),
        "h2d_ms_per_frame": round(t_h2d / len(raw) * 1e3, 2),
        "onchip_ms_per_frame": round(
            max(wall_scan - t_decode - t_h2d, 0.0) / len(raw) * 1e3, 2
        ),
    }
    with open(os.path.join(OUT, "tum_tpu.json"), "w") as fh:
        json.dump(out, fh)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
