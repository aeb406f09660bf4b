"""ATE probe for on-device kernel bisection.

Usage:  python tools/ate_probe.py [<disabled-kernels>] [<knobs>]

    <disabled-kernels>: value for FAST_LIMO_NO_PALLAS ("" none, "all",
                        or comma list of gain,update_body,hstats,knn)
    <knobs>: "exact" → knn_refresh=always + 27-neighborhood + no quantize
             (reference-exact semantics), default = bench fast knobs

Runs a short bench-shaped synthetic stream and prints one JSON line with
the ATE + throughput.  Run ONE at a time on the TPU (tools/tpu_run.sh).
"""

import json
import os
import sys

disabled = sys.argv[1] if len(sys.argv) > 1 else ""
knobs = sys.argv[2] if len(sys.argv) > 2 else "fast"
if disabled:
    os.environ["FAST_LIMO_NO_PALLAS"] = disabled
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import time

import jax
import numpy as np

from fast_limo_tpu.io import synthetic
from fast_limo_tpu.models.localizer import Localizer

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
from bench import kitti_like_cfg  # noqa: E402


def main():
    n_scans = 48
    cfg = kitti_like_cfg()
    if knobs == "exact":
        cfg.tpu.knn_refresh = "always"
        cfg.tpu.knn_neighborhood = 27
        cfg.tpu.quantize_transfer = 0.0
    seq = synthetic.SyntheticSequence(
        seed=7, n_scans=n_scans, points_per_scan=32768,
        noise_pt=0.01, noise_gyro=5e-4, noise_acc=5e-3,
        traj=synthetic.Trajectory(v_forward=15.0, yaw_amp=0.5))
    loc = Localizer(cfg)
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(n_scans)]
    si = 0
    t0 = time.perf_counter()
    for k in range(len(stamps)):
        loc.update_imu(stamps[k], acc[k], gyro[k])
        while si < n_scans and scans[si][0] <= stamps[k]:
            st_, pts, traw = scans[si]
            loc.update_pointcloud(pts, traw, st_)
            si += 1
    jax.block_until_ready(loc.state)
    wall = time.perf_counter() - t0

    est = loc.positions()
    gt = seq.traj.pos(loc.stamps())
    err = np.linalg.norm(est - gt, axis=1)
    ate = synthetic.ate_rmse(est, gt)
    print(json.dumps({
        "disabled": disabled or "none", "knobs": knobs,
        "ate_m": round(float(ate), 4),
        "final_err_m": round(float(err[-1]), 4),
        "max_err_m": round(float(err.max()), 4),
        "scans_per_s": round(n_scans / wall, 1),
        "device": str(jax.devices()[0]),
    }), flush=True)


if __name__ == "__main__":
    main()
