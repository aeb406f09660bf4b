#!/usr/bin/env python
"""Short C=1 streaming throughput probe (bench.py's measure, fewer epochs).

Run: tools/tpu_run.sh 2400 python tools/probe_throughput.py [n_epochs]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import importlib.util

import numpy as np

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(sys.path[0], "bench.py"))
bench = importlib.util.module_from_spec(spec)
sys.modules["bench"] = bench
spec.loader.exec_module(bench)

from fast_limo_tpu.io import synthetic


def main():
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_warm, epoch_len = 8, 32
    n_scans = n_warm + n_epochs * epoch_len
    seq = synthetic.SyntheticSequence(
        seed=7, n_scans=n_scans, points_per_scan=32768,
        noise_pt=0.01, noise_gyro=5e-4, noise_acc=5e-3,
        traj=synthetic.Trajectory(v_forward=15.0, yaw_amp=0.5))
    cfg = bench.kitti_like_cfg()
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(n_scans)]
    sps, epoch_times, loc = bench._measure_stream(
        cfg, stamps, acc, gyro, scans, n_warm, epoch_len)
    est = loc.positions()
    gt = seq.traj.pos(loc.stamps())
    ate = synthetic.ate_rmse(est, gt)
    print(f"epochs scans/s: {[round(epoch_len / t, 1) for t in epoch_times]}")
    print(f"best: {sps:.1f} scans/s  ate: {ate:.3f} m")


if __name__ == "__main__":
    main()
