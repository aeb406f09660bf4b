#!/usr/bin/env python
"""Sweep map geometry (voxel size, bucket, neighborhood) on the attached TPU.

Each variant runs the bench workload; prints one line per variant with
throughput + ATE so the Pareto point can be promoted into bench.py.
"""

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(sys.path[0], "bench.py"))
bench = importlib.util.module_from_spec(spec)
sys.modules["bench"] = bench
spec.loader.exec_module(bench)

import jax
import numpy as np

from fast_limo_tpu.io import synthetic
from fast_limo_tpu.models.localizer import Localizer


def run_variant(neigh, vox, ppv):
    cfg = bench.kitti_like_cfg()
    cfg.tpu.knn_neighborhood = neigh
    cfg.tpu.map_voxel_size = vox
    cfg.tpu.map_points_per_voxel = ppv

    n_warm, n_meas = 6, 30
    n_scans = n_warm + n_meas
    seq = synthetic.SyntheticSequence(
        seed=7, n_scans=n_scans, points_per_scan=32768,
        noise_pt=0.01, noise_gyro=5e-4, noise_acc=5e-3,
        traj=synthetic.Trajectory(v_forward=15.0, yaw_amp=0.5))
    loc = Localizer(cfg)
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(n_scans)]

    si = 0
    t0 = None
    for k in range(len(stamps)):
        loc.update_imu(stamps[k], acc[k], gyro[k])
        while si < n_scans and scans[si][0] <= stamps[k]:
            st_, pts, traw = scans[si]
            if si == n_warm:
                jax.block_until_ready(loc.state)
                t0 = time.perf_counter()
            loc.update_pointcloud(pts, traw, st_)
            si += 1
    jax.block_until_ready(loc.state)
    elapsed = time.perf_counter() - t0
    est = loc.positions()
    gt = seq.traj.pos(loc.stamps())
    ate = synthetic.ate_rmse(est, gt)
    print(json.dumps({"neigh": neigh, "vox": vox, "ppv": ppv,
                      "scans_per_s": round(n_meas / elapsed, 2),
                      "ate_m": round(float(ate), 4)}), flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 4:  # single variant: neigh vox ppv
        run_variant(int(sys.argv[1]), float(sys.argv[2]), int(sys.argv[3]))
    else:
        for v in [(8, 1.0, 5), (8, 1.2, 6), (8, 1.6, 8), (27, 1.2, 6)]:
            run_variant(*v)
