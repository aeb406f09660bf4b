#!/usr/bin/env python
"""Host-side cost breakdown of one streaming dispatch on the tunneled TPU.

Separates the ~(e2e - device) gap into: numpy packing, host->device
transfer calls (jnp.asarray), and the jitted dispatch call itself —
all measured WITHOUT syncing, i.e. the time the host thread is busy/blocked
per scan while the device pipeline runs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(sys.path[0], "bench.py"))
bench = importlib.util.module_from_spec(spec)
sys.modules["bench"] = bench
spec.loader.exec_module(bench)

from fast_limo_tpu.io import synthetic
from fast_limo_tpu.models.localizer import Localizer


def main():
    cfg = bench.kitti_like_cfg()
    n_scans = 80
    seq = synthetic.SyntheticSequence(
        seed=7, n_scans=n_scans, points_per_scan=32768,
        noise_pt=0.01, noise_gyro=5e-4, noise_acc=5e-3,
        traj=synthetic.Trajectory(v_forward=15.0, yaw_amp=0.5))
    loc = Localizer(cfg)

    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(n_scans)]

    # instrument: wrap scan_step and jnp.asarray paths by timing _dispatch
    t_pack = []
    t_transfer = []
    t_call = []
    t_imu = []
    orig_dispatch = loc._dispatch

    from fast_limo_tpu.models import pipeline as pl

    def timed_dispatch(scan):
        # the CURRENT production dispatch (_pack_scan + fuse_packs + one
        # fused transfer + the jitted call), phase-timed
        t0 = time.perf_counter()
        if loc.state is None:
            loc._init_device_state(scan.stamp)
        scan_pack, imu_pack = loc._pack_scan(scan)
        fused = pl.fuse_packs(scan_pack, imu_pack)
        t1 = time.perf_counter()
        d = jnp.asarray(fused)
        t2 = time.perf_counter()
        loc.state, out = loc.scan_step(loc.state, d)
        t3 = time.perf_counter()
        loc.last_output = out
        loc._raw_outputs.append((loc.epoch, out))
        t_pack.append(t1 - t0)
        t_transfer.append(t2 - t1)
        t_call.append(t3 - t2)

    loc._dispatch = timed_dispatch

    si = 0
    imu_t0 = time.perf_counter()
    for k in range(len(stamps)):
        t0 = time.perf_counter()
        loc.update_imu(stamps[k], acc[k], gyro[k])
        t_imu.append(time.perf_counter() - t0)
        while si < n_scans and scans[si][0] <= stamps[k]:
            st_, pts, traw = scans[si]
            loc.update_pointcloud(pts, traw, st_)
            si += 1
    jax.block_until_ready(loc.state)
    total = time.perf_counter() - imu_t0

    warm = 10
    def stat(name, xs, per_scan=True):
        a = np.asarray(xs[warm:]) * 1e3
        print(f"{name:12s}: med {np.median(a):7.3f} ms  mean {np.mean(a):7.3f}"
              f"  p90 {np.percentile(a, 90):7.3f}")

    stat("pack", t_pack)
    stat("transfer", t_transfer)
    stat("call", t_call)
    a = np.asarray(t_imu) * 1e3
    n_per_scan = len(t_imu) / max(len(t_pack), 1)
    print(f"imu_update  : med {np.median(a):7.3f} ms ×{n_per_scan:.0f}/scan"
          f" = {np.median(a) * n_per_scan:7.3f} ms/scan")
    print(f"e2e         : {total / si * 1e3:7.2f} ms/scan over {si} scans")


if __name__ == "__main__":
    main()
