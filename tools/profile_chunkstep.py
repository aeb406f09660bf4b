#!/usr/bin/env python
"""Device-only cost of the chunked scan step (bench config, C scans/call)."""

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

from fast_limo_tpu.models import pipeline as pl

R = 8


def main():
    cfg = bench.kitti_like_cfg()
    C = cfg.tpu.scan_chunk
    N = cfg.tpu.max_points_per_scan
    K = cfg.tpu.imu_batch
    step = pl.build_scan_chunk_step(cfg, donate=False)
    state = pl.init_state(cfg)

    rng = np.random.default_rng(0)
    sdtype = np.int16 if cfg.tpu.quantize_transfer > 0 else np.float32
    scan_packs = jnp.asarray(
        rng.integers(-5000, 5000, (C, N, 4)).astype(sdtype))
    imu_packs = np.zeros((C, K, 8), np.float32)
    imu_packs[:, :, 6] = np.linspace(0, 0.1, K)[None, :]
    imu_packs[:, 0, 7] = N
    imu_packs[:, 1, 7] = K
    imu_packs[:, 2, 7] = 0.1
    imu_packs[:, 3, 7] = 1e-5
    imu_packs[:, 4, 7] = 1.0
    imu_packs = jnp.asarray(imu_packs)

    s, out = step(state, scan_packs, imu_packs)
    jax.block_until_ready(s)
    ts = []
    for _ in range(R):
        t0 = time.perf_counter()
        s, out = step(s, scan_packs, imu_packs)
        jax.block_until_ready(s)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"chunk step (C={C}, device+1 dispatch): {med:.2f} ms/call = "
          f"{med / C:.2f} ms/scan;  all: {[round(t*1e3,1) for t in ts]}")


if __name__ == "__main__":
    main()
