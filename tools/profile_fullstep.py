#!/usr/bin/env python
"""Device-only cost of the FULL fused scan step (bench config), measured by
looping the step R times inside one jit with the state carried through.

Separates device compute from host/dispatch/tunnel overhead:
    e2e ms/scan (bench.py)  =  device ms/step (this)  +  host overhead.
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

from fast_limo_tpu.models import pipeline as pl

R = 20


def main():
    cfg = bench.kitti_like_cfg()
    step = pl.build_scan_step(cfg, donate=False, jit=False)
    state = pl.init_state(cfg)

    rng = np.random.default_rng(0)
    N = cfg.tpu.max_points_per_scan
    K = cfg.tpu.imu_batch
    batch = pl.ScanBatch(
        points=jnp.asarray(rng.uniform(-40, 40, (N, 3)), jnp.float32),
        t_raw=jnp.asarray(np.linspace(0, 0.1, N), jnp.float32),
        valid=jnp.ones(N, bool),
        stamp=jnp.asarray(0.0, jnp.float32),
        epoch_shift=jnp.asarray(0.1, jnp.float32),
        imu_acc=jnp.asarray(rng.normal(0, 0.05, (K, 3)) + [0, 0, 9.81], jnp.float32),
        imu_gyro=jnp.asarray(rng.normal(0, 0.01, (K, 3)), jnp.float32),
        imu_stamp=jnp.asarray(np.linspace(0.001, 0.105, K), jnp.float32),
        imu_valid=jnp.ones(K, bool),
    )

    @jax.jit
    def run(state, batch):
        def body(c, _):
            s2, out = step(c, batch._replace(
                stamp=batch.stamp + out_shift(c)))
            return s2, out.pos

        def out_shift(c):
            return jnp.float32(0.0)

        s, poss = jax.lax.scan(body, state, None, length=R)
        return s, poss

    # in-process null: the tunnel is bimodal per process (~0.1 ms vs ~23 ms
    # fixed per-call overhead); subtracting an R-iteration null loop that
    # references a closure array removes the per-call share either way
    dummy = jnp.asarray(np.arange(32), jnp.float32)

    @jax.jit
    def run_null(c0):
        def body(c, _):
            return c + jnp.sum(dummy) * (c + 1.0) * 1e-12, None
        out, _ = jax.lax.scan(body, c0, None, length=R)
        return out

    jax.block_until_ready(run_null(jnp.zeros(())))
    tsn = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(run_null(jnp.zeros(())))
        tsn.append(time.perf_counter() - t0)
    t_null = float(np.median(tsn))
    print(f"null loop                   : {t_null * 1e3 / R:7.2f} ms/iter "
          f"({'FAST regime' if t_null / R < 1e-4 else 'degraded tunnel regime'})")

    s, poss = run(state, batch)
    jax.block_until_ready(poss)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        s2, poss = run(state, batch)
        jax.block_until_ready(poss)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) - t_null
    print(f"full scan step (device)     : {dt * 1e3 / R:7.2f} ms/step "
          f"({R} steps, median of 5, null-corrected)")


if __name__ == "__main__":
    main()
