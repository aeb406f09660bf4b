#!/usr/bin/env python
"""Direct probe of the window re-match loop kernel on realistic data.

Builds the bench-config measurement model over a surface world, then:
  * runs update_loop_tpu(window mode) with aux → ok / stale count / iters
  * times (null-corrected, in-process): the kernel alone, the full
    update_iterated (kernel + cond fallback), and the forced jnp loop
Run: tools/tpu_run.sh 1800 python tools/probe_window_kernel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(sys.path[0], "bench.py"))
bench = importlib.util.module_from_spec(spec)
sys.modules["bench"] = bench
spec.loader.exec_module(bench)

from fast_limo_tpu.io import synthetic as syn
from fast_limo_tpu.models import iekf, mapper, measurement
from fast_limo_tpu.models import pipeline as pl
from fast_limo_tpu.ops import update_loop

R_ITERS = 30


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(R_ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / R_ITERS * 1e3


def main():
    cfg = bench.kitti_like_cfg()
    rng = np.random.default_rng(0)
    state = pl.init_state(cfg)
    world_np = syn.build_world(0, extent=120.0)
    sel = rng.choice(len(world_np), 60000, replace=False)
    world = jnp.asarray(world_np[sel], jnp.float32)
    m = state.map
    for i in range(0, 60000, 20000):
        m = mapper.insert(m, world[i:i + 20000], jnp.ones(20000, bool),
                          voxel_size=cfg.tpu.map_voxel_size)
    jax.block_until_ready(m)

    n_q = cfg.ikfom.mapping.MAX_NUM_PC2MATCH
    qsel = rng.choice(len(world_np), n_q, replace=False)
    pc = jnp.asarray(world_np[qsel] + rng.normal(0, 0.01, (n_q, 3)),
                     jnp.float32)
    pc_valid = jnp.ones(n_q, bool)
    x0 = state.x

    mp_cfg = cfg.ikfom.mapping

    @jax.jit
    def build_and_run(pcq):
        _hr, h_stats = measurement.make_h_model(
            m, pcq, pc_valid, voxel_size=cfg.map_voxel_size,
            k=mp_cfg.NUM_MATCH_POINTS, probes=cfg.tpu.hash_probes,
            max_dist_plane=mp_cfg.MAX_DIST_PLANE,
            plane_threshold=mp_cfg.PLANE_THRESHOLD,
            max_num_matches=mp_cfg.MAX_NUM_MATCHES,
            estimate_extrinsics=True, x0=x0,
            dynamic_gate=mp_cfg.DYNAMIC_GATE)
        return h_stats.loop_pack

    X = build_and_run(pc)
    _hr, h_stats = measurement.make_h_model(
        m, pc, pc_valid, voxel_size=cfg.map_voxel_size,
        k=mp_cfg.NUM_MATCH_POINTS, probes=cfg.tpu.hash_probes,
        max_dist_plane=mp_cfg.MAX_DIST_PLANE,
        plane_threshold=mp_cfg.PLANE_THRESHOLD,
        max_num_matches=mp_cfg.MAX_NUM_MATCHES,
        estimate_extrinsics=True, x0=x0,
        dynamic_gate=mp_cfg.DYNAMIC_GATE)
    win = h_stats.loop_window
    print("window params:", win)

    P = state.P
    out = update_loop.update_loop_tpu(
        X, P, x0, cfg.ikfom.lidar_noise, cfg.ikfom.degeneracy_thresh,
        cfg.ikfom.LIMITS, max_iters=cfg.ikfom.MAX_NUM_ITERS,
        estimate_extrinsics=True, window=win, with_aux=True)
    aux = np.asarray(out[6])
    print(f"kernel: n_iters={int(out[2])} ok={bool(out[3])} "
          f"stale_total={aux[0, 4]:.0f} gersh={aux[0, 2]:.3f} "
          f"min_eig={aux[0, 3]:.3f}")

    # ---- null (R-iteration loop shape, regime detection) ----
    c0 = jnp.zeros((23, 23), jnp.float32)

    @jax.jit
    def null_fn(c):
        return jax.lax.fori_loop(
            0, R_ITERS, lambda i, a: a + X[0, 0] * 1e-30, c)

    t_null = timeit(null_fn, c0) / R_ITERS
    print(f"null: {t_null:.3f} ms/iter "
          f"({'FAST' if t_null < 5e-3 * R_ITERS else 'DEGRADED'})")

    def loop_body(fn):
        @jax.jit
        def run(c):
            def body(i, a):
                x_n, P_n, n_it = fn(a)
                return a + P_n * 1e-30 + x_n.pos[0] * 1e-30
            return jax.lax.fori_loop(0, R_ITERS, body, c)
        return run

    # kernel alone
    def k_only(c):
        x_n, P_n, n_it, ok, _g, _me = update_loop.update_loop_tpu(
            X + c[0, 0] * 1e-30, P, x0, cfg.ikfom.lidar_noise,
            cfg.ikfom.degeneracy_thresh, cfg.ikfom.LIMITS,
            max_iters=cfg.ikfom.MAX_NUM_ITERS,
            estimate_extrinsics=True, window=win)
        return x_n, P_n, n_it

    # full update (kernel + cond fallback), via update_iterated
    def full_upd(c):
        x_n, P_n, n_it = iekf.update_iterated(
            x0, P + c * 1e-30, h_stats, R=cfg.ikfom.lidar_noise,
            D=cfg.ikfom.degeneracy_thresh,
            max_iters=cfg.ikfom.MAX_NUM_ITERS, limit=cfg.ikfom.LIMITS)
        return x_n, P_n, n_it

    t_k = timeit(loop_body(k_only), c0) / R_ITERS - t_null
    t_f = timeit(loop_body(full_upd), c0) / R_ITERS - t_null
    print(f"kernel-only: {t_k:.3f} ms   update_iterated: {t_f:.3f} ms")


if __name__ == "__main__":
    main()
