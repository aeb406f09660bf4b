#!/usr/bin/env python
"""Sub-bisect of the h_model build (stage E of probe_fullstep_bisect):

  A  gather_rows at x0
  B  A + fused topk (knn_rows kernel)
  C  B + fit_planes + gates
  D  C + hstats pack_inputs
  E  D + one hstats_tpu eval (the full stage-E cost)

Run: tools/tpu_run.sh 1200 python tools/probe_hmodel_bisect.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from fast_limo_tpu.models import mapper
from fast_limo_tpu.models import pipeline as pl
from fast_limo_tpu.ops import hstats as hstats_op
from fast_limo_tpu.ops import knn_rows
from fast_limo_tpu.ops import plane as plane_op

R = 30


def loop_time(make_body, reps=5):
    @jax.jit
    def run(c0):
        def body(c, _):
            return make_body(c), None
        out, _ = jax.lax.scan(body, c0, None, length=R)
        return out

    out = run(jnp.zeros(()))
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(jnp.zeros(()))
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / R


def main():
    cfg = bench.kitti_like_cfg()
    rng = np.random.default_rng(0)
    dtype = jnp.float32
    mp_cfg = cfg.ikfom.mapping
    vs = cfg.tpu.map_voxel_size
    k = mp_cfg.NUM_MATCH_POINTS

    m = mapper.create(cfg.tpu.map_capacity, cfg.map_points_per_voxel, dtype)
    world = jnp.asarray(
        rng.uniform([-100, -100, -2], [100, 100, 8], (60000, 3)), dtype)
    for i in range(0, 60000, 20000):
        m = mapper.insert(m, world[i:i + 20000], jnp.ones(20000, bool),
                          voxel_size=vs)
    jax.block_until_ready(m)

    N = mp_cfg.MAX_NUM_PC2MATCH
    pc = jnp.asarray(rng.uniform([-40, -40, -2], [40, 40, 6], (N, 3)), dtype)
    pc_valid = jnp.ones(N, bool)
    state = pl.init_state(cfg)
    x0 = state.x

    def upto(stage, c):
        glob = pc + c * 1e-9
        rows, ncb, owned = mapper.gather_rows(m, glob, voxel_size=vs)
        if stage == "A":
            return c + rows[0, 0, 0] * 1e-12
        nbrs, sq, vld = knn_rows.topk_from_rows_tpu(
            rows, ncb, glob, E=mapper.E, B=m.bucket, k=k)
        if stage == "B":
            return c + nbrs[0, 0, 0] * 1e-12
        n_abcd, good = plane_op.fit_planes(
            nbrs, sq, vld, num_match_points=k,
            max_dist_plane=mp_cfg.MAX_DIST_PLANE,
            plane_threshold=mp_cfg.PLANE_THRESHOLD)
        good = good & pc_valid
        local_cum = jnp.cumsum(good.astype(jnp.int32))
        keep = good & (local_cum <= mp_cfg.MAX_NUM_MATCHES)
        if stage == "C":
            return c + n_abcd[0, 0] * 1e-12
        X = hstats_op.pack_inputs(pc, n_abcd, keep)
        if stage == "D":
            return c + X[0, 0] * 1e-12
        HTH, HTh = hstats_op.hstats_tpu(
            X, hstats_op.pack_scalars(x0), estimate_extrinsics=True)
        return c + HTH[0, 0] * 1e-12

    # in-process null (see probe_fullstep_bisect: the tunnel is bimodal
    # per process; null > 0.1 ms/iter = degraded regime, rerun)
    dummy = jnp.asarray(np.arange(32), jnp.float32)
    t_null = loop_time(lambda c: c + jnp.sum(dummy) * (c + 1.0) * 1e-12) * 1e3
    print(f"null: {t_null:7.3f} ms/iter ({'FAST' if t_null < 0.1 else 'DEGRADED - rerun'})")

    prev = 0.0
    for stage in ("A", "B", "C", "D", "E"):
        t = loop_time(lambda c, s=stage: upto(s, c)) * 1e3 - t_null
        print(f"{stage}: {t:7.3f} ms  (+{t - prev:6.3f})")
        prev = t


if __name__ == "__main__":
    main()
