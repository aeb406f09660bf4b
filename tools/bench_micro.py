#!/usr/bin/env python
"""Micro-benchmarks: insert sub-stages + host->device transfer over the tunnel."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

R = 30


def loop_time(make_body, init_carry, reps=5):
    @jax.jit
    def run(carry):
        def body(c, _):
            return make_body(c), None
        out, _ = jax.lax.scan(body, carry, None, length=R)
        return out

    out = run(init_carry)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(init_carry)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    N = 10000
    pts = jnp.asarray(rng.uniform(-40, 40, (N, 3)), jnp.float32)

    t_null = loop_time(lambda q: q + 1e-6, pts)
    print(f"null: {t_null*1e3/R:.3f} ms")

    def tm(name, body, carry):
        t = (loop_time(body, carry) - t_null) / R * 1e3
        print(f"{name:34s}: {t:7.3f} ms")

    # 3-operand sort, num_keys=2 (current insert)
    def s3_body(p):
        vc = jnp.floor(p / 1.2).astype(jnp.int32)
        g = ((vc[:, 0] * 73856093) ^ (vc[:, 1] * 19349669)
             ^ (vc[:, 2] * 83492791)) & 0x3FFF
        packed = (((vc[:, 0] & 0x3FF) << 20) | ((vc[:, 1] & 0x3FF) << 10)
                  | (vc[:, 2] & 0x3FF))
        a, b, order = jax.lax.sort(
            (g, packed, jnp.arange(N, dtype=jnp.int32)), num_keys=2)
        return p + order[0] * 1e-12
    tm("sort 3-operand num_keys=2 (10k)", s3_body, pts)

    # 2-operand fused-key sort, num_keys=1
    def s2_body(p):
        vc = jnp.floor(p / 1.2).astype(jnp.int32)
        g = ((vc[:, 0] * 73856093) ^ (vc[:, 1] * 19349669)
             ^ (vc[:, 2] * 83492791)) & 0x3FFF
        sub = ((vc[:, 0] * jnp.int32(-1640531535)) ^ (vc[:, 1] * 805459861)
               ^ (vc[:, 2] * jnp.int32(-620313867))) & 0x3FFFF
        key = (g << 18) | sub
        _, order = jax.lax.sort((key, jnp.arange(N, dtype=jnp.int32)),
                                num_keys=1)
        return p + order[0] * 1e-12
    tm("sort fused-key num_keys=1 (10k)", s2_body, pts)

    # the two associative scans on 10k
    def a_body(p):
        flags = p[:, 0] > 0
        reset = p[:, 1] > 0
        def combine(a, b):
            va, ra = a
            vb, rb = b
            return jnp.where(rb, vb, va + vb), ra | rb
        out, _ = jax.lax.associative_scan(
            combine, (flags.astype(jnp.int32), reset))
        seg = jax.lax.associative_scan(
            jnp.maximum, jnp.where(reset, jnp.arange(N), 0))
        return p + (out[0] + seg[0]) * 1e-12
    tm("2x associative_scan (10k)", a_body, pts)

    # gather 10k full rows from the fused table (W=224 f32)
    table = jnp.asarray(rng.normal(size=(16384, 224)), jnp.float32)
    def g_body(p):
        g = (p[:, 0] * 1000).astype(jnp.int32) & 0x3FFF
        rows = table[g]
        return p + rows[0, 0] * 1e-12
    tm("gather 10k rows W=224", g_body, pts)

    # scatter 20k rows-of-4 into table
    flat4 = table.reshape(-1, 4)
    def sc_body(p):
        rows = ((p[:, 0] * 977).astype(jnp.int32) & 0xFFFF)
        rows = jnp.concatenate([rows, rows + 7])
        vals = jnp.concatenate([p + 1, p * 2], axis=0)
        vals = jnp.concatenate([vals, vals[:, :1]], axis=1)
        f = flat4.at[rows].set(vals, mode="drop")
        return p + f[0, 0] * 1e-12
    tm("scatter 20k rows-of-4", sc_body, pts)

    # 8-corner gather_neighborhood at bench shapes
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(sys.path[0], "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = bench
    spec.loader.exec_module(bench)
    from fast_limo_tpu.models import mapper
    cfg = bench.kitti_like_cfg()
    m = mapper.create(cfg.tpu.map_capacity, cfg.tpu.map_points_per_voxel)
    world = jnp.asarray(rng.uniform([-100, -100, -2], [100, 100, 8],
                                    (60000, 3)), jnp.float32)
    m = mapper.insert(m, world, jnp.ones(60000, bool),
                      voxel_size=cfg.tpu.map_voxel_size)
    def n8_body(q):
        cand, cv = mapper.gather_neighborhood(
            m, q, voxel_size=cfg.tpu.map_voxel_size, neighborhood=8)
        return q + jnp.mean(cand) * 1e-12
    tm("gather_neighborhood nb=8 (10k)", n8_body, pts)

    # host->device transfer of a 32k scan batch (512KB) incl. block
    host = np.asarray(rng.uniform(-40, 40, (32768, 4)), np.float32)
    for _ in range(3):
        d = jnp.asarray(host)
        jax.block_until_ready(d)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        d = jnp.asarray(host)
        jax.block_until_ready(d)
        ts.append(time.perf_counter() - t0)
    print(f"h2d transfer 512KB (block)        : {np.median(ts)*1e3:7.3f} ms")

    # dispatch-only latency: tiny jit call + block
    @jax.jit
    def tiny(x):
        return x + 1
    xs = jnp.zeros(8)
    tiny(xs).block_until_ready()
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        tiny(xs).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"dispatch round-trip (tiny jit)    : {np.median(ts)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
