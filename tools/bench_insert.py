#!/usr/bin/env python
"""Microbenchmark the insert sub-stages of the fused-group voxel map."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from fast_limo_tpu.models import mapper
from fast_limo_tpu.models.mapper import (E, _CNT0, _PTS0, _PTROW0, _hash,
                                         _seg_sum, voxel_coords)

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
    capacity, bucket, vs = 2 ** 17, 6, 1.2
    N = 10000
    rng = np.random.default_rng(0)

    m = mapper.create(capacity, bucket)
    world = jnp.asarray(
        rng.uniform([-100, -100, -2], [100, 100, 8], (60000, 3)), jnp.float32)
    for i in range(0, 60000, 20000):
        m = mapper.insert(m, world[i:i + 20000], jnp.ones(20000, bool),
                          voxel_size=vs)
    jax.block_until_ready(m)

    q0 = jnp.asarray(rng.uniform([-40, -40, -2], [40, 40, 6], (N, 3)), jnp.float32)
    valid = jnp.ones(N, bool)
    G, W = m.table.shape
    B = bucket

    t_null = loop_time(lambda q: q + 1e-6, q0)
    print(f"null: {t_null*1e3/R:.3f} ms/iter")

    def tm(name, body, carry=q0):
        t = (loop_time(body, carry) - t_null) / R * 1e3
        print(f"{name:34s}: {t:7.2f} ms")
        return t

    def full(q):
        m2 = mapper.insert(m, q, valid, voxel_size=vs)
        return q + m2.table[0, 0] * 1e-12
    tm("insert full", full)

    # stage 1: hash + meta gather + match
    def s1(q):
        vc = voxel_coords(q, vs)
        g = _hash(vc, G)
        meta = m.table[g, :_PTS0]
        coords = jax.lax.bitcast_convert_type(
            meta[..., :_CNT0], jnp.int32).reshape(N, E, 3)
        counts = meta[..., _CNT0:_CNT0 + E]
        match = (counts > 0) & jnp.all(coords == vc[:, None, :], axis=-1)
        return q + jnp.sum(match).astype(jnp.float32) * 1e-12
    tm("meta gather + match", s1)

    # stage 2: lexsort 3 keys
    def s2(q):
        vc = voxel_coords(q, vs)
        g = _hash(vc, G)
        key_g = jnp.where(valid, g, jnp.int32(0x7FFFFFFF))
        packed_xy = ((vc[:, 0] & 0x7FFF) << 15) | (vc[:, 1] & 0x7FFF)
        order = jnp.lexsort((vc[:, 2], packed_xy, key_g))
        return q + jnp.sum(order).astype(jnp.float32) * 1e-12
    tm("lexsort 3 keys", s2)

    def s2b(q):
        vc = voxel_coords(q, vs)
        key_hi = ((vc[:, 0] & 0x7FFF) << 15) | (vc[:, 1] & 0x7FFF)
        order = jnp.lexsort((vc[:, 2], key_hi))
        return q + jnp.sum(order).astype(jnp.float32) * 1e-12
    tm("lexsort 2 keys (old)", s2b)

    # stage 3: permutes + scans
    def s3(q):
        vc = voxel_coords(q, vs)
        g = _hash(vc, G)
        key_g = jnp.where(valid, g, jnp.int32(0x7FFFFFFF))
        packed_xy = ((vc[:, 0] & 0x7FFF) << 15) | (vc[:, 1] & 0x7FFF)
        order = jnp.lexsort((vc[:, 2], packed_xy, key_g))
        idxs = jnp.arange(N)
        vc_s = vc[order]
        valid_s = valid[order]
        g_s = key_g[order]
        same_voxel = jnp.concatenate(
            [jnp.array([False]),
             jnp.all(vc_s[1:] == vc_s[:-1], axis=-1) & valid_s[1:] & valid_s[:-1]])
        seg_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(~same_voxel, idxs, 0))
        rank_s = (idxs - seg_start).astype(jnp.int32)
        new_group = jnp.concatenate([jnp.array([True]), g_s[1:] != g_s[:-1]])
        is_new_start = valid_s & ~same_voxel
        r_new_s = _seg_sum(is_new_start, new_group) - 1
        rank = jnp.zeros(N, jnp.int32).at[order].set(rank_s)
        r_new = jnp.zeros(N, jnp.int32).at[order].set(r_new_s)
        return q + (jnp.sum(rank) + jnp.sum(r_new)).astype(jnp.float32) * 1e-12
    tm("sort+permutes+scans", s3)

    # stage 4: the three scatters (fixed targets)
    vc0 = voxel_coords(q0, vs)
    g0 = _hash(vc0, G)
    entry0 = jnp.asarray(rng.integers(0, E, N), jnp.int32)
    pos0 = jnp.asarray(rng.integers(0, B, N), jnp.int32)

    def s4(q):
        flat3 = m.table.reshape(G * (W // 3), 3)
        OOB3 = G * (W // 3)
        rowbase = g0 * (W // 3)
        prow = rowbase + _PTROW0 + entry0 * B + pos0
        flat3 = flat3.at[prow].set(q, mode="drop")
        crow = rowbase + entry0
        vc_f = jax.lax.bitcast_convert_type(vc0 + q[0, 0].astype(jnp.int32), jnp.float32)
        flat3 = flat3.at[crow].set(vc_f, mode="drop")
        flat1 = flat3.reshape(G * W)
        coff = g0 * W + _CNT0 + entry0
        flat1 = flat1.at[coff].add(1.0, mode="drop")
        return q + flat1[0] * 1e-12
    tm("3 scatters", s4)

    # single scatter only
    def s5(q):
        flat3 = m.table.reshape(G * (W // 3), 3)
        prow = g0 * (W // 3) + _PTROW0 + entry0 * B + pos0
        flat3 = flat3.at[prow].set(q, mode="drop")
        return q + flat3[0, 0] * 1e-12
    tm("points scatter only", s5)


if __name__ == "__main__":
    main()
