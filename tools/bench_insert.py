#!/usr/bin/env python
"""Microbenchmark the insert path of the fused-group voxel map."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from fast_limo_tpu.models import mapper

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

    t_null = loop_time(lambda q: q + 1e-6, q0)
    print(f"null: {t_null*1e3/R:.3f} ms/iter  (device {jax.devices()[0]})")

    def tm(name, body, carry=q0):
        t = (loop_time(body, carry) - t_null) / R * 1e3
        print(f"{name:34s}: {t:7.2f} ms")
        return t

    def full(q):
        m2 = mapper.insert(m, q, valid, voxel_size=vs)
        return q + m2.table[0, 0] * 1e-12
    tm("insert full", full)

    def meta(q):
        vc = mapper.voxel_coords(q, vs)
        g = mapper._hash(vc, G)
        match, counts = mapper._group_meta(m, g, vc)
        return q + jnp.sum(counts) * 1e-12
    tm("meta gather + match", meta)

    def srt(q):
        vc = mapper.voxel_coords(q, vs)
        g = mapper._hash(vc, G)
        key_g = jnp.where(valid, g, jnp.int32(0x7FFFFFFF))
        packed = ((vc[:, 0] & 0x7FFF) << 15) | (vc[:, 1] & 0x7FFF)
        order = jnp.lexsort((vc[:, 2], packed, key_g))
        return q + jnp.sum(order).astype(jnp.float32) * 1e-12
    tm("lexsort 3 keys", srt)

    rows4 = W // 4
    rowidx = jnp.asarray(rng.integers(0, G * rows4, N), jnp.int32)

    def sct(q):
        flat4 = m.table.reshape(G * rows4, 4)
        vals = jnp.concatenate([q, jnp.zeros((N, 1), jnp.float32)], axis=1)
        flat4 = flat4.at[rowidx + q[0, 0].astype(jnp.int32) * 0].set(
            vals, mode="drop")
        return q + flat4[0, 0] * 1e-12
    tm("fused scatter (2N rows-of-4)", sct)


if __name__ == "__main__":
    main()
