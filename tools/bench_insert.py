#!/usr/bin/env python
"""Micro-benchmarks of insert's sub-stages (entry-block layout)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

    q0 = jnp.asarray(rng.uniform([-40, -40, -2], [40, 40, 6], (N, 3)),
                     jnp.float32)
    valid = jnp.ones(N, bool)
    G = m.groups
    B = m.bucket
    EW = mapper._entry_width(B)

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

    def srt(q):
        vc = mapper.voxel_coords(q, vs)
        g = mapper._hash(vc, G)
        key_g = jnp.where(valid, g, jnp.int32(0x7FFFFFFF))
        packed = (((vc[:, 0] & 0x3FF) << 20)
                  | ((vc[:, 1] & 0x3FF) << 10)
                  | (vc[:, 2] & 0x3FF))
        _, _, order = jax.lax.sort(
            (key_g, packed, jnp.arange(N, dtype=jnp.int32)), num_keys=2)
        return q + jnp.sum(order).astype(jnp.float32) * 1e-12
    tm("2-key sort", srt)

    def gat(q):
        vc = mapper.voxel_coords(q, vs)
        g = mapper._hash(vc, G)
        ent, match, counts = mapper._group_rows(m, g, vc)
        return q + jnp.sum(counts) * 1e-12
    tm("group-row gather + match", gat)

    def seg(q):
        vc = mapper.voxel_coords(q, vs)
        same = jnp.concatenate(
            [jnp.array([False]), jnp.all(vc[1:] == vc[:-1], axis=-1)])
        r = mapper._seg_sum(~same, jnp.concatenate(
            [jnp.array([True]), jnp.zeros(N - 1, bool)]))
        return q + jnp.sum(r).astype(jnp.float32) * 1e-12
    tm("segmented scan", seg)

    def mrg(q):
        # the (N,B,B) selection einsum of the leader merge
        pts4 = jnp.concatenate([q, jnp.zeros((N, 1), jnp.float32)], axis=1)
        new_stack = jnp.broadcast_to(pts4[:, None, :], (N, B, 4))
        sel = jnp.asarray(rng.uniform(size=(N, B, B)) < 0.2, jnp.float32)
        out = jnp.einsum("nsj,njc->nsc", sel, new_stack)
        return q + jnp.mean(out) * 1e-12
    tm("merge einsum (N,B,B)", mrg)

    rowidx = jnp.asarray(rng.integers(0, G * 8, N), jnp.int32)

    def sct(q):
        flatE = m.table.reshape(G * 8, EW)
        vals = jnp.zeros((N, EW), jnp.float32).at[:, :3].set(q)
        flatE = flatE.at[rowidx + q[0, 0].astype(jnp.int32) * 0].set(
            vals, mode="drop")
        return q + flatE[0, 0] * 1e-12
    tm("entry-block scatter (N rows)", sct)


if __name__ == "__main__":
    main()
