#!/usr/bin/env python
"""Scatter/gather cost vs row width: 28 f32 (112 B, unaligned) vs 32 f32
(128 B, lane-aligned) rows at the map's shapes."""

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
    ROWS = 131072
    N = 10000
    idx = jnp.asarray(rng.integers(0, ROWS, N), jnp.int32)
    gidx = jnp.asarray(rng.integers(0, ROWS // 8, (N, 8)), jnp.int32)

    q0 = jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32)
    t_null = loop_time(lambda q: q + 1e-6, q0)
    print(f"null {t_null/R*1e3:.3f} ms")

    for EW in (28, 32):
        table = jnp.asarray(rng.uniform(size=(ROWS, EW)), jnp.float32)
        vals = jnp.asarray(rng.uniform(size=(N, EW)), jnp.float32)

        def sct(q, table=table, vals=vals):
            t2 = table.at[idx].set(vals + q[0, 0] * 1e-12, mode="drop")
            return q + t2[0, 0] * 1e-12
        ts = (loop_time(sct, q0) - t_null) / R * 1e3

        wide = table.reshape(ROWS // 8, 8 * EW)

        def gat(q, wide=wide, EW=EW):
            rows = wide[gidx + (q[0, 0] * 0).astype(jnp.int32)]  # (N,8,8EW)
            return q + jnp.mean(rows) * 1e-12
        tg = (loop_time(gat, q0) - t_null) / R * 1e3
        print(f"EW={EW}: scatter(N rows) {ts:6.2f} ms   "
              f"gather(N×8 group rows) {tg:6.2f} ms")


if __name__ == "__main__":
    main()
