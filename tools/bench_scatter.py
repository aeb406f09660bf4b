#!/usr/bin/env python
"""Scatter variants on the tunneled TPU: rows-of-4 vs rows-of-28, drop mode,
unique_indices, sortedness."""

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
    G, W = 16384, 224
    table = jnp.asarray(rng.normal(size=(G, W)), jnp.float32)
    flat4 = table.reshape(-1, 4)
    flat28 = table.reshape(-1, 28)
    pts = jnp.asarray(rng.uniform(-40, 40, (N, 3)), jnp.float32)

    t_null = loop_time(lambda q: q + 1e-6, pts)

    def tm(name, body, carry=pts):
        t = (loop_time(body, carry) - t_null) / R * 1e3
        print(f"{name:44s}: {t:7.3f} ms")

    M4 = flat4.shape[0]
    M28 = flat28.shape[0]

    def mk(rows_fn, flat, width, n_idx, **kw):
        def body(p):
            rows = rows_fn(p, n_idx)
            vals = jnp.broadcast_to(p[:1, :1], (n_idx, width)) + rows[:, None]
            f = flat.at[rows].set(vals, mode="drop", **kw)
            return p + f[0, 0] * 1e-12
        return body

    def rand_rows(p, n):
        base = (p[: n % N + (N if n > N else 0), 0] if False else None)
        r = ((jnp.arange(n).astype(jnp.uint32) * jnp.uint32(2654435761) % jnp.uint32(M4)).astype(jnp.int32)
             + (p[0, 0] * 0).astype(jnp.int32))
        return r

    # 20k random rows-of-4 (current insert shape)
    tm("scatter 20k rows-of-4 random", mk(rand_rows, flat4, 4, 20000))
    # 10k random rows-of-4
    tm("scatter 10k rows-of-4 random", mk(rand_rows, flat4, 4, 10000))
    # 10k rows-of-28 random
    def rand_rows28(p, n):
        return ((jnp.arange(n).astype(jnp.uint32) * jnp.uint32(2654435761) % jnp.uint32(M28)).astype(jnp.int32)
                + (p[0, 0] * 0).astype(jnp.int32))
    tm("scatter 10k rows-of-28 random", mk(rand_rows28, flat28, 28, 10000))
    # unique_indices variants
    tm("scatter 20k rows-of-4 unique",
       mk(rand_rows, flat4, 4, 20000, unique_indices=True))
    tm("scatter 10k rows-of-28 unique",
       mk(rand_rows28, flat28, 28, 10000, unique_indices=True))
    # sorted rows
    def sorted_rows(p, n):
        r = jnp.sort(((jnp.arange(n).astype(jnp.uint32) * jnp.uint32(2654435761)) % M4).astype(jnp.int32))
        return r + (p[0, 0] * 0).astype(jnp.int32)
    tm("scatter 20k rows-of-4 sorted+unique",
       mk(sorted_rows, flat4, 4, 20000,
          unique_indices=True, indices_are_sorted=True))
    def sorted_rows28(p, n):
        r = jnp.sort(((jnp.arange(n).astype(jnp.uint32) * jnp.uint32(2654435761)) % M28).astype(jnp.int32))
        return r + (p[0, 0] * 0).astype(jnp.int32)
    tm("scatter 10k rows-of-28 sorted+unique",
       mk(sorted_rows28, flat28, 28, 10000,
          unique_indices=True, indices_are_sorted=True))


if __name__ == "__main__":
    main()
