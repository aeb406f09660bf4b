#!/usr/bin/env python
"""Gather cost vs row width on the TPU, with dynamic (non-foldable) indices.

Decides the hash-table layout: if gather cost is per-ROW (latency-bound),
fusing meta+points+probe-chain into one wide row wins; if per-BYTE, the
current narrow layout is right.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

R = 30
C = 2 ** 17
NROWS = 80000  # N*8 rows per scan step


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
    base_idx = jnp.asarray(rng.integers(0, C, NROWS), jnp.int32)

    t_null = loop_time(lambda s: s + 1, jnp.asarray(1, jnp.int32))
    print(f"null: {t_null * 1e3 / R:.3f} ms/iter  (device {jax.devices()[0]})")

    def tm(name, body, carry):
        t = (loop_time(body, carry) - t_null) / R * 1e3
        print(f"{name:40s}: {t:7.3f} ms")
        return t

    for W in (4, 8, 16, 32, 96, 128):
        tbl = jnp.asarray(rng.standard_normal((C, W)), jnp.float32)

        def body(s, tbl=tbl):
            idx = (base_idx + s) & (C - 1)          # depends on carry
            rows = tbl[idx]                          # (NROWS, W)
            return s + (jnp.mean(rows) * 1e-12).astype(jnp.int32) + 1
        tm(f"gather rows W={W} ({W*4}B) x {NROWS}", body, jnp.asarray(1, jnp.int32))

    # 2D-indexed gather (N,8) like the real code, W=16
    tbl = jnp.asarray(rng.standard_normal((C, 16)), jnp.float32)
    idx2 = base_idx.reshape(-1, 8)

    def body2(s):
        idx = (idx2 + s) & (C - 1)
        rows = tbl[idx]                              # (N,8,16)
        return s + (jnp.mean(rows) * 1e-12).astype(jnp.int32) + 1
    tm("gather rows W=16 via (N,8) idx", body2, jnp.asarray(1, jnp.int32))

    # fewer rows: dedupe scale test
    for NR in (20000, 40000):
        idxs = base_idx[:NR]

        def bodyn(s, idxs=idxs):
            idx = (idxs + s) & (C - 1)
            rows = tbl[idx]
            return s + (jnp.mean(rows) * 1e-12).astype(jnp.int32) + 1
        tm(f"gather rows W=16 x {NR}", bodyn, jnp.asarray(1, jnp.int32))

    # int32 meta-style gather (N,8,4)
    tbl_i = jnp.asarray(rng.integers(0, 100, (C, 4)), jnp.int32)

    def bodyi(s):
        idx = (idx2 + s) & (C - 1)
        rows = tbl_i[idx]
        return s + jnp.sum(rows) * 0 + 1
    tm("gather int32 meta (N,8,4)", bodyi, jnp.asarray(1, jnp.int32))

    # take_along_axis-of-flat vs fancy: same thing, sanity
    flat = jnp.asarray(rng.standard_normal((C * 4,)), jnp.float32)

    def bodyf(s):
        idx = (base_idx + s) & (C - 1)
        v = flat[idx]
        return s + (jnp.mean(v) * 1e-12).astype(jnp.int32) + 1
    tm("gather scalars x 80000", bodyf, jnp.asarray(1, jnp.int32))


if __name__ == "__main__":
    main()
