#!/usr/bin/env python
"""kNN-gather microprobe: 10k queries x 8 block rows from a (G, W) table.

Round-4 question: the measured gather runs at ~118 GB/s effective (14% of
HBM) in BOTH the 896 B-row (round 3) and 1408 B-row (round 4) layouts —
i.e. bytes-bound at a mediocre rate.  Sweep row width / lane alignment and
index shapes to find what actually moves it:

  * W sweep at fixed total rows (80k): per-row vs per-byte scaling
  * aligned (multiple of 128 lanes) vs unaligned rows
  * one fused (N*8,) index gather vs 8 separate (N,) gathers
  * gather from a TALLER table of narrower rows (same bytes)

Run: tools/tpu_run.sh 900 python tools/probe_gather_width.py
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
G = 8192
N = 10000


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
    idx8 = jnp.asarray(rng.integers(0, G, (N, 8)), jnp.int32)

    t_null = loop_time(lambda s: s + 1, jnp.asarray(1, jnp.int32))
    print(f"null: {t_null * 1e3 / R:.3f} ms/iter  (device {jax.devices()[0]})")

    def tm(name, body, nbytes):
        t = (loop_time(body, jnp.asarray(1, jnp.int32)) - t_null) / R * 1e3
        gbs = nbytes / (t * 1e-3) / 1e9 if t > 0 else float("inf")
        print(f"{name:46s}: {t:7.3f} ms  ({gbs:6.1f} GB/s out)")
        return t

    for W in (176, 352, 384, 448, 512):
        tbl = jnp.asarray(rng.standard_normal((G, W)), jnp.float32)

        def body(s, tbl=tbl):
            ix = (idx8 + s) & (G - 1)
            out = tbl[ix]                       # (N,8,W)
            return s + out[0, 0, 0].astype(jnp.int32)
        tm(f"fused (N,8) idx, W={W} ({W*4} B)", body, N * 8 * W * 4)

    # 8 separate gathers at W=352
    tbl = jnp.asarray(rng.standard_normal((G, 352)), jnp.float32)

    def body_sep(s):
        acc = s.astype(jnp.float32)
        for j in range(8):
            ix = (idx8[:, j] + s) & (G - 1)
            acc = acc + tbl[ix][0, 0]
        return acc.astype(jnp.int32)
    tm("8 separate (N,) gathers, W=352", body_sep, N * 8 * 352 * 4)

    # taller table, narrower rows, same bytes: (G*SUB, 176) with 16 rows/query
    tbl2 = jnp.asarray(rng.standard_normal((G * 2, 176)), jnp.float32)
    idx16 = jnp.concatenate([idx8 * 2, idx8 * 2 + 1], axis=1)   # (N,16)

    def body_tall(s):
        ix = (idx16 + s) & (G * 2 - 1)
        out = tbl2[ix]
        return s + out[0, 0, 0].astype(jnp.int32)
    tm("tall (N,16) idx, W=176 (704 B)", body_tall, N * 16 * 176 * 4)

    # sorted indices (spatial-locality proxy): does HBM locality matter?
    idx_sorted = jnp.sort(idx8.reshape(-1)).reshape(N, 8)

    def body_sort(s):
        ix = (idx_sorted + s) & (G - 1)
        out = tbl[ix]
        return s + out[0, 0, 0].astype(jnp.int32)
    tm("sorted idx, W=352", body_sort, N * 8 * 352 * 4)

    # half-width f16 table (quantized mirror): same rows, half bytes
    tblh = jnp.asarray(rng.standard_normal((G, 352)), jnp.float16)

    def body_h(s):
        ix = (idx8 + s) & (G - 1)
        out = tblh[ix]
        return s + out[0, 0, 0].astype(jnp.int32)
    tm("f16 table, W=352 lanes (704 B)", body_h, N * 8 * 352 * 2)

    # and f16 at 384 lanes (768 B, 1.5 x 512B bursts)
    tblh2 = jnp.asarray(rng.standard_normal((G, 384)), jnp.float16)

    def body_h2(s):
        ix = (idx8 + s) & (G - 1)
        out = tblh2[ix]
        return s + out[0, 0, 0].astype(jnp.int32)
    tm("f16 table, W=384 lanes (768 B)", body_h2, N * 8 * 384 * 2)


if __name__ == "__main__":
    main()
