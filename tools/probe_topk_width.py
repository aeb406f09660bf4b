#!/usr/bin/env python
"""Cost of the knn_rows select/top-k kernel vs extraction depth k.

The round-5 window resolve extracts k+7=12 candidates instead of 5; each
extraction is a full-width argmin pass, so this measures how the kernel
scales and whether a cheaper deep-extraction scheme is worth building.
Run: tools/tpu_run.sh 1800 python tools/probe_topk_width.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from fast_limo_tpu.models import mapper
from fast_limo_tpu.ops import knn_rows

R = 30


def main():
    rng = np.random.default_rng(0)
    N = 10000
    B = 6
    G = 2 ** 17 // mapper.ROW_E
    m = mapper.create(2 ** 17, B)
    pts = jnp.asarray(rng.uniform(-60, 60, (120000, 3)), jnp.float32)
    for i in range(0, 120000, 30000):
        m = mapper.insert(m, pts[i:i + 30000], jnp.ones(30000, bool),
                          voxel_size=1.2)
    q = jnp.asarray(rng.uniform(-55, 55, (N, 3)), jnp.float32)
    rows, nc, _ = mapper.gather_rows(m, q, voxel_size=1.2)
    jax.block_until_ready(rows)

    def timed(fn, *args):
        @jax.jit
        def run(c):
            def body(i, acc):
                out = fn(*args, c + acc * 1e-30)
                return acc + out * 1e-30
            return jax.lax.fori_loop(0, R, body, c)
        o = run(jnp.zeros(()))
        jax.block_until_ready(o)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.zeros(())))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / R * 1e3

    # null: same loop shape
    t_null = timed(lambda c: rows[0, 0, 0] * 0 + c)
    print(f"null {t_null:.3f} ms "
          f"({'FAST' if t_null < 0.1 else 'DEGRADED'})")

    for k in (5, 8, 12):
        def fn(c, k=k):
            nb, sq, vl = knn_rows.topk_from_rows_tpu(
                rows, nc, q + c, E=mapper.E, B=B, k=k)
            return sq[:, 0].sum() * 1e-30 + nb[0, 0, 0] * 1e-30
        t = timed(fn) - t_null
        print(f"k={k:2d}: {t:.3f} ms")


if __name__ == "__main__":
    main()
