#!/usr/bin/env python
"""Compare top-k paths at the BENCH config's candidate width (V=8, B=6 → C=48)
and the full-cube width (C=162): Pallas one-hot k-min vs lax.top_k."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fast_limo_tpu.ops import knn as pknn

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
    N, k = 10000, 5
    q0 = jnp.asarray(rng.uniform(-40, 40, (N, 3)), jnp.float32)

    t_null = loop_time(lambda q: q + 1e-6, q0)
    print(f"null: {t_null / R * 1e3:.3f} ms")

    for C in (48, 162):
        cand = jnp.asarray(rng.uniform(-40, 40, (N, C, 3)), jnp.float32)
        valid = jnp.asarray(rng.uniform(size=(N, C)) < 0.7)

        def p_body(q):
            nbrs, sq, vld = pknn.masked_topk(cand, valid, q, k=k)
            return q + jnp.mean(nbrs) * 1e-12

        def l_body(q):
            nbrs, sq, vld = pknn.masked_topk_reference(cand, valid, q, k=k)
            return q + jnp.mean(nbrs) * 1e-12

        tp = (loop_time(p_body, q0) - t_null) / R * 1e3
        tl = (loop_time(l_body, q0) - t_null) / R * 1e3
        print(f"C={C:4d}: pallas {tp:6.3f} ms   lax.top_k {tl:6.3f} ms")


if __name__ == "__main__":
    main()
