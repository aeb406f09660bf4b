#!/usr/bin/env python
"""Decompose the iterated-update loop's per-iteration cost on-device."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fast_limo_tpu.models import iekf
from fast_limo_tpu.models import state as st
from fast_limo_tpu.ops import gain as gain_op

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
    dtype = jnp.float32
    x = st.identity(dtype)
    P0 = np.asarray(iekf.init_P(jnp.float64)) * 1.0
    P = jnp.asarray(P0, dtype)
    H = rng.standard_normal((400, 12)) * np.geomspace(1, 300, 12)
    HTH = jnp.asarray(H.T @ H, dtype)
    HTh = jnp.asarray(H.T @ rng.standard_normal(400) * 0.1, dtype)

    def h_model(_x):
        return HTH, HTh

    t_null = loop_time(lambda c: c + 1e-6, P)
    print(f"null: {t_null / R * 1e3:.3f} ms")

    def tm(name, body, carry):
        t = (loop_time(body, carry) - t_null) / R * 1e3
        print(f"{name:32s}: {t:7.3f} ms")
        return t

    for mi in (1, 2, 3):
        def up(c, mi=mi):
            xu, Pu, n = iekf.update_iterated(
                x, P + c * 1e-12, h_model, R=1e-3, D=5.0,
                max_iters=mi, limit=1e-9)   # limit tiny -> never converges early
            return c + Pu * 1e-12
        tm(f"update_iterated max_iters={mi}", up, jnp.zeros((23, 23), dtype))

    dx = jnp.asarray(rng.standard_normal(23) * 1e-3, dtype)

    def bm(c):
        x2 = st.boxplus(x, dx + c[0] * 1e-12)
        d = st.boxminus(x2, x)
        return c + d * 1e-12
    tm("boxplus + boxminus", bm, jnp.zeros(23, dtype))

    def cp(c):
        dxn, Pit = iekf._chart_project_P(dx + c[:, 0] * 1e-12, x, x, P, dx)
        return c + Pit * 1e-12
    tm("_chart_project_P", cp, jnp.zeros((23, 23), dtype))

    K_x12 = jnp.asarray(rng.standard_normal((23, 12)) * 1e-3, dtype)
    K_raw = jnp.asarray(rng.standard_normal((23, 12)) * 1e-3, dtype)

    def fp(c):
        Pf = iekf._final_P(x, x, dx + c[:, 0] * 1e-12, P, K_x12, K_raw, 1e-3)
        return c + Pf * 1e-12
    tm("_final_P", fp, jnp.zeros((23, 23), dtype))

    def gn(c):
        Kx, Kh, _K = gain_op.gain(HTH + c[:12, :12] * 1e-12, HTh, P, 1e-3)
        return c + jnp.zeros((23, 23), dtype).at[:, :12].set(Kx) * 1e-12
    tm("gain kernel", gn, jnp.zeros((23, 23), dtype))


if __name__ == "__main__":
    main()
