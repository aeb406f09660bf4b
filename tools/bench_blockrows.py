#!/usr/bin/env python
"""Device gather cost at the BLOCK-map row shapes.

The block-addressed map (2x2x2-voxel hash groups, 16 entries/row) gathers
8 rows/query of W=448 f32 (1792 B) for exact-or-better 27-cube coverage,
vs today's 27 rows of 224 f32 (exact) or 4 rows of 224 f32 (fast knob).
This measures all three shapes with dynamic indices at bench scale
(10k queries) to pin the cost model before committing to the layout.
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
NQ = 10000


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

    t_null = loop_time(lambda s: s + 1, jnp.asarray(1, jnp.int32))
    print(f"null: {t_null * 1e3 / R:.3f} ms/iter  (device {jax.devices()[0]})")

    def tm(name, body, carry):
        t = (loop_time(body, carry) - t_null) / R * 1e3
        print(f"{name:48s}: {t:7.3f} ms")
        return t

    # (V, W_f32, G): today's fast (4,224), today's exact (27,224),
    # block map (8,448) at G=cap/16, slim-block candidates (8,352),(8,224)
    for V, W, logG in ((4, 224, 14), (27, 224, 14), (8, 448, 13),
                      (8, 352, 13), (8, 224, 13), (8, 448, 15)):
        G = 2 ** logG
        tbl = jnp.asarray(rng.standard_normal((G, W)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, G, (NQ, V)), jnp.int32)

        def body(s, tbl=tbl, idx=idx, G=G):
            ix = (idx + s) & (G - 1)
            rows = tbl[ix]                       # (NQ,V,W)
            return s + (jnp.mean(rows) * 1e-12).astype(jnp.int32) + 1
        tm(f"gather (NQ,{V}) rows W={W} ({W*4}B) G=2^{logG}", body,
           jnp.asarray(1, jnp.int32))

    # planarize-style one-hot matmul cost at the block shapes:
    # (2G,224)x(224,176) vs today's (G,224)x(224,176)
    for G2, note in ((2 ** 14, "today G=2^14"), (2 ** 15, "block 2G=2^15")):
        A = jnp.asarray(rng.standard_normal((G2, 224)), jnp.float32)
        P = jnp.asarray(rng.standard_normal((224, 176)), jnp.float32)

        def bodym(s, A=A, P=P):
            out = jax.lax.dot_general(A + s * 1e-20, P,
                                      (((1,), (0,)), ((), ())))
            return s + (jnp.mean(out) * 1e-12).astype(jnp.float32)
        tm(f"planarize matmul ({note})", bodym, jnp.asarray(1.0, jnp.float32))


if __name__ == "__main__":
    main()
