#!/usr/bin/env python
"""Microbenchmark: voxel-hash neighborhood gather strategies on the TPU.

The scan step's dominant cost is the kNN candidate gather (SURVEY.md hot
loop #2). This compares layouts/strategies for the bench shape:
N=10000 queries x V=8 voxels, bucket B=6, capacity 2^17, probes=4.
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
    capacity, bucket, vs, probes = 2 ** 17, 6, 1.2, 4
    N = 10000
    rng = np.random.default_rng(0)
    dtype = jnp.float32

    m = mapper.create(capacity, bucket, dtype)
    world = jnp.asarray(
        rng.uniform([-100, -100, -2], [100, 100, 8], (60000, 3)), dtype)
    for i in range(0, 60000, 20000):
        m = mapper.insert(m, world[i:i + 20000], jnp.ones(20000, bool),
                          voxel_size=vs, probes=probes)
    jax.block_until_ready(m)
    print(f"map: {int(m.num_points)} pts in {int(jnp.sum(m.counts > 0))} voxels")

    q0 = jnp.asarray(rng.uniform([-40, -40, -2], [40, 40, 6], (N, 3)), dtype)

    t_null = loop_time(lambda q: q + 1e-6, q0)
    print(f"null: {t_null * 1e3 / R:.3f} ms/iter")

    def tm(name, body, carry=q0):
        t = (loop_time(body, carry) - t_null) / R * 1e3
        print(f"{name:34s}: {t:7.2f} ms")
        return t

    # --- current: probe loop (meta gathers) + points gather, nbhd=8 ---
    def cur8(q):
        cand, cv = mapper.gather_neighborhood(m, q, voxel_size=vs,
                                              probes=probes, neighborhood=8)
        return q + jnp.mean(cand) * 1e-12
    tm("current nbhd=8", cur8)

    def cur27(q):
        cand, cv = mapper.gather_neighborhood(m, q, voxel_size=vs,
                                              probes=probes, neighborhood=27)
        return q + jnp.mean(cand) * 1e-12
    tm("current nbhd=27", cur27)

    # --- components: probe loop only ---
    def probe_only(q):
        qc = mapper.voxel_coords(q, vs)
        frac = q / vs - qc.astype(q.dtype)
        step = jnp.where(frac >= 0.5, 1, -1).astype(jnp.int32)
        nc = qc[:, None, :] + mapper._CORNER_COMBOS[None, :, :] * step[:, None, :]
        h = mapper._hash(nc, capacity)

        def body(p, carry):
            found, done = carry
            slot = ((h + p) & (capacity - 1)).astype(jnp.int32)
            meta = m.meta[slot]
            occupied = meta[..., 3] > 0
            match = occupied & jnp.all(meta[..., 0:3] == nc, axis=-1)
            found = jnp.where(~done & match, slot, found)
            done = done | match | ~occupied
            return found, done

        found, _ = jax.lax.fori_loop(
            0, probes, body,
            (jnp.full((N, 8), capacity, jnp.int32), jnp.zeros((N, 8), bool)))
        return q + jnp.sum(found).astype(dtype) * 1e-12
    tm("probe loop only (4x meta gather)", probe_only)

    # --- points gather only (fixed slots) ---
    qc = mapper.voxel_coords(q0, vs)
    h0 = mapper._hash(qc[:, None, :] + mapper._CORNER_COMBOS[None, :, :], capacity)
    slots0 = (h0 & (capacity - 1)).astype(jnp.int32)

    def pts_gather(q):
        cand = m.points[slots0]                     # (N,8,B,3)
        return q + jnp.mean(cand) * 1e-12
    tm("points gather only (N,8,B,3)", pts_gather)

    # --- flat points gather: table reshaped (C, B*3) ---
    pts_flat = m.points.reshape(capacity, bucket * 3)

    def pts_gather_flat(q):
        cand = pts_flat[slots0]                     # (N,8,B*3)
        return q + jnp.mean(cand) * 1e-12
    tm("points gather flat (C,18)", pts_gather_flat)

    # --- packed single-row table: meta+points in one (C, 24) f32 row ---
    packed = jnp.concatenate([
        m.meta.astype(jnp.float32),
        m.points.reshape(capacity, bucket * 3),
        jnp.zeros((capacity, 2), jnp.float32),
    ], axis=1)  # (C, 24)

    def packed_gather(q):
        rows = packed[slots0]                       # (N,8,24)
        return q + jnp.mean(rows) * 1e-12
    tm("packed gather (C,24) 1 round", packed_gather)

    # --- padded-row table (C, 32) ---
    packed32 = jnp.pad(packed, ((0, 0), (0, 8)))

    def packed32_gather(q):
        rows = packed32[slots0]
        return q + jnp.mean(rows) * 1e-12
    tm("packed gather (C,32) 1 round", packed32_gather)

    # --- gather with flattened slot index (N*8,) ---
    slots_flat = slots0.reshape(-1)

    def pts_gather_flatidx(q):
        cand = pts_flat[slots_flat]                 # (N*8, 18)
        return q + jnp.mean(cand) * 1e-12
    tm("points gather flat idx (N*8,18)", pts_gather_flatidx)

    # --- sorted slot order ---
    slots_sorted = jnp.sort(slots_flat)

    def pts_gather_sorted(q):
        cand = pts_flat[slots_sorted]
        return q + jnp.mean(cand) * 1e-12
    tm("points gather sorted idx", pts_gather_sorted)

    # --- unique-voxel dedupe: gather distinct slots, expand by second gather ---
    uniq, inv = np.unique(np.asarray(slots_flat), return_inverse=True)
    print(f"distinct slots among N*8 requests: {uniq.size}")
    uniq_j = jnp.asarray(uniq, jnp.int32)
    # pad unique table to fixed size
    U = 1 << int(np.ceil(np.log2(max(uniq.size, 1))))
    uniq_pad = jnp.pad(uniq_j, (0, U - uniq.size))
    inv_j = jnp.asarray(inv.reshape(N, 8), jnp.int32)

    def dedupe_gather(q):
        small = pts_flat[uniq_pad]                  # (U,18) from HBM
        cand = small[inv_j]                         # (N,8,18) from small table
        return q + jnp.mean(cand) * 1e-12
    tm(f"dedupe gather (U={U})", dedupe_gather)

    # --- int8 quantized row gather (traffic test) ---
    pts_i8 = (pts_flat * 8).astype(jnp.int8)

    def i8_gather(q):
        cand = pts_i8[slots_flat].astype(jnp.float32)
        return q + jnp.mean(cand) * 1e-12
    tm("int8 row gather (traffic probe)", i8_gather)


if __name__ == "__main__":
    main()
