"""Bisect the block-map insert cost on device (round 4: insert 1.27→5.57 ms
after the block-addressed layout — find the regressing stage).

Replicates mapper.insert with cut points:
  A  sort + fused permute
  B  A + resolve gather + free-entry election
  C  B + leader merge build
  D  C + entry scatter
  E  full insert (D + planarize)

Run: tools/tpu_run.sh 1200 python tools/probe_insert_bisect.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from fast_limo_tpu.models import mapper
from fast_limo_tpu.ops import sort as psort

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
    return float(np.median(ts)) / R


def main():
    cfg = bench.kitti_like_cfg()
    vox = cfg.map_voxel_size
    N = cfg.tpu.max_insert_points
    rng = np.random.default_rng(0)

    m = mapper.create(cfg.tpu.map_capacity, cfg.tpu.map_points_per_voxel)
    for i in range(6):
        pts = rng.uniform(-60, 60, (N, 3)).astype(np.float32)
        m = mapper.insert(m, jnp.asarray(pts), jnp.ones(N, bool),
                          voxel_size=vox)
    jax.block_until_ready(m)
    print(f"map: {int(m.num_points)} pts; groups {m.groups} bucket {m.bucket}")
    pts0 = jnp.asarray(rng.uniform(-60, 60, (N, 3)).astype(np.float32))
    valid = jnp.ones(N, bool)
    G, B = m.groups, m.bucket
    EW = mapper._entry_width(B)
    ROW_E = mapper.ROW_E

    def upto(stage, c):
        pts = pts0 + c
        vc0 = mapper.voxel_coords(pts, vox)
        g0 = mapper._hash(mapper.block_coords(vc0), G)
        key_g = jnp.where(valid, g0, jnp.int32(0x7FFFFFFF))
        packed = (((vc0[:, 0] & 0x3FF) << 20)
                  | ((vc0[:, 1] & 0x3FF) << 10) | (vc0[:, 2] & 0x3FF))
        _, _, order = psort.sort3(key_g, packed, jnp.arange(N, dtype=jnp.int32))
        fused = jnp.concatenate(
            [vc0.astype(jnp.float32), pts,
             g0.astype(jnp.float32)[:, None],
             valid.astype(jnp.float32)[:, None]], axis=1)
        perm = fused[order]
        vc = perm[:, 0:3].astype(jnp.int32)
        p = perm[:, 3:6]
        vld = perm[:, 7] > 0
        g = jnp.where(vld, perm[:, 6].astype(jnp.int32), 0)
        g_s = jnp.where(vld, perm[:, 6].astype(jnp.int32), jnp.int32(0x7FFFFFFF))
        if stage == "A":
            return c + perm[0, 0] * 1e-9

        ent, match_e, counts_e = mapper._group_rows(m, g, vc)
        has_match = jnp.any(match_e, axis=-1)
        entry_m = jnp.argmax(match_e, axis=-1).astype(jnp.int32)
        base_m = jnp.sum(jnp.where(match_e, counts_e, 0.0), axis=-1).astype(jnp.int32)
        free_e = counts_e == 0
        same_voxel = jnp.concatenate(
            [jnp.array([False]), jnp.all(vc[1:] == vc[:-1], axis=-1) & vld[1:] & vld[:-1]])
        is_leader = vld & ~same_voxel
        new_group = jnp.concatenate([jnp.array([True]), g_s[1:] != g_s[:-1]])
        is_new_start = is_leader & ~has_match
        r_new = mapper._seg_sum(is_new_start, new_group) - 1
        freecum = jnp.cumsum(free_e.astype(jnp.int32), axis=-1)
        want = free_e & (freecum == (r_new + 1)[:, None])
        assigned = jnp.any(want, axis=-1)
        entry_n = jnp.argmax(want, axis=-1).astype(jnp.int32)
        resolved = vld & (has_match | assigned)
        entry = jnp.where(has_match, entry_m, entry_n)
        base = jnp.where(has_match, jnp.minimum(base_m, B), 0)
        if stage == "B":
            return c + (jnp.sum(entry) + jnp.sum(base)).astype(jnp.float32) * 1e-9

        pts4 = jnp.concatenate([p, jnp.zeros((N, 1), jnp.float32)], axis=1)
        shifted, conts = [], []
        cont = jnp.ones(N, bool)
        for j in range(B):
            if j > 0:
                sv_j = jnp.concatenate([same_voxel[j:], jnp.zeros(j, bool)])
                cont = cont & sv_j
            shifted.append(jnp.concatenate(
                [pts4[j:], jnp.zeros((j, 4), jnp.float32)], axis=0))
            conts.append(cont)
        new_stack = jnp.stack(shifted, axis=1)
        new_ok = jnp.stack(conts, axis=1)
        s_idx = jnp.arange(B, dtype=jnp.int32)
        j_of_s = s_idx[None, :, None] - base[:, None, None]
        sel_nj = (j_of_s == s_idx[None, None, :]) & new_ok[:, None, :]
        use_new = jnp.any(sel_nj, axis=-1)
        new_part = jnp.einsum("nsj,njc->nsc", sel_nj.astype(jnp.float32), new_stack)
        exist = jnp.einsum("ne,nec->nc", match_e.astype(jnp.float32),
                           ent[..., 4:]).reshape(N, B, 4)
        merged = jnp.where(use_new[..., None], new_part, exist)
        n_placed = jnp.sum(use_new, axis=-1).astype(jnp.int32)
        final_count = (base + n_placed).astype(jnp.float32)
        if stage == "C":
            return c + jnp.sum(merged[0]) * 1e-9

        writer = is_leader & resolved
        erow = jnp.where(writer, g * ROW_E + entry, G * ROW_E)
        evals = jnp.concatenate(
            [vc.astype(jnp.float32), final_count[:, None],
             merged.reshape(N, 4 * B)], axis=1)
        flatE = m.table.reshape(G * ROW_E, EW)
        flatE = flatE.at[erow].set(evals, mode="drop")
        table = flatE.reshape(G, ROW_E * EW)
        if stage == "D":
            return c + table[0, 0] * 1e-9

        ptab = mapper._planarize(table, B)
        return c + ptab[0, 0] * 1e-9

    t_null = loop_time(lambda c: c + 1.0, jnp.zeros(()))
    print(f"null: {t_null*1e3:.3f} ms")
    prev = 0.0
    for stage in ("A", "B", "C", "D", "E"):
        t = (loop_time(lambda c, s=stage: upto(s, c), jnp.zeros(())) - t_null) * 1e3
        print(f"{stage}: {t:7.3f} ms  (+{t - prev:6.3f})")
        prev = t

    def full(c):
        m2 = mapper.insert(m, pts0 + c, valid, voxel_size=vox)
        return c + m2.table[0, 0] * 1e-9
    t = (loop_time(full, jnp.zeros(())) - t_null) * 1e3
    print(f"mapper.insert: {t:7.3f} ms")


if __name__ == "__main__":
    main()
