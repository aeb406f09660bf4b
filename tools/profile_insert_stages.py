"""Sub-stage device timing of mapper.insert (bench shapes, v5e).

Stages timed via the same carried-lax.scan trick as profile_stages.py:
  sort        — the 2-key group/voxel sort alone
  sort+gather — plus the pre-insert group-row resolve gather
  insert      — the full insert
  planarize   — the one-hot mirror matmul alone

Run alone on the TPU: tools/tpu_run.sh 1200 python tools/profile_insert_stages.py
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

    # populated map + a realistic insert batch
    m = mapper.create(cfg.tpu.map_capacity, cfg.tpu.map_points_per_voxel)
    for i in range(6):
        pts = rng.uniform(-60, 60, (N, 3)).astype(np.float32)
        m = mapper.insert(m, jnp.asarray(pts), jnp.ones(N, bool),
                          voxel_size=vox)
    jax.block_until_ready(m)
    print(f"map: {int(m.num_points)} pts")
    pts = jnp.asarray(rng.uniform(-60, 60, (N, 3)).astype(np.float32))
    valid = jnp.ones(N, bool)

    t_null = loop_time(lambda c: c + 1.0, jnp.zeros(()))
    print(f"null loop: {t_null * 1e3:7.3f} ms/iter")

    G = m.groups

    def sort_only(c):
        p = pts + c
        vc0 = mapper.voxel_coords(p, vox)
        g0 = mapper._hash(vc0, G)
        key_g = jnp.where(valid, g0, jnp.int32(0x7FFFFFFF))
        packed = (((vc0[:, 0] & 0x3FF) << 20)
                  | ((vc0[:, 1] & 0x3FF) << 10) | (vc0[:, 2] & 0x3FF))
        _, _, order = jax.lax.sort(
            (key_g, packed, jnp.arange(N, dtype=jnp.int32)), num_keys=2)
        return c + order[0] * 1e-9

    def sort_gather(c):
        p = pts + c
        vc0 = mapper.voxel_coords(p, vox)
        g0 = mapper._hash(vc0, G)
        key_g = jnp.where(valid, g0, jnp.int32(0x7FFFFFFF))
        packed = (((vc0[:, 0] & 0x3FF) << 20)
                  | ((vc0[:, 1] & 0x3FF) << 10) | (vc0[:, 2] & 0x3FF))
        _, _, order = jax.lax.sort(
            (key_g, packed, jnp.arange(N, dtype=jnp.int32)), num_keys=2)
        vc = vc0[order]
        g = jnp.where(valid[order], g0[order], 0)
        ent, match_e, counts_e = mapper._group_rows(m, g, vc)
        return c + ent[0, 0, 0] * 1e-9 + order[0] * 1e-9

    def full_insert(c):
        m2 = mapper.insert(m, pts + c, valid, voxel_size=vox)
        return c + m2.table[0, 0] * 1e-9

    def planarize_only(c):
        t = m.table + c
        pt = mapper._planarize(t, m.bucket)
        return c + pt[0, 0] * 1e-9

    for name, fn in (("sort", sort_only), ("sort+gather", sort_gather),
                     ("insert full", full_insert),
                     ("planarize", planarize_only)):
        t = loop_time(fn, jnp.zeros(())) - t_null
        print(f"{name:12s}: {t * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
