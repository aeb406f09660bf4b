#!/usr/bin/env python
"""Cumulative-prefix bisect of the FULL scan step on device (bench config).

profile_stages times stages in isolation; their sum (~4.5 ms) undershoots
the measured full step (~5.8 ms).  This probe replicates scan_step's exact
sequence with cut points, so the missing cost shows up between two cuts:

  A  IMU path + predict_scan
  B  A + preprocess_scan
  C  B + frames + deskew
  D  C + voxel_downsample
  E  D + h_model build (gather + match at x0)
  F  E + iterated update
  G  F + world transform + insert (full step sans debug)

Run: tools/tpu_run.sh 1200 python tools/probe_fullstep_bisect.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(sys.path[0], "bench.py"))
bench = importlib.util.module_from_spec(spec)
sys.modules["bench"] = bench
spec.loader.exec_module(bench)

from fast_limo_tpu.models import deskew as dsk
from fast_limo_tpu.models import iekf, mapper, measurement, preprocess
from fast_limo_tpu.models import pipeline as pl
from fast_limo_tpu.models import process as proc
from fast_limo_tpu.ops import so3, voxel

R = 20


def main():
    cfg = bench.kitti_like_cfg()
    state = pl.init_state(cfg)
    rng = np.random.default_rng(0)
    N = cfg.tpu.max_points_per_scan
    K = cfg.tpu.imu_batch
    dtype = jnp.float32

    # warm the map with SURFACE-like structure (ground + walls, like the
    # bench scenes): the round-5 window re-match certificates key on local
    # candidate-distance gaps, which a uniform random cloud misrepresents
    # (its tight uniform gaps read as perpetual staleness)
    from fast_limo_tpu.io import synthetic as syn

    world_np = syn.build_world(0, extent=120.0)
    sel = rng.choice(len(world_np), 60000, replace=False)
    world = jnp.asarray(world_np[sel], dtype)
    m = state.map
    for i in range(0, 60000, 20000):
        m = mapper.insert(m, world[i:i + 20000], jnp.ones(20000, bool),
                          voxel_size=cfg.tpu.map_voxel_size)
    state = state._replace(map=m)
    jax.block_until_ready(state.map)

    # scan = re-observations of the mapped surfaces + sensor noise
    qsel = rng.choice(len(world_np), N, replace=False)
    pts0 = jnp.asarray(world_np[qsel] + rng.normal(0, 0.01, (N, 3)), dtype)
    t_raw = jnp.asarray(np.linspace(0, 0.1, N), jnp.float32)
    valid = jnp.ones(N, bool)
    imu_acc = jnp.asarray(rng.normal(0, 0.05, (K, 3)) + [0, 0, 9.81], dtype)
    imu_gyro = jnp.asarray(rng.normal(0, 0.01, (K, 3)), dtype)
    imu_stamp = jnp.asarray(np.linspace(0.001, 0.105, K), jnp.float32)
    imu_valid = jnp.ones(K, bool)

    mp_cfg = cfg.ikfom.mapping
    voxel_size = cfg.map_voxel_size
    k = mp_cfg.NUM_MATCH_POINTS
    n_pc2match = mp_cfg.MAX_NUM_PC2MATCH
    R_imu2bl = jnp.eye(3, dtype=dtype)
    t_imu2bl = jnp.zeros(3, dtype)
    sm = jnp.eye(3, dtype=dtype)
    Q = proc.process_noise_Q(cfg.ikfom.cov_gyro, cfg.ikfom.cov_acc,
                             cfg.ikfom.cov_bias_gyro, cfg.ikfom.cov_bias_acc,
                             dtype)

    def upto(stage, s, c):
        pts_in = pts0 + c * 1e-9
        acc_bl, gyro_bl, dt = preprocess.imu_to_baselink(
            imu_acc, imu_gyro, imu_stamp, s.last_prop_time, s.last_w_raw_bl,
            R_imu2bl=R_imu2bl, t_imu2bl=t_imu2bl)
        acc_c, gyro_c = preprocess.apply_intrinsics(
            acc_bl, gyro_bl, sm, s.bias_accel_corr, s.bias_gyro_corr)
        imu = {"acc": acc_c, "gyro": gyro_c, "dt": dt.astype(dtype),
               "stamp": imu_stamp, "valid": imu_valid}
        x_t2, P_t2, xs = iekf.predict_scan(s.x, s.P, imu, Q)
        if stage == "A":
            return x_t2.pos[0]

        pts, t_abs, pvalid, scan_end = preprocess.preprocess_scan(
            pts_in, t_raw, valid, jnp.asarray(0.0, jnp.float32),
            imu_stamp[-1],
            sensor_type=cfg.sensor_type, end_of_sweep=cfg.end_of_sweep,
            crop_active=cfg.filters.crop_active,
            crop_min=cfg.filters.cropBoxMin, crop_max=cfg.filters.cropBoxMax,
            dist_active=cfg.filters.dist_active, min_dist=cfg.filters.min_dist,
            rate_active=cfg.filters.rate_active,
            rate_value=cfg.filters.rate_value,
            fov_active=cfg.filters.fov_active, fov_angle=cfg.filters.fov_angle,
            time_offset=cfg.time_offset, time_sort=cfg.tpu.time_sort)
        if stage == "B":
            return jnp.mean(pts) + x_t2.pos[0]

        frames = dsk.frames_from_scan(
            s.x, s.last_prop_time, s.last_w, s.last_a, xs, imu)
        p_xt2, _pw = dsk.deskew(pts, t_abs, pvalid, frames, x_t2,
                                x_t2.rot_LI, x_t2.t_LI)
        if stage == "C":
            return jnp.mean(p_xt2) + x_t2.pos[0]

        pc_ds, ds_valid = voxel.voxel_downsample(
            p_xt2, pvalid, float(cfg.filters.leafSize[0]))
        if cfg.tpu.insert_population == "full" and cfg.tpu.max_insert_points:
            pc_ds = pc_ds[:cfg.tpu.max_insert_points]
            ds_valid = ds_valid[:cfg.tpu.max_insert_points]
        pc2match = pc_ds[:n_pc2match]
        pc2_valid = ds_valid[:n_pc2match]
        if stage == "D":
            return jnp.mean(pc_ds) + x_t2.pos[0]

        h_closures = measurement.make_h_model(
            s.map, pc2match, pc2_valid,
            voxel_size=voxel_size, k=k, probes=cfg.tpu.hash_probes,
            max_dist_plane=mp_cfg.MAX_DIST_PLANE,
            plane_threshold=mp_cfg.PLANE_THRESHOLD,
            max_num_matches=mp_cfg.MAX_NUM_MATCHES,
            estimate_extrinsics=cfg.ikfom.estimate_extrinsics,
            knn_refresh=cfg.tpu.knn_refresh, x0=x_t2,
            neighborhood=cfg.tpu.knn_neighborhood)
        h_stats = h_closures[1]
        if stage == "E":
            HTH, HTh = h_stats(x_t2)
            return HTH[0, 0] + x_t2.pos[0]

        x_u, P_u, n_iters = iekf.update_iterated(
            x_t2, P_t2, h_stats,
            R=cfg.ikfom.lidar_noise, D=cfg.ikfom.degeneracy_thresh,
            max_iters=cfg.ikfom.MAX_NUM_ITERS, limit=cfg.ikfom.LIMITS)
        if stage == "F":
            return x_u.pos[0] + P_u[0, 0]

        w_scan = so3.quat_rotate(x_u.rot, pc_ds) + x_u.pos
        new_map = mapper.insert(
            s.map, w_scan, ds_valid, voxel_size=voxel_size,
            probes=cfg.tpu.insert_probes)
        return x_u.pos[0] + new_map.table[0, 0]

    def loop_time(stage, reps=5):
        @jax.jit
        def run(s, c0):
            def body(c, _):
                return c + upto(stage, s, c) * 1e-12, None
            out, _ = jax.lax.scan(body, c0, None, length=R)
            return out
        out = run(state, jnp.zeros(()))
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(state, jnp.zeros(()))
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / R

    # in-process null: a body referencing a closure array, so it sits in
    # the same tunnel regime as the stages (the tunnel is BIMODAL per
    # process: ~0.1 ms/call vs ~23 ms/call fixed overhead — a null > 0.1
    # ms/iter means this process is degraded; rerun it)
    dummy = jnp.asarray(np.arange(32), jnp.float32)

    @jax.jit
    def run_null(c0):
        def body(c, _):
            return c + jnp.sum(dummy) * (c + 1.0) * 1e-12, None
        out, _ = jax.lax.scan(body, c0, None, length=R)
        return out

    out = run_null(jnp.zeros(()))
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(run_null(jnp.zeros(())))
        ts.append(time.perf_counter() - t0)
    t_null = float(np.median(ts)) / R * 1e3
    print(f"null: {t_null:7.3f} ms/iter ({'FAST' if t_null < 0.1 else 'DEGRADED - rerun'})")
    if t_null >= 0.1 and os.environ.get("BISECT_ALLOW_DEGRADED", "") != "1":
        # degraded tunnel regime: absolute readings are junk — exit nonzero
        # so tools/tpu_run.sh retries in a fresh process (regime is
        # per-process); set BISECT_ALLOW_DEGRADED=1 to keep going
        print("degraded regime — exiting for tpu_run retry")
        sys.exit(3)

    prev = 0.0
    for stage in ("A", "B", "C", "D", "E", "F", "G"):
        t = loop_time(stage) * 1e3 - t_null
        print(f"{stage}: {t:7.3f} ms  (+{t - prev:6.3f})")
        prev = t


if __name__ == "__main__":
    main()
