#!/usr/bin/env python
"""Replicates probe_fullstep_bisect's F-stage inputs EAGERLY and asks the
window kernel for its verdict (ok / stale count) — diagnoses whether the
bisect's +6 ms F stage is the fallback executing (data-dependent) or a
measurement artifact.  Run under tools/tpu_run.sh."""

import os
import sys

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

from fast_limo_tpu.io import synthetic as syn
from fast_limo_tpu.models import deskew as dsk
from fast_limo_tpu.models import iekf, mapper, measurement, preprocess
from fast_limo_tpu.models import pipeline as pl
from fast_limo_tpu.models import process as proc
from fast_limo_tpu.ops import update_loop, voxel


def main():
    cfg = bench.kitti_like_cfg()
    state = pl.init_state(cfg)
    rng = np.random.default_rng(0)
    N = cfg.tpu.max_points_per_scan
    K = cfg.tpu.imu_batch
    dtype = jnp.float32

    world_np = syn.build_world(0, extent=120.0)
    sel = rng.choice(len(world_np), 60000, replace=False)
    world = jnp.asarray(world_np[sel], dtype)
    m = state.map
    for i in range(0, 60000, 20000):
        m = mapper.insert(m, world[i:i + 20000], jnp.ones(20000, bool),
                          voxel_size=cfg.tpu.map_voxel_size)
    state = state._replace(map=m)

    qsel = rng.choice(len(world_np), N, replace=False)
    pts0 = jnp.asarray(world_np[qsel] + rng.normal(0, 0.01, (N, 3)), dtype)
    t_raw = jnp.asarray(np.linspace(0, 0.1, N), jnp.float32)
    valid = jnp.ones(N, bool)
    imu_acc = jnp.asarray(rng.normal(0, 0.05, (K, 3)) + [0, 0, 9.81], dtype)
    imu_gyro = jnp.asarray(rng.normal(0, 0.01, (K, 3)), dtype)
    imu_stamp = jnp.asarray(np.linspace(0.001, 0.105, K), jnp.float32)

    s = state
    mp_cfg = cfg.ikfom.mapping
    acc_bl, gyro_bl, dt = preprocess.imu_to_baselink(
        imu_acc, imu_gyro, imu_stamp, s.last_prop_time, s.last_w_raw_bl,
        R_imu2bl=jnp.eye(3, dtype=dtype), t_imu2bl=jnp.zeros(3, dtype))
    Q = proc.process_noise_Q(cfg.ikfom.cov_gyro, cfg.ikfom.cov_acc,
                             cfg.ikfom.cov_bias_gyro, cfg.ikfom.cov_bias_acc,
                             dtype)
    imu = {"acc": acc_bl, "gyro": gyro_bl, "dt": dt.astype(dtype),
           "stamp": imu_stamp, "valid": jnp.ones(K, bool)}
    x_t2, P_t2, xs = iekf.predict_scan(s.x, s.P, imu, Q)
    pts, t_abs, pvalid, _ = preprocess.preprocess_scan(
        pts0, t_raw, valid, jnp.asarray(0.0, jnp.float32), imu_stamp[-1],
        sensor_type=cfg.sensor_type, end_of_sweep=cfg.end_of_sweep,
        crop_active=cfg.filters.crop_active, crop_min=cfg.filters.cropBoxMin,
        crop_max=cfg.filters.cropBoxMax, dist_active=cfg.filters.dist_active,
        min_dist=cfg.filters.min_dist, rate_active=cfg.filters.rate_active,
        rate_value=cfg.filters.rate_value, fov_active=cfg.filters.fov_active,
        fov_angle=cfg.filters.fov_angle, time_offset=cfg.time_offset,
        time_sort=cfg.tpu.time_sort)
    frames = dsk.frames_from_scan(s.x, s.last_prop_time, s.last_w, s.last_a,
                                  xs, imu)
    p_xt2, _ = dsk.deskew(pts, t_abs, pvalid, frames, x_t2, x_t2.rot_LI,
                          x_t2.t_LI)
    pc_ds, ds_valid = voxel.voxel_downsample(p_xt2, pvalid,
                                             float(cfg.filters.leafSize[0]))
    pc2match = pc_ds[:mp_cfg.MAX_NUM_PC2MATCH]
    pc2_valid = ds_valid[:mp_cfg.MAX_NUM_PC2MATCH]
    print("n_pc2match:", int(jnp.sum(pc2_valid)))

    _hr, h_stats = measurement.make_h_model(
        s.map, pc2match, pc2_valid, voxel_size=cfg.map_voxel_size,
        k=mp_cfg.NUM_MATCH_POINTS, probes=cfg.tpu.hash_probes,
        max_dist_plane=mp_cfg.MAX_DIST_PLANE,
        plane_threshold=mp_cfg.PLANE_THRESHOLD,
        max_num_matches=mp_cfg.MAX_NUM_MATCHES,
        estimate_extrinsics=True, x0=x_t2, dynamic_gate=mp_cfg.DYNAMIC_GATE)
    out = update_loop.update_loop_tpu(
        h_stats.loop_pack, P_t2, x_t2, cfg.ikfom.lidar_noise,
        cfg.ikfom.degeneracy_thresh, cfg.ikfom.LIMITS,
        max_iters=cfg.ikfom.MAX_NUM_ITERS, estimate_extrinsics=True,
        window=h_stats.loop_window, with_aux=True)
    aux = np.asarray(out[6])
    print(f"bisect-style inputs: n_iters={int(out[2])} ok={bool(out[3])} "
          f"stale_total={aux[0, 4]:.0f}")
    dxp = np.asarray(out[0].pos) - np.asarray(x_t2.pos)
    print("pose correction:", dxp, "|dx| =", float(np.linalg.norm(dxp)))


if __name__ == "__main__":
    main()
