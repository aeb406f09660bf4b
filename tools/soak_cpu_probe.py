#!/usr/bin/env python
"""CPU replica of bench.soak_band for loop-closure accuracy iteration.

Runs the same closed-circuit soak as bench.py::soak_band (192 scans, 16k
points, loop closure + thinning + eviction) on the CPU backend so the
kf/tail RMSE can be iterated on without touching the tunneled TPU.
Usage: python tools/soak_cpu_probe.py [n_scans]
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from fast_limo_tpu.io import synthetic  # noqa: E402


def kitti_like_cfg():
    from fast_limo_tpu.utils.config import Config
    cfg = Config()
    cfg.sensor_type = 1
    cfg.gravity_align = False
    cfg.calibrate_accel = False
    cfg.calibrate_gyro = False
    cfg.time_offset = False
    cfg.debug = cfg.verbose = False
    cfg.intrinsics.accel_bias = [0.0, 0.0, 0.0]
    cfg.intrinsics.gyro_bias = [0.0, 0.0, 0.0]
    cfg.filters.crop_active = True
    cfg.filters.dist_active = True
    cfg.filters.min_dist = 2.0
    cfg.filters.rate_active = False
    cfg.filters.voxel_active = True
    cfg.filters.leafSize = [1.0, 1.0, 1.0]
    cfg.ikfom.MAX_NUM_ITERS = 3
    cfg.ikfom.mapping.MAX_NUM_MATCHES = 5000
    cfg.ikfom.mapping.MAX_NUM_PC2MATCH = 10000
    cfg.ikfom.mapping.octree.min_extent = 0.2
    cfg.ikfom.estimate_extrinsics = True
    cfg.tpu.max_points_per_scan = 32768
    cfg.tpu.map_capacity = 2 ** 17
    cfg.tpu.map_voxel_size = 1.2
    cfg.tpu.map_points_per_voxel = 6
    cfg.tpu.imu_batch = 32
    cfg.tpu.hash_probes = 4
    cfg.tpu.insert_probes = 2
    cfg.tpu.knn_refresh = "first"
    cfg.tpu.quantize_transfer = 0.004
    cfg.tpu.max_insert_points = 10000
    return cfg


def soak_band(n_scans: int = 192) -> dict:
    from fast_limo_tpu.models.slam import SLAM, LoopConfig

    traj = synthetic.LoopTrajectory(v_forward=4.0, radius=9.0, ramp_tau=0.8)
    world = synthetic.build_loop_world(11, radius=9.0)
    seq = synthetic.SyntheticSequence(
        seed=11, n_scans=n_scans, points_per_scan=16384, scan_rate=5.0,
        noise_pt=0.01, noise_gyro=8e-4, noise_acc=8e-3, max_range=25.0,
        traj=traj, world=world)
    cfg = kitti_like_cfg()
    slam = SLAM(cfg, LoopConfig(
        kf_dist=2.0, exclude_recent=20, sc_dist_thresh=0.28,
        icp_min_inliers=150, loop_weight=30.0, max_keyframes=64,
        loop_cooldown=3.0))
    slam.loc.evict_radius = 30.0
    slam.loc.evict_occupancy = 0.002
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(n_scans)]
    si = 0
    for k in range(len(stamps)):
        slam.update_imu(stamps[k], acc[k], gyro[k])
        while si < n_scans and scans[si][0] <= stamps[k]:
            st_, pts, traw = scans[si]
            slam.update_pointcloud(pts, traw, st_)
            si += 1
    slam.flush()
    kfp = np.array([kf.pos for kf in slam.keyframes])
    kgt = seq.traj.pos(np.array([kf.stamp for kf in slam.keyframes]))
    est = np.asarray(slam.positions())
    gt = seq.traj.pos(slam.stamps())
    tail = slice(-60, None)
    return {
        "scans": n_scans,
        "loops": int(slam.n_loops_closed),
        "keyframes": len(slam.keyframes),
        "kf_rmse": round(float(np.sqrt(np.mean(
            np.sum((kfp - kgt) ** 2, axis=1)))), 3),
        "tail_rmse": round(float(np.sqrt(np.mean(
            np.sum((est[tail] - gt[tail]) ** 2, axis=1)))), 3),
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    print(json.dumps(soak_band(n)))
